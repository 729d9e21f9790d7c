"""Calibration-free sparse bundle adjustment.

Replaces pyba's ``CameraNetwork.bundle_adjust`` (invoked at reference
df3d/core.py:249) — refine camera extrinsics and 3D points from the animal's
own 2D keypoints, starting from the shipped calibration prior.

Two solvers share one problem formulation:

``solver="parity"``
    The exact reference behavior, reverse-engineered from the golden
    artifacts: observations ordered camera-major, 3D points initialized by
    DLT from the prior, parameter vector = per-camera (rvec, tvec) ⊕ flat
    points, scipy ``least_squares(method='trf', x_scale='jac', ftol=1e-4)``
    with a 2-point block-sparse Jacobian.  Reproduces the golden calibration
    to ~1e-6 (the reference test asserts 1e-4, tests/test_df3d.py:234-244).
    Free-point BA has a 7-DoF gauge null space, so hitting the golden values
    requires replicating this optimizer trajectory — hence scipy on host.

``solver="lm"``
    TPU-native batched Levenberg–Marquardt: dense masked residual grids,
    per-observation Jacobians via ``jax.jacfwd``, block normal equations
    reduced with a Schur complement on the point blocks (points eliminated
    analytically — V is 3x3 block-diagonal, the reduced camera system is a
    tiny dense (6C, 6C) solve), damping adapted inside
    ``jax.lax.while_loop``.  Fully jittable, vmappable over recordings; this
    is the production path for fleet-scale calibration.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from deepfly3d_tpu.ops import geometry


@dataclasses.dataclass
class BundleAdjustResult:
    calib: Dict[int, dict]           # refined {cam: {R, tvec, intr, distort}}
    points3d: np.ndarray             # refined 3D points (T, J, 3)
    cost_initial: float              # 0.5 * sum(residual^2)
    cost_final: float
    iterations: int
    solver: str


# ===================================================================== shared


def _prepare(points2d_rowcol: np.ndarray, calib_prior: Dict[int, dict], image_shape):
    """Common setup: arrays, masks, observations, DLT-initialized points."""
    C = len([k for k in calib_prior if isinstance(k, (int, np.integer))])
    R0, t0, K, dist = geometry.calib_to_arrays(calib_prior, C)
    p2 = jnp.asarray(points2d_rowcol, dtype=jnp.float64)
    pts0 = geometry.triangulate(
        p2, jnp.asarray(R0), jnp.asarray(t0), jnp.asarray(K), image_shape,
        distort=jnp.asarray(dist),
    )
    obs = np.asarray(geometry.rowcol_to_pixel_xy(p2, image_shape))
    mask = np.asarray(geometry.observation_mask(p2))
    return C, R0, t0, K, dist, np.asarray(pts0), obs, mask


# ============================================================== parity solver


def _bundle_adjust_parity(
    points2d_rowcol, calib_prior, image_shape, update_intrinsic, update_distort
) -> BundleAdjustResult:
    from scipy.optimize import least_squares
    from scipy.sparse import lil_matrix

    if update_intrinsic or update_distort:
        raise NotImplementedError(
            "parity solver replicates the reference's extrinsics-only mode "
            "(reference core.py:249); use solver='lm' for intrinsic refinement"
        )

    C, R0, t0, K, dist, pts0, obs, mask = _prepare(
        points2d_rowcol, calib_prior, image_shape
    )
    if np.any(dist != 0):
        raise NotImplementedError(
            "the parity solver replicates the reference's pinhole residual "
            "(the fly rig has distort == 0); use solver='lm', whose residual "
            "model applies the full 5-coefficient distortion"
        )
    T, J = pts0.shape[:2]
    n_pts = T * J

    # camera-major observation list
    cam_idx, pt_idx, obs_list = [], [], []
    for c in range(C):
        tt, jj = np.nonzero(mask[c])
        cam_idx.append(np.full(tt.shape, c))
        pt_idx.append(tt * J + jj)
        obs_list.append(obs[c][tt, jj])
    cam_idx = np.concatenate(cam_idx)
    pt_idx = np.concatenate(pt_idx)
    obs_arr = np.concatenate(obs_list)
    n_obs = len(obs_arr)

    rvecs0 = np.stack(
        [np.asarray(geometry.inv_rodrigues(jnp.asarray(R0[c]))) for c in range(C)]
    )
    x0 = np.concatenate([np.concatenate([rvecs0, t0], axis=1).ravel(), pts0.ravel()])

    def residuals(x):
        cams = x[: C * 6].reshape(C, 6)
        pts = x[C * 6 :].reshape(n_pts, 3)
        out = np.empty((n_obs, 2))
        for c in range(C):
            sel = cam_idx == c
            if not sel.any():
                continue
            R = np.asarray(geometry.rodrigues(jnp.asarray(cams[c, :3])))
            Xc = pts[pt_idx[sel]] @ R.T + cams[c, 3:]
            xy = Xc[:, :2] / Xc[:, 2:3]
            out[sel, 0] = K[c][0, 0] * xy[:, 0] + K[c][0, 2]
            out[sel, 1] = K[c][1, 1] * xy[:, 1] + K[c][1, 2]
        return (out - obs_arr).ravel()

    sparsity = lil_matrix((n_obs * 2, len(x0)), dtype=int)
    rows = np.arange(n_obs)
    for s in range(6):
        sparsity[2 * rows, cam_idx * 6 + s] = 1
        sparsity[2 * rows + 1, cam_idx * 6 + s] = 1
    for s in range(3):
        sparsity[2 * rows, C * 6 + pt_idx * 3 + s] = 1
        sparsity[2 * rows + 1, C * 6 + pt_idx * 3 + s] = 1

    r0 = residuals(x0)
    res = least_squares(
        residuals, x0, jac_sparsity=sparsity, x_scale="jac", ftol=1e-4, method="trf"
    )
    cams = res.x[: C * 6].reshape(C, 6)
    R_out = np.stack(
        [np.asarray(geometry.rodrigues(jnp.asarray(cams[c, :3]))) for c in range(C)]
    )
    calib_out = geometry.arrays_to_calib(R_out, cams[:, 3:], K, dist)
    return BundleAdjustResult(
        calib=calib_out,
        points3d=res.x[C * 6 :].reshape(T, J, 3),
        cost_initial=0.5 * float(r0 @ r0),
        cost_final=float(res.cost),
        iterations=int(res.nfev),
        solver="parity",
    )


# ================================================================== LM solver


def cam_param_size(update_intrinsic: bool, update_distort: bool) -> int:
    """Per-camera parameter count: rvec(3) + tvec(3) [+ fx,fy,cx,cy] [+ 5]."""
    return 6 + (4 if update_intrinsic else 0) + (5 if update_distort else 0)


def _unpack_cam(cam_vec, K0, dist0, update_intrinsic: bool, update_distort: bool):
    """cam_vec (P,) -> (rvec, tvec, K, dist); optimized blocks override the
    fixed K0/dist0 (skew stays fixed — it is not an OpenCV parameter)."""
    rvec, tvec = cam_vec[:3], cam_vec[3:6]
    off = 6
    K, dist = K0, dist0
    if update_intrinsic:
        fx, fy, cx, cy = (cam_vec[off + i] for i in range(4))
        K = jnp.asarray(
            [[fx, K0[0, 1], cx], [0.0, fy, cy], [0.0, 0.0, 1.0]],
            dtype=cam_vec.dtype,
        )
        off += 4
    if update_distort:
        dist = cam_vec[off : off + 5]
    return rvec, tvec, K, dist


def _pack_cam(R, tvec, K, dist, update_intrinsic: bool, update_distort: bool):
    """Inverse of :func:`_unpack_cam` for the initial parameter vector."""
    parts = [np.asarray(geometry.inv_rodrigues(jnp.asarray(R))), np.asarray(tvec)]
    if update_intrinsic:
        parts.append(np.asarray([K[0, 0], K[1, 1], K[0, 2], K[1, 2]]))
    if update_distort:
        parts.append(np.asarray(dist))
    return np.concatenate(parts)


def _project_one(cam_vec, K, dist, point,
                 update_intrinsic: bool = False, update_distort: bool = False):
    """Residual model for one observation; cam_vec per cam_param_size."""
    rvec, tvec, K, dist = _unpack_cam(
        cam_vec, K, dist, update_intrinsic, update_distort
    )
    R = geometry.rodrigues(rvec)
    Xc = R @ point + tvec
    xy = Xc[:2] / Xc[2]
    xy = geometry.distort_points(xy[None], dist)[0]
    return jnp.array(
        [
            K[0, 0] * xy[0] + K[0, 1] * xy[1] + K[0, 2],
            K[1, 1] * xy[1] + K[1, 2],
        ],
        dtype=cam_vec.dtype,
    )


def _residual_grid(cams, pts, K, dist, obs, mask,
                   update_intrinsic=False, update_distort=False):
    """(C,P),(N,3) -> masked residuals (C,N,2)."""
    proj = jax.vmap(  # over cameras
        lambda c6, K_, d_: jax.vmap(
            lambda p: _project_one(c6, K_, d_, p,
                                   update_intrinsic, update_distort)
        )(pts)
    )(cams, K, dist)
    return (proj - obs) * mask[..., None]


def _cost(cams, pts, K, dist, obs, mask,
          update_intrinsic=False, update_distort=False, huber_delta=0.0):
    r = _residual_grid(cams, pts, K, dist, obs, mask,
                       update_intrinsic, update_distort)
    if huber_delta and huber_delta > 0:
        # Huber ρ on the per-observation 2-norm: quadratic inside δ,
        # linear outside — gross outliers stop steering the solve
        s = jnp.sqrt(jnp.sum(r * r, axis=-1) + 1e-30)      # (C,N)
        rho = jnp.where(
            s <= huber_delta,
            0.5 * s * s,
            huber_delta * (s - 0.5 * huber_delta),
        )
        return jnp.sum(rho)
    return 0.5 * jnp.sum(r * r)


@partial(
    jax.jit,
    static_argnames=(
        "max_iters", "update_intrinsic", "update_distort", "huber_delta",
    ),
)
def _lm_solve(cams0, pts0, K, dist, obs, mask, max_iters: int = 30,
              update_intrinsic: bool = False, update_distort: bool = False,
              huber_delta: float = 0.0):
    """Schur-complement Levenberg–Marquardt.

    cams0 (C,P) with P = cam_param_size(...), pts0 (N,3), obs (C,N,2),
    mask (C,N) float.  Returns (cams, pts, cost0, cost, iters).

    ``huber_delta`` (pixels, 0 = plain least squares) robustifies the
    solve by IRLS: each iteration reweights observations by the Huber
    weight min(1, δ/||r||) applied to residuals AND Jacobians (sqrt-
    weighted), and step acceptance compares the true Huber objective —
    gross 2D outliers (wrong-limb detections) stop dragging the
    extrinsics while inliers keep full least-squares efficiency.
    """
    C = cams0.shape[0]
    P = cams0.shape[1]
    N = pts0.shape[0]
    dtype = cams0.dtype
    flags = (update_intrinsic, update_distort)

    def jacobians(cams, pts):
        jc = jax.vmap(
            lambda c6, K_, d_: jax.vmap(
                lambda p: jax.jacfwd(_project_one, argnums=0)(
                    c6, K_, d_, p, *flags
                )
            )(pts)
        )(cams, K, dist)  # (C,N,2,P)
        jp = jax.vmap(
            lambda c6, K_, d_: jax.vmap(
                lambda p: jax.jacfwd(_project_one, argnums=3)(
                    c6, K_, d_, p, *flags
                )
            )(pts)
        )(cams, K, dist)  # (C,N,2,3)
        m = mask[..., None, None]
        return jc * m, jp * m

    def step(cams, pts, lam):
        r = _residual_grid(cams, pts, K, dist, obs, mask, *flags)  # (C,N,2)
        jc, jp = jacobians(cams, pts)
        if huber_delta and huber_delta > 0:
            # IRLS: sqrt-Huber-weight residuals and Jacobians (masked
            # observations have r == 0 -> weight 1, harmless)
            s = jnp.sqrt(jnp.sum(r * r, axis=-1) + 1e-30)  # (C,N)
            sw = jnp.sqrt(jnp.where(s > huber_delta, huber_delta / s, 1.0))
            r = r * sw[..., None]
            jc = jc * sw[..., None, None]
            jp = jp * sw[..., None, None]
        # normal-equation blocks
        U = jnp.einsum("cnri,cnrj->cij", jc, jc)           # (C,P,P)
        V = jnp.einsum("cnri,cnrj->nij", jp, jp)           # (N,3,3)
        W = jnp.einsum("cnri,cnrj->cnij", jc, jp)          # (C,N,P,3)
        g_c = jnp.einsum("cnri,cnr->ci", jc, r)            # (C,P)
        g_p = jnp.einsum("cnri,cnr->ni", jp, r)            # (N,3)

        # Marquardt damping: scale the block diagonals
        eyeP = jnp.eye(P, dtype=dtype)
        eye3 = jnp.eye(3, dtype=dtype)
        U = U + lam * (U * eyeP)
        # tiny absolute floor guards singular blocks (unobserved points/cams)
        V = V + lam * (V * eye3) + 1e-12 * eye3
        U = U + 1e-12 * eyeP

        V_inv = jnp.linalg.inv(V)                          # (N,3,3)
        WVi = jnp.einsum("cnij,njk->cnik", W, V_inv)       # (C,N,P,3)
        # reduced camera system S (PC,PC)
        S_blocks = jnp.einsum("cnik,dnjk->cdij", WVi, W)   # (C,C,P,P)
        S = (
            jnp.zeros((C, C, P, P), dtype=dtype)
            .at[jnp.arange(C), jnp.arange(C)]
            .set(U)
            - S_blocks
        )
        S = S.transpose(0, 2, 1, 3).reshape(C * P, C * P)
        rhs = (g_c - jnp.einsum("cnik,nk->ci", WVi, g_p)).reshape(C * P)
        delta_c = jnp.linalg.solve(S, -rhs).reshape(C, P)
        delta_p = jnp.einsum(
            "nij,nj->ni",
            V_inv,
            -(g_p + jnp.einsum("cnij,ci->nj", W, delta_c)),
        )
        return cams + delta_c, pts + delta_p

    cost0 = _cost(cams0, pts0, K, dist, obs, mask, *flags,
                  huber_delta=huber_delta)

    def body(state):
        cams, pts, lam, cost, it, done = state
        new_cams, new_pts = step(cams, pts, lam)
        new_cost = _cost(new_cams, new_pts, K, dist, obs, mask, *flags,
                         huber_delta=huber_delta)
        accept = new_cost < cost
        rel_drop = (cost - new_cost) / jnp.maximum(cost, 1e-30)
        cams = jnp.where(accept, new_cams, cams)
        pts = jnp.where(accept, new_pts, pts)
        lam = jnp.where(accept, lam * 0.3, lam * 4.0)
        cost_next = jnp.where(accept, new_cost, cost)
        done = accept & (rel_drop < 1e-10)
        return cams, pts, lam, cost_next, it + 1, done

    def cond(state):
        _, _, lam, _, it, done = state
        return (~done) & (it < max_iters) & (lam < 1e10)

    lam0 = jnp.asarray(1e-4, dtype=dtype)
    state = (cams0, pts0, lam0, cost0, jnp.asarray(0), jnp.asarray(False))
    cams, pts, _, cost, iters, _ = jax.lax.while_loop(cond, body, state)
    return cams, pts, cost0, cost, iters


def _bundle_adjust_lm(
    points2d_rowcol, calib_prior, image_shape, update_intrinsic, update_distort,
    max_iters: int = 30,
    huber_px: float = 0.0,
) -> BundleAdjustResult:
    C, R0, t0, K, dist, pts0, obs, mask = _prepare(
        points2d_rowcol, calib_prior, image_shape
    )
    T, J = pts0.shape[:2]
    cams0 = jnp.asarray(np.stack([
        _pack_cam(R0[c], t0[c], K[c], dist[c], update_intrinsic, update_distort)
        for c in range(C)
    ]))
    cams, pts, cost0, cost, iters = _lm_solve(
        cams0,
        jnp.asarray(pts0.reshape(-1, 3)),
        jnp.asarray(K),
        jnp.asarray(dist),
        jnp.asarray(obs.reshape(C, -1, 2)),
        jnp.asarray(mask.reshape(C, -1), dtype=cams0.dtype),
        max_iters=max_iters,
        update_intrinsic=update_intrinsic,
        update_distort=update_distort,
        huber_delta=float(huber_px),
    )
    cams = np.asarray(cams)
    R_out, K_out, d_out = [], [], []
    for c in range(C):
        rvec, tvec, K_c, d_c = _unpack_cam(
            jnp.asarray(cams[c]), jnp.asarray(K[c]), jnp.asarray(dist[c]),
            update_intrinsic, update_distort,
        )
        R_out.append(np.asarray(geometry.rodrigues(rvec)))
        K_out.append(np.asarray(K_c))
        d_out.append(np.asarray(d_c))
    calib_out = geometry.arrays_to_calib(
        np.stack(R_out), cams[:, 3:6], np.stack(K_out), np.stack(d_out)
    )
    return BundleAdjustResult(
        calib=calib_out,
        points3d=np.asarray(pts).reshape(T, J, 3),
        cost_initial=float(cost0),
        cost_final=float(cost),
        iterations=int(iters),
        solver="lm",
    )


# ===================================================================== public


def bundle_adjust(
    points2d_rowcol: np.ndarray,
    calib_prior: Dict[int, dict],
    image_shape: Tuple[int, int],
    update_intrinsic: bool = False,
    update_distort: bool = False,
    solver: str = "parity",
    **kwargs,
) -> BundleAdjustResult:
    """Refine camera extrinsics (+3D points) from 2D observations.

    points2d_rowcol: (C, T, J, 2) normalized (row, col); zeros / col==1 are
    treated as unobserved (reference flip artifact, core.py:198-200).

    solver="lm" extras (kwargs): ``max_iters``; ``huber_px`` — Huber
    robustification scale in pixels (0 = plain least squares, the
    reference's behavior).  Use ~3-5x the expected inlier noise so
    wrong-limb 2D detections stop dragging the extrinsics.
    """
    if solver == "parity":
        return _bundle_adjust_parity(
            points2d_rowcol, calib_prior, image_shape, update_intrinsic, update_distort
        )
    if solver == "lm":
        return _bundle_adjust_lm(
            points2d_rowcol, calib_prior, image_shape, update_intrinsic,
            update_distort, **kwargs,
        )
    raise ValueError(f"unknown solver {solver!r}")
