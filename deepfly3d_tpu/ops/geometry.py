"""Multi-view geometry as vectorized JAX ops.

Replaces pyba's NumPy/OpenCV camera model (used via reference
df3d/core.py:120-126, 246-250, 355-356) with closed-form, vmappable math:

* Rodrigues rotation (forward + inverse) — no cv2.Rodrigues (SURVEY §2.3 N6)
* pinhole projection with OpenCV 5-coefficient distortion
* masked DLT triangulation over all (frame, joint) pairs in one vmap
* reprojection error

Conventions (reverse-engineered from the golden artifacts, see SURVEY §8 and
the round-1 parity experiments; verified to 4e-15 against
tests/data/reference_df3d/df3d_result_3d.pkl):

* stored ``points2d`` is normalized (row, col) in [0, 1]
* the observation plane is pixel (x, y) = (col * W, row * H)
* world→camera: ``Xc = R @ Xw + tvec``; projection u = fx*Xc0/Xc2 + cx (x),
  v = fy*Xc1/Xc2 + cy (y)
* a 2D point is *observed* iff row != 0 and col != 0 and col != 1 (zeros mean
  "unseen", col == 1 is the reference's flip artifact, core.py:198-200)

All functions are dtype-polymorphic; run under x64 for reference-parity
(1e-5) and f32 on TPU for throughput.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ----------------------------------------------------------------- rotations


def rodrigues(rvec: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (3,) -> rotation matrix (3,3), safe at theta=0."""
    theta = jnp.linalg.norm(rvec)
    # Guard the 1/theta: at theta ~ 0 the sin/(1-cos) terms vanish anyway.
    safe = jnp.where(theta < 1e-12, 1.0, theta)
    k = rvec / safe
    K = jnp.array(
        [
            [0.0, -k[2], k[1]],
            [k[2], 0.0, -k[0]],
            [-k[1], k[0], 0.0],
        ],
        dtype=rvec.dtype,
    )
    eye = jnp.eye(3, dtype=rvec.dtype)
    R = eye + jnp.sin(theta) * K + (1.0 - jnp.cos(theta)) * (K @ K)
    return jnp.where(theta < 1e-12, eye, R)


def inv_rodrigues(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (3,3) -> axis-angle (3,)."""
    cos_t = jnp.clip((jnp.trace(R) - 1.0) / 2.0, -1.0, 1.0)
    axis_raw = jnp.array(
        [R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]], dtype=R.dtype
    )
    sin_t = 0.5 * jnp.linalg.norm(axis_raw)
    theta = jnp.arctan2(sin_t, cos_t)
    # Generic case
    generic = axis_raw / jnp.where(jnp.abs(sin_t) < 1e-12, 1.0, 2.0 * sin_t) * theta
    # Near theta = pi the off-diagonal differences vanish; recover the axis
    # from the diagonal of (R + I) / 2 = kk^T.
    diag = jnp.clip((jnp.diagonal(R) + 1.0) / 2.0, 0.0, None)
    axis_pi = jnp.sqrt(diag)
    # choose signs from the largest off-diagonal products
    signs = jnp.array(
        [
            1.0,
            jnp.where(R[0, 1] + R[1, 0] >= 0, 1.0, -1.0),
            jnp.where(R[0, 2] + R[2, 0] >= 0, 1.0, -1.0),
        ],
        dtype=R.dtype,
    )
    axis_pi = axis_pi * signs * theta
    near_pi = jnp.abs(sin_t) < 1e-6
    near_zero = theta < 1e-12
    out = jnp.where(near_pi, axis_pi, generic)
    return jnp.where(near_zero, jnp.zeros(3, dtype=R.dtype), out)


# ---------------------------------------------------------------- projection


def distort_points(xy: jnp.ndarray, dist: jnp.ndarray) -> jnp.ndarray:
    """OpenCV 5-coefficient distortion on normalized coords (..., 2)."""
    k1, k2, p1, p2, k3 = dist[0], dist[1], dist[2], dist[3], dist[4]
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + k1 * r2 + k2 * r2 * r2 + k3 * r2 * r2 * r2
    x_t = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    y_t = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([x * radial + x_t, y * radial + y_t], axis=-1)


def undistort_points(
    xy_dist: jnp.ndarray, dist: jnp.ndarray, iters: int = 8
) -> jnp.ndarray:
    """Inverse of :func:`distort_points` on normalized coords (..., 2).

    Fixed-point iteration (the OpenCV ``undistortPoints`` scheme): solve
    ``distort(x) = x_dist`` by ``x <- (x_dist - tangential(x)) / radial(x)``.
    Exact identity when all coefficients are zero, so zero-distortion rigs
    (the fly rig: distort == 0 in data/calib.pkl) are bit-unchanged.
    """
    k1, k2, p1, p2, k3 = dist[0], dist[1], dist[2], dist[3], dist[4]
    xd, yd = xy_dist[..., 0], xy_dist[..., 1]
    x, y = xd, yd
    for _ in range(iters):  # unrolled: fixed trip count, jit-friendly
        r2 = x * x + y * y
        radial = 1.0 + k1 * r2 + k2 * r2 * r2 + k3 * r2 * r2 * r2
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        x = (xd - dx) / radial
        y = (yd - dy) / radial
    return jnp.stack([x, y], axis=-1)


def project(
    points3d: jnp.ndarray,
    R: jnp.ndarray,
    tvec: jnp.ndarray,
    intr: jnp.ndarray,
    distort: jnp.ndarray,
) -> jnp.ndarray:
    """World points (..., 3) -> pixel (x, y) observations (..., 2)."""
    Xc = points3d @ R.T + tvec
    xy = Xc[..., :2] / Xc[..., 2:3]
    xy = distort_points(xy, distort)
    u = intr[0, 0] * xy[..., 0] + intr[0, 1] * xy[..., 1] + intr[0, 2]
    v = intr[1, 1] * xy[..., 1] + intr[1, 2]
    return jnp.stack([u, v], axis=-1)


def project_normalized_rowcol(
    points3d: jnp.ndarray,
    R: jnp.ndarray,
    tvec: jnp.ndarray,
    intr: jnp.ndarray,
    distort: jnp.ndarray,
    image_shape: Tuple[int, int],
) -> jnp.ndarray:
    """Project to the stored (row, col) normalized convention."""
    width, height = image_shape
    xy = project(points3d, R, tvec, intr, distort)
    return jnp.stack([xy[..., 1] / height, xy[..., 0] / width], axis=-1)


# ---------------------------------------------------------------- visibility


def observation_mask(points2d_rowcol: jnp.ndarray) -> jnp.ndarray:
    """(..., 2) normalized (row, col) -> bool mask of real observations."""
    row, col = points2d_rowcol[..., 0], points2d_rowcol[..., 1]
    return (row != 0) & (col != 0) & (col != 1)


def rowcol_to_pixel_xy(
    points2d_rowcol: jnp.ndarray, image_shape: Tuple[int, int]
) -> jnp.ndarray:
    """Normalized (row, col) -> pixel (x, y)."""
    width, height = image_shape
    return jnp.stack(
        [points2d_rowcol[..., 1] * width, points2d_rowcol[..., 0] * height], axis=-1
    )


def _undistort_pixels(
    uv: jnp.ndarray, intr: jnp.ndarray, dist: jnp.ndarray
) -> jnp.ndarray:
    """Distorted pixel (..., 2) -> ideal-pinhole pixel, one camera."""
    fx, gamma, cx = intr[0, 0], intr[0, 1], intr[0, 2]
    fy, cy = intr[1, 1], intr[1, 2]
    yn = (uv[..., 1] - cy) / fy
    xn = (uv[..., 0] - cx - gamma * yn) / fx
    xy = undistort_points(jnp.stack([xn, yn], axis=-1), dist)
    u = fx * xy[..., 0] + gamma * xy[..., 1] + cx
    v = fy * xy[..., 1] + cy
    return jnp.stack([u, v], axis=-1)


# ------------------------------------------------------------- triangulation


def projection_matrices(
    R: jnp.ndarray, tvec: jnp.ndarray, intr: jnp.ndarray
) -> jnp.ndarray:
    """(C,3,3),(C,3),(C,3,3) -> (C,3,4) P = K [R | t]."""
    Rt = jnp.concatenate([R, tvec[..., None]], axis=-1)
    return intr @ Rt


def _dlt_single(
    obs_xy: jnp.ndarray, P: jnp.ndarray, mask: jnp.ndarray, method: str = "svd"
) -> jnp.ndarray:
    """Masked homogeneous DLT for one 3D point.

    obs_xy: (C, 2) pixel observations; P: (C, 3, 4); mask: (C,) bool.
    Rows of invisible cameras are zeroed — they contribute nothing to A^T A,
    so the result equals a DLT over only the visible cameras.

    method='svd' (default): smallest right-singular vector — full precision,
    used by the x64 parity path.  method='eigh': smallest eigenvector of the
    4x4 normal matrix A^T A — half the significant digits (fine in f32
    production) but far cheaper than many tiny batched SVDs on TPU.
    method='normal': closed-form path — inhomogeneous 3x3 solve (Cramer)
    seeds ONE inverse-power iteration on the 4x4 normal matrix (Schur-block
    closed-form solve), converging onto the same smallest-eigenvector
    solution as svd/eigh to ~1e-6 while using only elementwise VPU math;
    the fastest production variant.  Valid because reconstructed points
    are never at infinity in this workload.
    """
    m = mask[:, None].astype(obs_xy.dtype)
    rows_x = (obs_xy[:, 0:1] * P[:, 2, :] - P[:, 0, :]) * m
    rows_y = (obs_xy[:, 1:2] * P[:, 2, :] - P[:, 1, :]) * m
    A = jnp.concatenate([rows_x, rows_y], axis=0)  # (2C, 4) x-rows then y-rows
    if method == "normal":
        # column preconditioning: the near-telecentric rig (f ~ 16000 px)
        # gives A a large condition number, and normal equations square it —
        # unit-normalizing columns recovers the lost digits
        s = jnp.sqrt(jnp.sum(A * A, axis=0)) + 1e-30   # (4,)
        An = A / s
        M = An[:, :3]
        b = -An[:, 3]
        # light Tikhonov damping keeps near-degenerate two-camera joints
        # (rank-deficient depth) finite in float32
        AtA = M.T @ M + 1e-6 * jnp.eye(3, dtype=A.dtype)
        Atb = M.T @ b                              # (3,)
        # Cramer's rule via the adjugate — no factorization, no iteration
        c00 = AtA[1, 1] * AtA[2, 2] - AtA[1, 2] * AtA[2, 1]
        c01 = AtA[0, 2] * AtA[2, 1] - AtA[0, 1] * AtA[2, 2]
        c02 = AtA[0, 1] * AtA[1, 2] - AtA[0, 2] * AtA[1, 1]
        c10 = AtA[1, 2] * AtA[2, 0] - AtA[1, 0] * AtA[2, 2]
        c11 = AtA[0, 0] * AtA[2, 2] - AtA[0, 2] * AtA[2, 0]
        c12 = AtA[0, 2] * AtA[1, 0] - AtA[0, 0] * AtA[1, 2]
        c20 = AtA[1, 0] * AtA[2, 1] - AtA[1, 1] * AtA[2, 0]
        c21 = AtA[0, 1] * AtA[2, 0] - AtA[0, 0] * AtA[2, 1]
        c22 = AtA[0, 0] * AtA[1, 1] - AtA[0, 1] * AtA[1, 0]
        det = AtA[0, 0] * c00 + AtA[0, 1] * c10 + AtA[0, 2] * c20
        adj = jnp.asarray([[c00, c01, c02], [c10, c11, c12], [c20, c21, c22]])
        Binv = adj / det                           # (A'^T A')[:3,:3]^-1

        # one inverse-power iteration on the full 4x4 normal matrix N of
        # the preconditioned system, seeded with the inhomogeneous solution
        # [y, 1]: v <- N^-1 v converges onto the smallest eigenvector (the
        # homogeneous/svd solution).  N = [[B, c],[c^T, d]]; solve via the
        # Schur complement using the adjugate-based B^-1 already computed.
        y = Binv @ Atb
        cvec = An[:, :3].T @ An[:, 3]              # (3,)
        d = jnp.sum(An[:, 3] * An[:, 3])
        Bi_c = Binv @ cvec
        schur = d - cvec @ Bi_c

        def solve_precond(u1, u2):
            """(An^T An)^-1 [u1, u2] via the Schur complement."""
            Bi_u1 = Binv @ u1
            w2 = (u2 - cvec @ Bi_u1) / schur
            w1 = Bi_u1 - Bi_c * w2
            return w1, w2

        # inverse-power iteration on the ORIGINAL normal matrix A^T A
        # (its smallest eigenvector IS the svd solution).  With the
        # diagonal preconditioner D = diag(1/s):  A^T A = D^-1 Ñ D^-1,
        # so (A^T A)^-1 u = D (Ñ^-1 (D u)) — the well-conditioned Ñ
        # factorization does all the work.
        seed = y * (s[3] / s[:3])                  # inhomogeneous solution
        x1, x2 = seed, jnp.asarray(1.0, dtype=y.dtype)
        for _ in range(4):                         # unrolled; ~20 flops each
            w1, w2 = solve_precond(x1 / s[:3], x2 / s[3])
            nx1, nx2 = w1 / s[:3], w2 / s[3]
            nrm = jnp.sqrt(nx1 @ nx1 + nx2 * nx2) + 1e-30
            x1, x2 = nx1 / nrm, nx2 / nrm
        refined = x1 / x2                          # dehomogenize
        point = jnp.where(jnp.all(jnp.isfinite(refined)), refined, seed)
        valid = jnp.sum(mask) >= 2
        return jnp.where(valid, point, jnp.zeros(3, dtype=obs_xy.dtype))
    if method == "eigh":
        _, vecs = jnp.linalg.eigh(A.T @ A)
        X = vecs[:, 0]
    else:
        _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
        X = Vt[-1]
    point = X[:3] / X[3]
    valid = jnp.sum(mask) >= 2
    return jnp.where(valid, point, jnp.zeros(3, dtype=obs_xy.dtype))


def triangulate(
    points2d_rowcol: jnp.ndarray,
    R: jnp.ndarray,
    tvec: jnp.ndarray,
    intr: jnp.ndarray,
    image_shape: Tuple[int, int],
    method: str = "svd",
    distort: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """DLT-triangulate every (frame, joint).

    points2d_rowcol: (C, T, J, 2) normalized (row, col).
    Returns (T, J, 3) world points; zeros where fewer than two cameras see
    the joint.  Equivalent of pyba's ``CameraNetwork.triangulate`` (called at
    reference core.py:355-356); validated to 4e-15 against the golden pickle.

    ``distort``: optional (C, 5) OpenCV coefficients. When given, pixel
    observations are undistorted (iterative model inverse through K^-1)
    before the linear DLT — required for rigs with real lenses (the H3.6M
    profile); with zero coefficients the correction is an exact identity,
    so the fly rig's golden parity is untouched.
    """
    C, T, J, _ = points2d_rowcol.shape
    P = projection_matrices(R, tvec, intr)  # (C, 3, 4)
    obs = rowcol_to_pixel_xy(points2d_rowcol, image_shape)  # (C,T,J,2)
    mask = observation_mask(points2d_rowcol)  # (C,T,J)
    if distort is not None:
        obs = jax.vmap(_undistort_pixels)(obs, intr, distort)

    obs_flat = obs.reshape(C, T * J, 2).transpose(1, 0, 2)  # (TJ, C, 2)
    mask_flat = mask.reshape(C, T * J).T  # (TJ, C)
    pts = jax.vmap(
        lambda o, m: _dlt_single(o, P, m, method), in_axes=(0, 0)
    )(obs_flat, mask_flat)
    return pts.reshape(T, J, 3)


# --------------------------------------------------------------- reprojection


def reprojection_residuals(
    points3d: jnp.ndarray,
    points2d_rowcol: jnp.ndarray,
    R: jnp.ndarray,
    tvec: jnp.ndarray,
    intr: jnp.ndarray,
    distort: jnp.ndarray,
    image_shape: Tuple[int, int],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-observation pixel residuals.

    Returns (res, mask): res (C, T, J, 2) = projected - observed in pixel
    (x, y); mask (C, T, J) of real observations.
    """
    proj = jax.vmap(
        lambda R_, t_, K_, d_: project(points3d, R_, t_, K_, d_)
    )(R, tvec, intr, distort)  # (C, T, J, 2)
    obs = rowcol_to_pixel_xy(points2d_rowcol, image_shape)
    mask = observation_mask(points2d_rowcol)
    res = (proj - obs) * mask[..., None].astype(proj.dtype)
    return res, mask


def reprojection_error(
    points3d: jnp.ndarray,
    points2d_rowcol: jnp.ndarray,
    R: jnp.ndarray,
    tvec: jnp.ndarray,
    intr: jnp.ndarray,
    distort: jnp.ndarray,
    image_shape: Tuple[int, int],
) -> jnp.ndarray:
    """Mean L2 pixel reprojection error over visible observations."""
    res, mask = reprojection_residuals(
        points3d, points2d_rowcol, R, tvec, intr, distort, image_shape
    )
    norms = jnp.linalg.norm(res, axis=-1)
    denom = jnp.maximum(jnp.sum(mask), 1)
    return jnp.sum(norms) / denom


# ------------------------------------------------------------------ packing


def calib_to_arrays(calib: Dict[int, dict], num_cameras: int, dtype=np.float64):
    """Dict-of-dicts calib -> stacked (C,3,3), (C,3), (C,3,3), (C,5) arrays."""
    R = np.stack([np.asarray(calib[c]["R"], dtype=dtype) for c in range(num_cameras)])
    tvec = np.stack(
        [np.asarray(calib[c]["tvec"], dtype=dtype) for c in range(num_cameras)]
    )
    intr = np.stack(
        [np.asarray(calib[c]["intr"], dtype=dtype) for c in range(num_cameras)]
    )
    distort = np.stack(
        [np.asarray(calib[c]["distort"], dtype=dtype) for c in range(num_cameras)]
    )
    return R, tvec, intr, distort


def arrays_to_calib(R, tvec, intr, distort) -> Dict[int, dict]:
    num_cameras = np.asarray(R).shape[0]
    return {
        c: {
            "R": np.asarray(R[c]),
            "tvec": np.asarray(tvec[c]),
            "distort": np.asarray(distort[c]),
            "intr": np.asarray(intr[c]),
        }
        for c in range(num_cameras)
    }
