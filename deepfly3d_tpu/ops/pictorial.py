"""Pictorial-structures MAP correction over the camera graph.

The reference README/paper claim this capability ("enforces geometric
constraints using pictorial structures", reference README.md:10) but only
hooks survive in the snapshot: the hyperparameters (num_peak=10,
upper_bound=200, alpha_reproj=30, alpha_heatmap=600, alpha_bone=10 —
reference df3d/config.py:55-60), per-joint bone priors
(skeleton_fly.py:252-261) and a dangling ``solve_bp_for_camnet`` mention
(README.md:305).  This is a from-scratch vectorized reconstruction
(SURVEY §5.9 mandates it):

1. top-k peak candidates per (camera, joint) from the heatmaps
2. 3D hypotheses by two-view triangulation of candidate pairs across the
   side's camera pairs
3. unary potential: heatmap support (alpha_heatmap) minus reprojection
   error (alpha_reproj) summed over the side's cameras
4. pairwise potential: bone-length prior (alpha_bone) between consecutive
   leg joints, parameterized by the skeleton's (mean, std) ratios
5. exact MAP per 5-joint leg chain by max-product dynamic programming
   (``lax.scan`` Viterbi), vmapped over (frame, leg)

Everything is fixed-shape and jit-compiled; candidate count is statically
bounded by ``upper_bound``.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from deepfly3d_tpu.ops import geometry


@dataclasses.dataclass(frozen=True)
class PictorialParams:
    num_peak: int = 10
    upper_bound: int = 200        # max 3D candidates kept per joint
    alpha_reproj: float = 30.0
    alpha_heatmap: float = 600.0
    alpha_bone: float = 10.0


# ------------------------------------------------------------ peak extraction


@partial(jax.jit, static_argnames=("k",))
def top_k_peaks(heatmaps: jnp.ndarray, k: int = 10):
    """(N, H, W, J) -> (coords (N, J, k, 2) normalized (row, col), scores (N, J, k))."""
    N, H, W, J = heatmaps.shape
    flat = heatmaps.transpose(0, 3, 1, 2).reshape(N, J, H * W)
    scores, idx = jax.lax.top_k(flat, k)
    row = (idx // W).astype(jnp.float32) / H
    col = (idx % W).astype(jnp.float32) / W
    return jnp.stack([row, col], axis=-1), scores


# ---------------------------------------------------------- two-view geometry


def _triangulate_pair(xy_a, xy_b, P_a, P_b):
    """Minimal two-view DLT for one point; xy in pixels."""
    A = jnp.stack(
        [
            xy_a[0] * P_a[2] - P_a[0],
            xy_a[1] * P_a[2] - P_a[1],
            xy_b[0] * P_b[2] - P_b[0],
            xy_b[1] * P_b[2] - P_b[1],
        ]
    )
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    X = Vt[-1]
    return X[:3] / X[3]


# ------------------------------------------------------------------ MAP solve


def _chain_viterbi(unary: jnp.ndarray, pairwise: jnp.ndarray):
    """Exact MAP on a chain.

    unary: (L, M) per-joint candidate scores (higher = better);
    pairwise: (L-1, M, M) transition scores.
    Returns (best_idx (L,), best_score).
    """
    L, M = unary.shape

    def fwd(carry, inp):
        prev_best = carry                      # (M,) best score ending at m
        u, pw = inp                            # (M,), (M, M) prev x cur
        cand = prev_best[:, None] + pw + u[None, :]
        best = jnp.max(cand, axis=0)
        argbest = jnp.argmax(cand, axis=0)
        return best, argbest

    final, backptrs = jax.lax.scan(fwd, unary[0], (unary[1:], pairwise))
    last = jnp.argmax(final)

    def bwd(carry, ptrs):
        idx = carry
        prev = ptrs[idx]
        return prev, idx

    first, rest = jax.lax.scan(bwd, last, backptrs, reverse=True)
    return jnp.concatenate([jnp.asarray([first]), rest]), jnp.max(final)


def solve_leg_map(
    cand2d: jnp.ndarray,       # (n_cams, L, K, 2) candidate pixels (x, y)
    cand_scores: jnp.ndarray,  # (n_cams, L, K) heatmap peak values
    P: jnp.ndarray,            # (n_cams, 3, 4) projection matrices
    bone_mean: jnp.ndarray,    # (L-1,) prior mean bone length (world units)
    bone_std: jnp.ndarray,     # (L-1,) prior std
    params: PictorialParams,
):
    """MAP 3D chain for one leg at one frame.

    Returns (points3d (L, 3), map_score).
    """
    n_cams, L, K, _ = cand2d.shape

    # --- generate 3D hypotheses from all camera pairs x candidate pairs
    pair_idx = [(a, b) for a in range(n_cams) for b in range(a + 1, n_cams)]
    hyps = []
    hyp_src = []
    for a, b in pair_idx:
        ka, kb = jnp.meshgrid(jnp.arange(K), jnp.arange(K), indexing="ij")
        ka, kb = ka.reshape(-1), kb.reshape(-1)
        X = jax.vmap(
            lambda i, j: jax.vmap(
                lambda l: _triangulate_pair(
                    cand2d[a, l, i], cand2d[b, l, j], P[a], P[b]
                )
            )(jnp.arange(L))
        )(ka, kb)                              # (K*K, L, 3)
        hyps.append(X)
    hyps = jnp.concatenate(hyps, axis=0)       # (M_all, L, 3)
    hyps = hyps.transpose(1, 0, 2)             # (L, M_all, 3)
    M_all = hyps.shape[1]

    # --- unary: heatmap support minus reprojection error over all cameras
    def score_candidates(X_l, l):
        # X_l: (M_all, 3) hypotheses for joint l
        proj = jax.vmap(lambda Pc: (Pc[:, :3] @ X_l.T + Pc[:, 3:]).T)(P)  # (n_cams, M, 3)
        uv = proj[..., :2] / proj[..., 2:3]
        # distance to the nearest candidate peak of this camera/joint,
        # weighted by that peak's heatmap score
        d = jnp.linalg.norm(
            uv[:, :, None, :] - cand2d[:, l][:, None, :, :], axis=-1
        )                                       # (n_cams, M, K)
        nearest = jnp.min(d, axis=-1)           # (n_cams, M)
        k_near = jnp.argmin(d, axis=-1)
        hm = jnp.take_along_axis(
            cand_scores[:, l], k_near.reshape(n_cams, -1), axis=1
        ).reshape(n_cams, M_all)
        unary = (
            params.alpha_heatmap * hm - params.alpha_reproj * nearest
        ).sum(axis=0)
        return unary

    unary = jax.vmap(score_candidates, in_axes=(0, 0))(
        hyps, jnp.arange(L)
    )                                           # (L, M_all)

    # --- keep only the strongest `upper_bound` hypotheses per joint
    M = min(params.upper_bound, M_all)
    unary_top, keep = jax.lax.top_k(unary, M)   # (L, M)
    hyps_top = jnp.take_along_axis(hyps, keep[:, :, None], axis=1)  # (L, M, 3)

    # --- pairwise: bone-length prior between consecutive joints
    diff = hyps_top[:-1, :, None, :] - hyps_top[1:, None, :, :]     # (L-1, M, M, 3)
    length = jnp.linalg.norm(diff, axis=-1)
    z = (length - bone_mean[:, None, None]) / bone_std[:, None, None]
    pairwise = -params.alpha_bone * z * z

    idx, score = _chain_viterbi(unary_top, pairwise)
    pts = hyps_top[jnp.arange(L), idx]
    return pts, score


@partial(jax.jit, static_argnames=("params", "legs", "leg_len"))
def correct_legs_map(
    cand2d: jnp.ndarray,       # (n_cams, T, J_side, K, 2) pixel candidates
    cand_scores: jnp.ndarray,  # (n_cams, T, J_side, K)
    P: jnp.ndarray,            # (n_cams, 3, 4)
    bone_mean: jnp.ndarray,    # (J_side-?,) per-bone priors, leg-major (legs*(leg_len-1),)
    bone_std: jnp.ndarray,
    params: PictorialParams = PictorialParams(),
    legs: int = 3,
    leg_len: int = 5,
):
    """MAP-correct every (frame, leg) chain; vmapped, one XLA program.

    Returns points3d (T, legs*leg_len, 3) for the side's leg joints.
    """
    n_cams, T = cand2d.shape[:2]

    def one(t, leg):
        sl = leg * leg_len
        pts, _ = solve_leg_map(
            jax.lax.dynamic_slice_in_dim(cand2d[:, t], sl, leg_len, axis=1),
            jax.lax.dynamic_slice_in_dim(cand_scores[:, t], sl, leg_len, axis=1),
            P,
            jax.lax.dynamic_slice_in_dim(bone_mean, leg * (leg_len - 1), leg_len - 1),
            jax.lax.dynamic_slice_in_dim(bone_std, leg * (leg_len - 1), leg_len - 1),
            params,
        )
        return pts

    tt, ll = jnp.meshgrid(jnp.arange(T), jnp.arange(legs), indexing="ij")
    pts = jax.vmap(jax.vmap(one))(tt, ll)       # (T, legs, leg_len, 3)
    return pts.reshape(T, legs * leg_len, 3)
