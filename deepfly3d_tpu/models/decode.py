"""Heatmap decoding and the 19→38 joint postprocess.

Decode contract (reverse-engineered from the golden pickle, see SURVEY §2.2):
``points2d = (argmax_row / H, argmax_col / W)`` — plain integer argmax over
the 64x128 heatmap, normalized by the heatmap shape; confidence is the
*unnormalized* heatmap maximum (can exceed 1.0, reference README.md:404).

A soft-argmax variant provides sub-heatmap-pixel decoding for the
north-star accuracy target; the hard argmax stays the default for golden
parity.

The postprocess replicates reference df3d/core.py:189-203 exactly,
*including* the documented flip artifact (zero columns become 1.0 on
right-side cameras, core.py:198-200) which is present in the shipped golden
data.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def decode_argmax(heatmaps: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(N, H, W, K) heatmaps -> normalized (row, col) (N, K, 2) + conf (N, K, 1)."""
    N, H, W, K = heatmaps.shape
    hm = heatmaps.astype(jnp.float32)
    flat = hm.transpose(0, 3, 1, 2).reshape(N, K, H * W)
    idx = jnp.argmax(flat, axis=-1)
    conf = jnp.max(flat, axis=-1, keepdims=True)
    # f32 is exact here: heatmap shapes are powers of two, so cell ratios
    # idx/H, idx/W have exact f32 representations (and TPUs have no f64)
    row = (idx // W).astype(jnp.float32) / H
    col = (idx % W).astype(jnp.float32) / W
    return jnp.stack([row, col], axis=-1), conf


@partial(jax.jit, static_argnames=("temperature", "window", "method"))
def decode_softargmax(
    heatmaps: jnp.ndarray,
    temperature: float = 10.0,
    window: int = 5,
    method: str = "parabolic",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sub-pixel decode around the argmax cell.

    The naive global soft-argmax (softmax over all H*W cells) is biased:
    with unit-amplitude Gaussian peaks and temperature 10, the ~8k
    background cells of a 64x128 map hold a e^0-per-cell mass that drags
    every estimate toward the map centroid by tens of percent.  Both
    methods here therefore operate on a ``window``-sized patch around the
    integer argmax (static shapes — one gather per joint, jit/TPU clean):

    * ``method="parabolic"`` (default): separable 3-point log-parabola
      refinement through the peak cell and its row/col neighbours.  For
      an exact Gaussian peak log h is quadratic, so the sub-pixel offset
      (log h[+1] - log h[-1]) / (2 (2 log h[0] - log h[-1] - log h[+1]))
      is exact — measured <0.01 input px on synthetic peaks
      (tests/test_decode_subpixel.py), beating the 0.1 px north star.
    * ``method="window"``: softmax-weighted expectation over the window —
      differentiable everywhere (the trainer's choice), small residual
      grid bias at window edges.

    Returns normalized (row, col) (N, K, 2) + conf (N, K, 1); conf stays
    the unnormalized heatmap max (the reference's confidence semantics).
    """
    N, H, W, K = heatmaps.shape
    hm = heatmaps.astype(jnp.float32)
    flat = hm.transpose(0, 3, 1, 2).reshape(N, K, H * W)
    idx = jnp.argmax(flat, axis=-1)
    conf = jnp.max(flat, axis=-1, keepdims=True)
    r0 = idx // W
    c0 = idx % W

    half = window // 2
    rs = jnp.clip(r0 - half, 0, H - window)
    cs = jnp.clip(c0 - half, 0, W - window)
    maps = hm.transpose(0, 3, 1, 2).reshape(N * K, H, W)

    def take_patch(m, r, c):
        return jax.lax.dynamic_slice(m, (r, c), (window, window))

    patches = jax.vmap(take_patch)(
        maps, rs.reshape(-1), cs.reshape(-1)
    ).reshape(N, K, window, window)

    if method == "parabolic":
        # position of the peak inside the (clamped) patch
        pr = (r0 - rs).reshape(N, K)
        pc = (c0 - cs).reshape(N, K)
        logp = jnp.log(jnp.maximum(patches, 1e-12))

        def axis_offset(lp, p, size):
            """3-point log-parabola along one axis of the patch."""
            center = jnp.take_along_axis(lp, p[..., None], axis=-1)[..., 0]
            prev = jnp.take_along_axis(
                lp, jnp.maximum(p - 1, 0)[..., None], axis=-1
            )[..., 0]
            nxt = jnp.take_along_axis(
                lp, jnp.minimum(p + 1, size - 1)[..., None], axis=-1
            )[..., 0]
            denom = 2.0 * center - prev - nxt
            off = jnp.where(
                denom > 1e-8, (nxt - prev) / (2.0 * denom), 0.0
            )
            # at a map border (no true neighbour) fall back to the cell
            edge = (p == 0) | (p == size - 1)
            return jnp.where(edge, 0.0, jnp.clip(off, -0.5, 0.5))

        # reduce over the orthogonal axis through the peak line
        lp_rows = jnp.take_along_axis(
            logp, pc[..., None, None], axis=-1
        )[..., 0]                                     # (N, K, window) col=peak
        lp_cols = jnp.take_along_axis(
            logp, pr[..., None, None], axis=-2
        )[..., 0, :]                                  # (N, K, window) row=peak
        dr = axis_offset(lp_rows, pr, window)
        dc = axis_offset(lp_cols, pc, window)
        row = (r0.astype(jnp.float32) + dr) / H
        col = (c0.astype(jnp.float32) + dc) / W
        return jnp.stack([row, col], axis=-1), conf

    probs = jax.nn.softmax(
        patches.reshape(N, K, -1) * temperature, axis=-1
    ).reshape(N, K, window, window)
    offs = jnp.arange(window, dtype=jnp.float32)
    er = jnp.einsum("nkrc,r->nk", probs, offs)
    ec = jnp.einsum("nkrc,c->nk", probs, offs)
    row = (rs.astype(jnp.float32) + er) / H
    col = (cs.astype(jnp.float32) + ec) / W
    return jnp.stack([row, col], axis=-1), conf


def postprocess_points2d(
    points2d_19: np.ndarray,
    camera_ordering: Sequence[int],
    num_joints: int = 38,
) -> np.ndarray:
    """(C, T, 19, 2) per-camera predictions -> (C, T, 38, 2) assembled pose.

    Exact semantics of reference df3d/core.py:189-203:
    1. ordering positions 0-2 fill joints 0:19, positions 4-6 fill 19:38,
       position 3 (middle camera) is discarded;
    2. the position-2 camera cannot see stripes/antenna -> joints 15: zeroed,
       position-4 likewise for 19+15:;
    3. right-side cameras (positions 4-6) were fed horizontally flipped
       images, so col <- 1 - col — which also turns zero-filled entries into
       exactly 1.0 (the artifact the golden data contains).
    """
    points2d_19 = np.asarray(points2d_19)
    order = np.asarray(camera_ordering)
    C, T = points2d_19.shape[:2]
    side = points2d_19.shape[2]
    out = np.zeros((C, T, num_joints, 2), dtype=np.float64)
    out[order[:3], :, :side] = points2d_19[order[:3]]
    out[order[4:], :, side:] = points2d_19[order[4:]]
    out[order[2], :, 15:] = 0
    out[order[4], :, side + 15 :] = 0
    for pos in (4, 5, 6):
        out[order[pos], ..., 1] = 1 - out[order[pos], ..., 1]
    return out
