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


@partial(jax.jit, static_argnames=("temperature",))
def decode_softargmax(
    heatmaps: jnp.ndarray, temperature: float = 10.0
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Differentiable sub-pixel decode: softmax-weighted expected coords."""
    N, H, W, K = heatmaps.shape
    hm = heatmaps.astype(jnp.float32)
    flat = hm.transpose(0, 3, 1, 2).reshape(N, K, H * W)
    probs = jax.nn.softmax(flat * temperature, axis=-1)
    rows = jnp.arange(H, dtype=jnp.float32)[:, None]
    cols = jnp.arange(W, dtype=jnp.float32)[None, :]
    grid_r = jnp.broadcast_to(rows, (H, W)).reshape(-1)
    grid_c = jnp.broadcast_to(cols, (H, W)).reshape(-1)
    row = probs @ grid_r / H
    col = probs @ grid_c / W
    conf = jnp.max(flat, axis=-1, keepdims=True)
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
