"""Pallas TPU kernels.

Three memory-bound ops from the inference hot path (SURVEY §7.6), written
as single-pass VMEM kernels so the intermediates never round-trip HBM:

* ``upsample2x_add_pallas`` — the hourglass decoder's nearest-2x upsample
  fused with the skip-connection add (one read of each input, one write;
  the naive composition materializes the upsampled tensor in HBM).
* ``decode_heatmaps_pallas`` — heatmap argmax decode: max + argmax + the
  row/col normalization in one pass over each (image, channel) map.
* ``preprocess_u8_pallas`` — uint8 -> f32 /255 with optional horizontal
  flip, fused so the u8->f32 blow-up happens in VMEM.

On non-TPU backends the kernels run in Pallas interpret mode; every kernel
is tested against its jnp oracle (tests/test_pallas.py).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ------------------------------------------------------- upsample 2x + add


def _upsample_add_kernel(inner_ref, skip_ref, out_ref):
    # inner: (H, W, C) block; skip/out: (2H, 2W, C) blocks
    x = inner_ref[0]                      # (H, W, C)
    h, w, c = x.shape
    x = x[:, None, :, None, :]
    x = jnp.broadcast_to(x, (h, 2, w, 2, c)).reshape(2 * h, 2 * w, c)
    out_ref[0] = x + skip_ref[0]


@jax.jit
def upsample2x_add_pallas(inner: jnp.ndarray, skip: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, C) inner + (N, 2H, 2W, C) skip -> (N, 2H, 2W, C)."""
    n, h, w, c = inner.shape
    return pl.pallas_call(
        _upsample_add_kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * h, 2 * w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2 * h, 2 * w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(skip.shape, skip.dtype),
        interpret=_interpret(),
    )(inner, skip)


def upsample2x_add_xla(inner: jnp.ndarray, skip: jnp.ndarray) -> jnp.ndarray:
    """jnp oracle for upsample2x_add_pallas."""
    n, h, w, c = inner.shape
    x = inner[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (n, h, 2, w, 2, c)).reshape(n, 2 * h, 2 * w, c)
    return x + skip


# ------------------------------------------------------------ heatmap decode


def _decode_kernel(hm_ref, pts_ref, conf_ref):
    # hm block: (1, K, H, W) -> one image, all channels resident in VMEM
    hm = hm_ref[0]                                 # (K, H, W)
    k, h, w = hm.shape
    flat = hm.reshape(k, h * w)
    conf = jnp.max(flat, axis=-1)                  # (K,)
    idx = jnp.argmax(flat, axis=-1).astype(jnp.int32)
    row = (idx // w).astype(jnp.float32) / h
    col = (idx % w).astype(jnp.float32) / w
    pts_ref[0] = jnp.stack([row, col], axis=-1)
    conf_ref[0] = conf[:, None]


@jax.jit
def decode_heatmaps_pallas(heatmaps: jnp.ndarray):
    """(N, H, W, K) f32 heatmaps -> ((N, K, 2) normalized (row, col), (N, K, 1)).

    Same contract as models.decode.decode_argmax (integer argmax / shape).
    """
    n, h, w, k = heatmaps.shape
    hm = heatmaps.transpose(0, 3, 1, 2)            # (N, K, H, W): lanes = W
    pts, conf = pl.pallas_call(
        _decode_kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, k, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, k, 2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, k, 2), jnp.float32),
            jax.ShapeDtypeStruct((n, k, 1), jnp.float32),
        ),
        interpret=_interpret(),
    )(hm)
    return pts, conf


# --------------------------------------------------------------- preprocess


def _preprocess_kernel(u8_ref, flip_ref, out_ref):
    x = u8_ref[0].astype(jnp.float32) * (1.0 / 255.0)   # (H, W, 3)
    flipped = x[:, ::-1, :]
    out_ref[0] = jnp.where(flip_ref[0, 0] != 0, flipped, x)


@jax.jit
def preprocess_u8_pallas(images_u8: jnp.ndarray, flip: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, 3) uint8 + (N,) int32 flip flags -> f32 in [0, 1]."""
    n, h, w, c = images_u8.shape
    flip2d = flip.astype(jnp.int32).reshape(n, 1)
    return pl.pallas_call(
        _preprocess_kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), jnp.float32),
        interpret=_interpret(),
    )(images_u8, flip2d)
