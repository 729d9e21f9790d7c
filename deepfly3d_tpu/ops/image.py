"""Device-side image preprocessing as MXU matmuls.

The inference ingest (reference df2d's DataLoader resize, cv2-based; see
models/inference.py) needs uint8 camera frames (480x960) cast, normalized,
optionally h-flipped, and bilinear-resized to the network input (256x512).
Composed naively (cast -> where-flip -> jax.image.resize) that's ~58 ms per
448-image dispatch on v5e — the full-resolution float32 intermediates and
the resize's gather lowering dominate the whole pipeline after the network
itself.

Separable bilinear (incl. the antialias triangle filter jax.image.resize
applies when downscaling) is linear per axis, so each axis is a dense
(out, in) weight matrix — extracted *exactly* by pushing an identity matrix
through jax.image.resize once at trace time (so any future change of its
kernel semantics is picked up automatically). The whole preprocess then
becomes:

    frames_u8 -> einsum(H-matrix/255, x) -> einsum(W-matrix, .) -> flip

two big matmuls on the MXU (with /255 folded into the H weights) plus one
cheap low-resolution flip. Horizontal flip commutes with W-resizing because
the bilinear/antialias grid is symmetric; flipping after the downscale
touches 7x less data. Measured ~6x faster than the naive chain; exactness
vs jax.image.resize is asserted by tests/test_image_ops.py.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=16)
def _resize_matrix(n_in: int, n_out: int) -> np.ndarray:
    """Exact 1D bilinear(+antialias) resize weights of jax.image.resize.

    Row o of the returned (n_out, n_in) matrix holds the input weights of
    output sample o. Computed eagerly on CPU (never under a trace) by
    resizing the identity matrix along axis 0, once per (n_in, n_out) pair.
    """
    eye = np.eye(n_in, dtype=np.float32)
    with jax.ensure_compile_time_eval():
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            m = jax.image.resize(jnp.asarray(eye), (n_out, n_in),
                                 method="bilinear")
            return np.asarray(jax.device_get(m))


def resize_matrices(
    in_shape: Tuple[int, int], out_shape: Tuple[int, int], dtype=jnp.float32,
    scale: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """-> (RH (h_out, h_in), RW (w_out, w_in)); ``scale`` is folded into RH."""
    rh = _resize_matrix(in_shape[0], out_shape[0]) * scale
    rw = _resize_matrix(in_shape[1], out_shape[1])
    return jnp.asarray(rh, dtype), jnp.asarray(rw, dtype)


@partial(jax.jit, static_argnames=("out_shape", "dtype"))
def preprocess_frames(
    frames_u8: jnp.ndarray,    # (N, H, W, 3) uint8
    flip: jnp.ndarray,         # (N,) bool — horizontal flip
    out_shape: Tuple[int, int],
    dtype=jnp.float32,
) -> jnp.ndarray:
    """uint8 frames -> normalized, flipped, resized (N, h, w, 3) in ``dtype``.

    Exactly equivalent (up to matmul reassociation) to::

        x = frames.astype(f32)/255
        x = where(flip, x[:, :, ::-1], x)
        x = jax.image.resize(x, (N, h, w, 3), "bilinear")
    """
    n, h_in, w_in, c = frames_u8.shape
    rh, rw = resize_matrices((h_in, w_in), out_shape, dtype, scale=1.0 / 255.0)
    x = frames_u8.astype(dtype)
    # H-axis first: shrinks the tensor before the W pass
    x = jnp.einsum("oh,nhwc->nowc", rh, x)
    x = jnp.einsum("ow,nhwc->nhoc", rw, x)
    # flip commutes with symmetric resampling; do it on the small tensor
    return jnp.where(flip[:, None, None, None], x[:, :, ::-1, :], x)
