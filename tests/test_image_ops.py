"""Matmul-based preprocess vs the naive cast/flip/jax.image.resize chain."""

import jax
import jax.numpy as jnp
import numpy as np

from deepfly3d_tpu.ops import image as image_ops


def _naive(frames_u8, flip, out_shape):
    x = frames_u8.astype(jnp.float32) / 255.0
    x = jnp.where(flip[:, None, None, None], x[:, :, ::-1, :], x)
    return jax.image.resize(
        x, (x.shape[0],) + out_shape + (3,), method="bilinear"
    )


class TestPreprocessFrames:
    def test_matches_naive_no_flip(self):
        rng = np.random.default_rng(0)
        frames = jnp.asarray(
            rng.integers(0, 255, size=(3, 48, 96, 3)), jnp.uint8
        )
        flip = jnp.zeros(3, bool)
        out = image_ops.preprocess_frames(frames, flip, (32, 64))
        ref = _naive(frames, flip, (32, 64))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_flip_commutes_with_resize(self):
        """flip-after-downscale (ours) == flip-before (reference order)."""
        rng = np.random.default_rng(1)
        frames = jnp.asarray(
            rng.integers(0, 255, size=(4, 48, 96, 3)), jnp.uint8
        )
        flip = jnp.asarray([True, False, True, True])
        out = image_ops.preprocess_frames(frames, flip, (32, 64))
        ref = _naive(frames, flip, (32, 64))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_production_shape_exact(self):
        """The real 480x960 -> 256x512 path (downscale -> antialias taps)."""
        rng = np.random.default_rng(2)
        frames = jnp.asarray(
            rng.integers(0, 255, size=(2, 480, 960, 3)), jnp.uint8
        )
        flip = jnp.asarray([False, True])
        out = image_ops.preprocess_frames(frames, flip, (256, 512))
        ref = _naive(frames, flip, (256, 512))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_upscale_path(self):
        """Upscaling uses plain bilinear (no antialias) — must still match."""
        rng = np.random.default_rng(3)
        frames = jnp.asarray(
            rng.integers(0, 255, size=(2, 16, 32, 3)), jnp.uint8
        )
        flip = jnp.zeros(2, bool)
        out = image_ops.preprocess_frames(frames, flip, (32, 64))
        ref = _naive(frames, flip, (32, 64))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
