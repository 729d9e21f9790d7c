"""Pallas kernels vs their jnp oracles (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from deepfly3d_tpu.models import decode as decode_mod
from deepfly3d_tpu.ops.pallas import (
    decode_heatmaps_pallas,
    preprocess_u8_pallas,
    upsample2x_add_pallas,
)
from deepfly3d_tpu.ops.pallas.kernels import upsample2x_add_xla


def test_upsample_add_matches_oracle():
    rng = np.random.default_rng(0)
    inner = jnp.asarray(rng.normal(size=(2, 8, 16, 32)).astype(np.float32))
    skip = jnp.asarray(rng.normal(size=(2, 16, 32, 32)).astype(np.float32))
    got = upsample2x_add_pallas(inner, skip)
    want = upsample2x_add_xla(inner, skip)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0)


def test_decode_matches_reference_decode():
    rng = np.random.default_rng(1)
    hm = rng.normal(size=(3, 64, 128, 19)).astype(np.float32)
    pts_p, conf_p = decode_heatmaps_pallas(jnp.asarray(hm))
    pts_r, conf_r = decode_mod.decode_argmax(jnp.asarray(hm))
    np.testing.assert_allclose(np.asarray(pts_p), np.asarray(pts_r), atol=1e-7)
    np.testing.assert_allclose(np.asarray(conf_p), np.asarray(conf_r), atol=0)


def test_preprocess_flip():
    rng = np.random.default_rng(2)
    imgs = rng.integers(0, 255, size=(2, 8, 16, 3)).astype(np.uint8)
    flip = jnp.asarray([0, 1], jnp.int32)
    out = np.asarray(preprocess_u8_pallas(jnp.asarray(imgs), flip))
    np.testing.assert_allclose(out[0], imgs[0].astype(np.float32) / 255.0, atol=1e-7)
    np.testing.assert_allclose(
        out[1], imgs[1, :, ::-1].astype(np.float32) / 255.0, atol=1e-7
    )
