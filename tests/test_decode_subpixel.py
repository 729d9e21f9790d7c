"""Sub-pixel decode accuracy (the north-star "2D within 0.1 px" claim).

BASELINE.md's accuracy row promises 2D keypoints within 0.1 px of the
true peak; ``decode_softargmax`` is the mechanism.  These tests quantify
it on synthetic Gaussian peaks with known sub-pixel centres (the exact
shape hourglass supervision trains toward, scripts/train_fly_weights.py
render_target_heatmaps) and pin the decode against the hard-argmax
baseline on the golden recording.

Pixel conversion: the 64x128 heatmap spans the 480x960 image, so one
heatmap cell is 7.5 px — 0.1 input px = 0.0133 cell.
"""

import os
import pickle

import numpy as np
import pytest

import jax.numpy as jnp

from deepfly3d_tpu.models import decode as decode_mod

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WEIGHTS = os.path.join(REPO, "weights", "hourglass_fly.npz")
GOLDEN = os.path.join(
    REPO, "tests", "data", "reference_df3d", "df3d_result_2d.pkl"
)

H, W = 64, 128
IMG_H, IMG_W = 480, 960


def _gaussian_maps(centers, sigma=1.5, amplitude=1.0):
    """(M, 2) float cell-centres -> (M, H, W, 1) unit-peak Gaussians."""
    rr = np.arange(H, dtype=np.float64)[:, None]
    cc = np.arange(W, dtype=np.float64)[None, :]
    maps = []
    for r, c in centers:
        d2 = (rr - r) ** 2 + (cc - c) ** 2
        maps.append(amplitude * np.exp(-d2 / (2.0 * sigma**2)))
    return np.stack(maps)[..., None].astype(np.float32)


def _decode_err_px(centers, method, **kw):
    maps = _gaussian_maps(centers, **{k: v for k, v in kw.items()
                                      if k in ("sigma", "amplitude")})
    pts, conf = decode_mod.decode_softargmax(
        jnp.asarray(maps), method=method,
        **{k: v for k, v in kw.items() if k in ("window", "temperature")},
    )
    pts = np.asarray(pts)[:, 0]                     # (M, 2) normalized
    got_cells = pts * np.array([H, W])
    err_cells = np.abs(got_cells - centers)
    # rows: 1 cell = IMG_H / H px; cols: IMG_W / W px (both 7.5)
    return err_cells * np.array([IMG_H / H, IMG_W / W])


@pytest.fixture(scope="module")
def centers():
    rng = np.random.default_rng(0)
    # interior sub-pixel centres across the whole map, away from borders
    r = rng.uniform(3, H - 4, size=200)
    c = rng.uniform(3, W - 4, size=200)
    return np.stack([r, c], axis=1)


class TestSyntheticPeaks:
    def test_parabolic_hits_north_star(self, centers):
        """Exact log-quadratic refinement: <0.1 px on clean Gaussians."""
        err = _decode_err_px(centers, "parabolic", sigma=1.5)
        assert err.max() < 0.1, err.max()

    def test_parabolic_across_sigmas_and_amplitudes(self, centers):
        for sigma in (1.0, 2.0, 3.0):
            for amp in (0.5, 1.0, 1.2):
                err = _decode_err_px(
                    centers[:50], "parabolic", sigma=sigma, amplitude=amp
                )
                assert err.max() < 0.1, (sigma, amp, err.max())

    def test_parabolic_survives_noise(self, centers):
        """With mild additive noise the refinement must stay sub-cell
        (the promise degrades gracefully, not catastrophically)."""
        rng = np.random.default_rng(1)
        maps = _gaussian_maps(centers[:100], sigma=1.5)
        maps = maps + rng.normal(0, 0.005, maps.shape).astype(np.float32)
        pts, _ = decode_mod.decode_softargmax(
            jnp.asarray(maps), method="parabolic"
        )
        got = np.asarray(pts)[:, 0] * np.array([H, W])
        err_px = np.abs(got - centers[:100]) * 7.5
        assert np.median(err_px) < 0.5
        assert err_px.max() < 7.5          # never leaves the argmax cell

    def test_windowed_softmax_beats_hard_argmax(self, centers):
        """The differentiable decode must at least beat the half-cell
        quantization floor of the hard argmax (3.75 px)."""
        err = _decode_err_px(
            centers, "window", window=5, temperature=10.0
        )
        assert err.max() < 3.75
        assert err.mean() < 1.5

    def test_global_softargmax_bias_is_why_windowing_exists(self, centers):
        """Documents the defect that motivated the windowed decode: a
        softmax over the full map puts O(HW) e^0 background mass against
        the peak's e^T and drags estimates toward the map centroid."""
        maps = _gaussian_maps(centers[:20], sigma=1.5)
        flat = jnp.asarray(maps).transpose(0, 3, 1, 2).reshape(20, 1, -1)
        probs = np.asarray(jnp.exp(flat * 10.0) / jnp.exp(flat * 10.0).sum(-1, keepdims=True))
        grid_r = np.repeat(np.arange(H), W)
        est_r = (probs[:, 0] * grid_r).sum(-1)
        err_px = np.abs(est_r - centers[:20, 0]) * 7.5
        assert err_px.max() > 1.0           # global decode is out of spec

    def test_conf_semantics_unchanged(self, centers):
        """conf must remain the unnormalized heatmap max (reference
        README.md:404) regardless of decode method."""
        maps = _gaussian_maps(centers[:10], sigma=1.5, amplitude=1.1)
        for method in ("parabolic", "window"):
            _, conf = decode_mod.decode_softargmax(
                jnp.asarray(maps), method=method
            )
            np.testing.assert_allclose(
                np.asarray(conf)[:, 0, 0], maps.max(axis=(1, 2, 3)),
                rtol=1e-6,
            )


@pytest.mark.skipif(
    not os.path.exists(WEIGHTS), reason="shipped weights not present"
)
class TestGoldenRecording:
    def test_soft_decode_within_half_cell_of_hard(self):
        """On real hourglass heatmaps the sub-pixel decode may move each
        point at most half a cell off the hard argmax (same cell, refined)
        — so golden parity holds with the documented half-cell slack."""
        import jax

        from deepfly3d_tpu.io import discovery
        from deepfly3d_tpu.models.hourglass import HourglassNet, load_weights
        from deepfly3d_tpu.ops import image as image_ops

        with open(GOLDEN, "rb") as f:
            golden = pickle.load(f)
        order = list(golden["camera_ordering"])
        flip_cams = {order[i] for i in range(len(order)) if i > 3}
        paths, flips = [], []
        for cam in range(7):
            for img in range(15):
                paths.append(os.path.join(
                    REPO, "tests", "data", "reference",
                    f"camera_{cam}_img_{img}.jpg",
                ))
                flips.append(cam in flip_cams)
        raw = np.stack([discovery.read_image(p) for p in paths])
        variables, spec = load_weights(WEIGHTS)
        input_shape = tuple(spec.input_shape or (256, 512))
        x = image_ops.preprocess_frames(
            jnp.asarray(raw), jnp.asarray(np.asarray(flips)), input_shape,
            jnp.float32,
        )
        hm = HourglassNet(spec).apply(variables, x, train=False)[-1]
        hard, _ = decode_mod.decode_argmax(hm)
        soft, conf_soft = decode_mod.decode_softargmax(hm)
        hard = np.asarray(hard)
        soft = np.asarray(soft)
        # same argmax cell, offset clamped to +-0.5 cell by construction;
        # this pins the integration (shapes, orientation, normalization)
        assert np.abs(soft - hard).max() <= 0.5 / 64 + 1e-6
        # and therefore golden parity within the half-cell slack
        p38 = decode_mod.postprocess_points2d(
            soft.reshape(7, 15, -1, 2), order
        )
        assert np.abs(
            p38 - golden["points2d"]
        ).max() <= 0.02 + 0.5 / 64 + 1e-6


class TestSubpixelTargets:
    """render_target_heatmaps(subpixel=True): Gaussians centered at the
    TRUE position (h36m recipe) — parabolic decode recovers it exactly;
    subpixel=False stays the cell-quantized fly-golden contract."""

    def test_roundtrip_exact(self):
        from deepfly3d_tpu.models.train import render_target_heatmaps

        rng = np.random.default_rng(0)
        N, K, H, W = 5, 7, 16, 24
        coords = rng.uniform(0.15, 0.85, (N, K, 2))
        peaks = rng.uniform(0.8, 1.1, (N, K))
        known = np.ones((N, K), bool)
        hm, cells = render_target_heatmaps(
            coords, peaks, known, (H, W), sigma=1.5, subpixel=True
        )
        # the discrete max sits at the rounded cell and equals the peak
        np.testing.assert_allclose(hm.max((1, 2)), peaks, rtol=1e-6)
        flat = hm.reshape(N, -1, K).argmax(1)
        np.testing.assert_array_equal(flat // W, cells[..., 0])
        np.testing.assert_array_equal(flat % W, cells[..., 1])
        # parabolic decode recovers the true sub-cell position
        pts, _ = decode_mod.decode_softargmax(jnp.asarray(hm))
        err_cells = np.abs(np.asarray(pts) - coords) * [H, W]
        assert err_cells.max() < 1e-4

    def test_quantized_default_unchanged(self):
        from deepfly3d_tpu.models.train import render_target_heatmaps

        rng = np.random.default_rng(1)
        N, K, H, W = 3, 5, 16, 24
        coords = rng.uniform(0.15, 0.85, (N, K, 2))
        peaks = np.ones((N, K))
        known = np.ones((N, K), bool)
        hm, cells = render_target_heatmaps(
            coords, peaks, known, (H, W), sigma=1.5
        )
        # peak exactly 1 at exactly the rounded cell (grid-centered)
        np.testing.assert_allclose(hm.max((1, 2)), 1.0, rtol=0)
        got = hm[np.arange(N)[:, None], cells[..., 0], cells[..., 1],
                 np.arange(K)[None, :]]
        np.testing.assert_allclose(got, 1.0, rtol=0)
