"""Rig registration (ops/canonicalize.py).

The registration stage is contract-critical in both directions: on
un-drifted input it must be the bit-exact identity (golden parity), and
on drifted input it must recover the drift so the deployed pipeline's
points track the provided frames (bench.py's held-out shift/gain
probes).  Unit tests run on synthetic rigs; the real-recording tests
use the bundled calibration recording + the shipped template.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from deepfly3d_tpu.ops import canonicalize as cz

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TEMPLATE = os.path.join(REPO, "weights", "rig_template_fly.npz")
IMAGES = os.path.join(REPO, "tests", "data", "reference")


def synthetic_recording(C=3, T=10, H=48, W=96, seed=0):
    """Per-camera static textured background + a small moving bright
    blob (the 'animal')."""
    rng = np.random.default_rng(seed)
    bg = rng.integers(10, 120, size=(C, H, W, 3), dtype=np.uint8)
    frames = np.broadcast_to(bg[:, None], (C, T, H, W, 3)).copy()
    for c in range(C):
        for t in range(T):
            r = 10 + (3 * t + 5 * c) % (H - 20)
            col = 20 + (7 * t) % (W - 30)
            frames[c, t, r:r + 6, col:col + 6] = 220
    return frames


@pytest.fixture(scope="module")
def rig():
    frames = synthetic_recording()
    tpl = cz.build_template(frames)
    return frames, tpl, cz.prepare(tpl)


class TestTemplateIO:
    def test_save_load_roundtrip(self, rig, tmp_path_factory):
        frames, tpl, _ = rig
        path = str(tmp_path_factory.mktemp("tpl") / "rig.npz")
        cz.save_template(path, tpl, source="synthetic")
        back = cz.load_template(path)
        assert back.num_cameras == tpl.num_cameras
        assert back.image_hw == tpl.image_hw
        np.testing.assert_array_equal(back.row_profile, tpl.row_profile)
        np.testing.assert_array_equal(back.col_profile, tpl.col_profile)
        np.testing.assert_allclose(back.mean, tpl.mean, rtol=1e-6)

    def test_find_template_sidecar_and_shared(self, tmp_path):
        ckpt = tmp_path / "model.npz"
        ckpt.write_bytes(b"x")
        assert cz.find_template(str(ckpt)) is None
        shared = tmp_path / "rig_template_fly.npz"
        shared.write_bytes(b"x")
        assert cz.find_template(str(ckpt)) == str(shared)
        sidecar = tmp_path / "model.npz.rig.npz"
        sidecar.write_bytes(b"x")
        assert cz.find_template(str(ckpt)) == str(sidecar)


class TestEstimator:
    def test_clean_is_exact_identity(self, rig):
        frames, _, ta = rig
        tc = np.transpose(frames, (1, 0, 2, 3, 4))
        dy, dx, gain = map(np.asarray, cz.estimate_tc(jnp.asarray(tc), ta))
        assert not dy.any() and not dx.any()
        np.testing.assert_array_equal(gain, 1.0)

    @pytest.mark.parametrize("dyx", [(0, 2), (0, -2), (3, 0), (-4, 5)])
    def test_shift_recovered_exactly(self, rig, dyx):
        frames, _, ta = rig
        d_y, d_x = dyx
        tc = np.transpose(frames, (1, 0, 2, 3, 4))
        shifted = np.roll(np.roll(tc, d_y, axis=2), d_x, axis=3)
        dy, dx, gain = map(
            np.asarray, cz.estimate_tc(jnp.asarray(shifted), ta))
        np.testing.assert_array_equal(dy, d_y)
        np.testing.assert_array_equal(dx, d_x)
        np.testing.assert_array_equal(gain, 1.0)
        # round trip: apply_shift_tc recovers the clean frames bit-exactly
        back = np.asarray(cz.apply_shift_tc(
            jnp.asarray(shifted), jnp.asarray(dy), jnp.asarray(dx)))
        np.testing.assert_array_equal(back, tc)

    def test_gain_estimated_and_dead_zone(self, rig):
        frames, tpl, ta = rig
        tc = np.transpose(frames, (1, 0, 2, 3, 4)).astype(np.float32)
        gained = np.clip(tc * 1.05, 0, 255).astype(np.uint8)
        dy, dx, gain = map(
            np.asarray, cz.estimate_tc(jnp.asarray(gained), ta))
        assert not dy.any() and not dx.any()
        # recovered within clipping bias
        np.testing.assert_allclose(gain, 1.05, atol=0.01)
        # inside the dead zone: snapped to exactly 1
        mild = np.clip(tc * 1.01, 0, 255).astype(np.uint8)
        _, _, gain = map(np.asarray, cz.estimate_tc(jnp.asarray(mild), ta))
        np.testing.assert_array_equal(gain, 1.0)

    def test_combined_drift(self, rig):
        frames, _, ta = rig
        tc = np.transpose(frames, (1, 0, 2, 3, 4))
        drifted = np.roll(
            np.clip(tc.astype(np.float32) * 0.95, 0, 255).astype(np.uint8),
            -3, axis=3)
        dy, dx, gain = map(
            np.asarray, cz.estimate_tc(jnp.asarray(drifted), ta))
        np.testing.assert_array_equal(dy, 0)
        np.testing.assert_array_equal(dx, -3)
        np.testing.assert_allclose(gain, 0.95, atol=0.01)

    def test_host_estimator_matches_device(self, rig):
        frames, tpl, ta = rig
        tc = np.transpose(frames, (1, 0, 2, 3, 4))
        drifted = np.roll(tc, 4, axis=3)
        dy_d, dx_d, g_d = map(
            np.asarray, cz.estimate_tc(jnp.asarray(drifted), ta))
        for cam in range(frames.shape[0]):
            dy, dx, g = cz.estimate_camera_np(
                np.transpose(drifted, (1, 0, 2, 3, 4))[cam], tpl, cam)
            assert (dy, dx) == (int(dy_d[cam]), int(dx_d[cam]))
            assert g == pytest.approx(float(g_d[cam]), abs=1e-5)

    def test_gain_correction_exact_one(self):
        gain = jnp.asarray([1.0, 0.95])
        corr = np.asarray(cz.gain_correction(gain, jnp.float32))
        assert corr[0] == 1.0
        assert corr[1] == pytest.approx(1 / 0.95, rel=1e-6)


class TestPointAdjustment:
    def test_adjust_points38_masks_artifacts(self):
        C, T = 2, 1
        p38 = np.zeros((C, T, 4, 2), np.float32)
        p38[0, 0, 0] = [0.25, 0.5]          # real observation
        p38[0, 0, 1] = [0.0, 0.0]           # unobserved (zero encoding)
        p38[0, 0, 2] = [0.0, 1.0]           # flip artifact
        p38[1, 0, 3] = [0.5, 0.25]
        dy = jnp.asarray([2, 0], jnp.int32)
        dx = jnp.asarray([-4, 8], jnp.int32)
        out = np.asarray(cz.adjust_points38(
            jnp.asarray(p38), dy, dx, (480, 960)))
        np.testing.assert_allclose(
            out[0, 0, 0], [0.25 + 2 / 480, 0.5 - 4 / 960], rtol=1e-6)
        np.testing.assert_array_equal(out[0, 0, 1], [0.0, 0.0])
        np.testing.assert_array_equal(out[0, 0, 2], [0.0, 1.0])
        np.testing.assert_allclose(
            out[1, 0, 3], [0.5, 0.25 + 8 / 960], rtol=1e-6)

    def test_adjust_points_raw_flip_consistency(self):
        """Raw adjustment in the flipped frame must land, after the
        assembly's col <- 1 - col, at canonical + dx/W."""
        pts = np.array([[[0.3, 0.4]]])      # (N=1, K=1, 2), flipped frame
        dy, dx = np.array([1]), np.array([5])
        flip = np.array([True])
        out = cz.adjust_points_raw(pts, dy, dx, flip, (480, 960))
        canonical_col = 1.0 - 0.3 if False else 1.0 - pts[0, 0, 1]
        assert 1.0 - out[0, 0, 1] == pytest.approx(
            canonical_col + 5 / 960, rel=1e-9)
        assert out[0, 0, 0] == pytest.approx(0.3 + 1 / 480, rel=1e-9)
        # unflipped camera: plain +dx/W
        out_u = cz.adjust_points_raw(pts, dy, dx, np.array([False]),
                                     (480, 960))
        assert out_u[0, 0, 1] == pytest.approx(0.4 + 5 / 960, rel=1e-9)


@pytest.mark.skipif(not os.path.exists(TEMPLATE),
                    reason="shipped rig template not present")
class TestRealRecording:
    @pytest.fixture(scope="class")
    def golden_frames(self):
        from deepfly3d_tpu.io import discovery

        return np.stack([
            discovery.read_image(
                os.path.join(IMAGES, f"camera_{c}_img_{t}.jpg"))
            for c in range(7) for t in range(15)
        ]).reshape(7, 15, 480, 960, 3)

    def test_shipped_template_clean_identity(self, golden_frames):
        tpl = cz.load_template(TEMPLATE)
        for cam in range(7):
            dy, dx, g = cz.estimate_camera_np(golden_frames[cam], tpl, cam)
            assert (dy, dx, g) == (0, 0, 1.0), cam

    def test_shipped_template_recovers_probe_drift(self, golden_frames):
        tpl = cz.load_template(TEMPLATE)
        for d_x in (-2, 2, 8):
            shifted = np.roll(golden_frames, d_x, axis=3)
            for cam in range(7):
                dy, dx, _ = cz.estimate_camera_np(shifted[cam], tpl, cam)
                assert (dy, dx) == (0, d_x), (cam, d_x)
        gained = np.clip(
            golden_frames.astype(np.float32) * 0.95, 0, 255
        ).astype(np.uint8)
        for cam in range(7):
            dy, dx, g = cz.estimate_camera_np(gained[cam], tpl, cam)
            assert (dy, dx) == (0, 0)
            assert g == pytest.approx(0.95, abs=0.01)
