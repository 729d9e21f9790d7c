"""CLI-level coverage of the streaming pipeline and the h36m profile.

VERDICT r2 items 6 and 7: the bounded-memory streaming video path (SURVEY
N3) and the H3.6M profile (BASELINE config #4) must be reachable from the
shipped CLI, not only from library/test code.
"""

import os
import pickle
import shutil

import numpy as np
import pytest

from conftest import GOLDEN_DIR, REFERENCE_IMAGES, REPO_ROOT

from deepfly3d_tpu import cli

WEIGHTS = str(REPO_ROOT / "weights" / "hourglass_fly.npz")


def _run_cli(argv):
    args = cli.parse_cli_args(argv)
    return cli.run(args)


@pytest.mark.skipif(
    not os.path.exists(WEIGHTS + ".PARITY"),
    reason="golden-parity weights not trained yet",
)
class TestStreamingCLI:
    def test_mp4_only_folder_no_jpegs(self, tmp_path, golden_2d):
        """CLI on a videos-only folder with --streaming: the golden-
        equivalent result pickle appears and NO JPEGs are written
        (the reference must expand first, reference core.py:446-459)."""
        work = tmp_path / "videos_only"
        work.mkdir()
        for cam in range(7):
            shutil.copy(REFERENCE_IMAGES / f"camera_{cam}.mp4", work)
        out = tmp_path / "out"
        rc = _run_cli([
            str(work), "--output-folder", str(out), "--streaming",
            "-n", "2", "--checkpoint", WEIGHTS,
        ])
        assert rc == 0
        # the defining property: no intermediate JPEGs anywhere
        assert not list(work.glob("*.jpg"))
        results = list(out.glob("df3d_result_*.pkl"))
        assert len(results) == 1
        with open(results[0], "rb") as f:
            saved = pickle.load(f)
        assert saved["points2d"].shape == (7, 2, 38, 2)
        assert saved["heatmap_confidence"].shape == (7, 2, 19, 1)
        assert "points3d" in saved and saved["points3d"].shape == (2, 38, 3)
        # same tolerance as the expansion-path robustness test
        # (tests/test_core.py::TestPoseEstimationRobustness): the video
        # frames are one H.264 decode away from the golden JPEGs
        np.testing.assert_allclose(
            saved["points2d"], golden_2d["points2d"][:, :2], atol=0.02
        )

    def test_streaming_falls_back_without_videos(self, tmp_path):
        """A jpg-only folder with --streaming silently uses the image
        pipeline (warning logged) instead of failing."""
        from deepfly3d_tpu.core import Core

        work = tmp_path / "imgs"
        work.mkdir()
        for cam in range(7):
            for img in range(2):
                shutil.copy(
                    REFERENCE_IMAGES / f"camera_{cam}_img_{img}.jpg", work
                )
        core = Core(str(work), str(tmp_path / "o"), 2,
                    [0, 1, 2, 3, 4, 5, 6], streaming=True)
        assert core.streaming is False
        assert core.num_images == 2


class TestH36MProfileCLI:
    @pytest.fixture()
    def h36m_recording(self, tmp_path):
        """Synthetic 4-camera 17-joint recording + matching calib prior +
        a tiny random h36m checkpoint, CLI-consumable."""
        import cv2
        import jax
        import jax.numpy as jnp

        from deepfly3d_tpu.models.hourglass import (
            HourglassSpec, init_params, save_weights,
        )
        from deepfly3d_tpu.ops import geometry

        C, T, J = 4, 2, 17
        H = W = 96
        rng = np.random.default_rng(7)
        base = rng.normal(size=(J, 3)) * 0.3
        pts = np.stack([base + rng.normal(size=(J, 3)) * 0.02
                        for _ in range(T)])
        K = np.asarray([[110.0, 0, W / 2], [0, 110.0, H / 2], [0, 0, 1]])
        prior = {}
        work = tmp_path / "h36m_rec"
        work.mkdir()
        for c in range(C):
            R = np.asarray(geometry.rodrigues(
                jnp.asarray([0.0, np.pi / 2 * c, 0.0])))
            tvec = np.asarray([0.0, 0.0, 4.0])
            prior[c] = {
                "R": R, "tvec": tvec, "intr": K, "distort": np.zeros(5),
            }
            px = np.asarray(geometry.project(
                jnp.asarray(pts.reshape(-1, 3)), jnp.asarray(R),
                jnp.asarray(tvec), jnp.asarray(K), jnp.zeros(5),
            )).reshape(T, J, 2)
            yy, xx = np.mgrid[0:H, 0:W]
            for t in range(T):
                img = np.zeros((H, W, 3), np.float32)
                for j in range(J):
                    img[..., j % 3] += 255 * np.exp(
                        -((yy - px[t, j, 1]) ** 2 + (xx - px[t, j, 0]) ** 2)
                        / (2 * 3.0**2)
                    )
                cv2.imwrite(
                    str(work / f"camera_{c}_img_{t}.jpg"),
                    np.clip(img, 0, 255).astype(np.uint8),
                )
        prior_path = tmp_path / "h36m_prior.pkl"
        with open(prior_path, "wb") as f:
            pickle.dump(prior, f)
        spec = HourglassSpec(
            num_stacks=1, features=16, depth=2, num_classes=J,
            input_shape=(H, W),
        )
        variables = init_params(spec, (H, W), jax.random.PRNGKey(0))
        ckpt = tmp_path / "h36m_tiny.npz"
        save_weights(str(ckpt), variables, spec)
        return work, prior_path, ckpt

    def test_h36m_cli_end_to_end(self, tmp_path, h36m_recording):
        """`df3d-cli <folder> --profile h36m` executes the 4-camera
        17-joint pipeline through the shipped CLI path (VERDICT r2 #7)."""
        work, prior_path, ckpt = h36m_recording
        out = tmp_path / "h36m_out"
        rc = _run_cli([
            str(work), "--output-folder", str(out), "--profile", "h36m",
            "--calib-prior", str(prior_path), "--checkpoint", str(ckpt),
            "--solver", "lm",
        ])
        assert rc == 0
        results = list(out.glob("df3d_result_*.pkl"))
        assert len(results) == 1
        with open(results[0], "rb") as f:
            saved = pickle.load(f)
        assert saved["points2d"].shape == (4, 2, 17, 2)
        assert saved["heatmap_confidence"].shape == (4, 2, 17, 1)
        assert saved["points3d"].shape == (2, 17, 3)
        assert np.isfinite(saved["points3d"]).all()
        assert list(saved["camera_ordering"]) == [0, 1, 2, 3]
