"""Hourglass model, decode, and postprocess unit tests (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from deepfly3d_tpu.models import decode as decode_mod
from deepfly3d_tpu.models.hourglass import (
    HourglassNet,
    HourglassSpec,
    init_params,
    load_weights,
    save_weights,
)

TINY = HourglassSpec(num_stacks=2, features=16, depth=2, num_blocks=1, num_classes=19)


class TestHourglass:
    def test_forward_shapes(self):
        variables = init_params(TINY, (64, 128), jax.random.PRNGKey(0))
        model = HourglassNet(TINY)
        out = model.apply(variables, jnp.zeros((2, 64, 128, 3)), train=False)
        # (stacks, N, H/4, W/4, classes)
        assert out.shape == (2, 2, 16, 32, 19)
        assert out.dtype == jnp.float32

    def test_stem_variants_forward_shapes(self):
        """All three stems land on the same H/4 x W/4 heatmap grid."""
        import dataclasses

        for stem in ("patchify", "patch8"):
            spec = dataclasses.replace(TINY, num_stacks=1, stem=stem)
            variables = init_params(spec, (64, 128), jax.random.PRNGKey(1))
            out = HourglassNet(spec).apply(
                variables, jnp.zeros((2, 64, 128, 3)), train=False
            )
            assert out.shape == (1, 2, 16, 32, 19), stem

    def test_train_mode_updates_stats(self):
        variables = init_params(TINY, (64, 128), jax.random.PRNGKey(0))
        model = HourglassNet(TINY)
        _, updates = model.apply(
            variables,
            jnp.ones((2, 64, 128, 3)),
            train=True,
            mutable=["batch_stats"],
        )
        before = jax.tree_util.tree_leaves(variables["batch_stats"])
        after = jax.tree_util.tree_leaves(updates["batch_stats"])
        assert any(
            not np.allclose(np.asarray(b), np.asarray(a))
            for b, a in zip(before, after)
        )

    def test_bfloat16_compute(self):
        spec = HourglassSpec(
            num_stacks=1, features=16, depth=2, num_classes=4,
            compute_dtype=jnp.bfloat16,
        )
        variables = init_params(spec, (32, 64), jax.random.PRNGKey(1))
        out = HourglassNet(spec).apply(
            variables, jnp.zeros((1, 32, 64, 3)), train=False
        )
        assert out.dtype == jnp.float32  # head stays f32

    def test_score_ksize_embed_is_equivalent(self, tmp_path):
        """1x1 score kernels embedded as 3x3 center taps are numerically
        equivalent (zero taps; residual ~1e-5 differences come only from
        the conv algorithm's reassociation, e.g. Winograd-style lowering),
        and the deployment-policy spec fields round-trip through
        save/load."""
        import dataclasses
        import sys

        sys.path.insert(
            0,
            __file__.rsplit("/tests/", 1)[0] + "/scripts",
        )
        from calibrate_score_head import embed_score_3x3

        variables = init_params(TINY, (32, 64), jax.random.PRNGKey(7))
        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(2, 32, 64, 3)), jnp.float32
        )
        out1 = HourglassNet(TINY).apply(variables, x, train=False)
        emb_vars, emb_spec = embed_score_3x3(variables, TINY)
        assert emb_spec.score_ksize == 3
        out2 = HourglassNet(emb_spec).apply(emb_vars, x, train=False)
        np.testing.assert_allclose(
            np.asarray(out1), np.asarray(out2), atol=1e-4)

        spec = dataclasses.replace(
            emb_spec, hp_scope="score", hp_precision="highest"
        )
        path = str(tmp_path / "cal.npz")
        save_weights(path, emb_vars, spec)
        loaded, loaded_spec = load_weights(path)
        assert loaded_spec.score_ksize == 3
        assert loaded_spec.hp_scope == "score"
        assert loaded_spec.hp_precision == "highest"
        out3 = HourglassNet(loaded_spec).apply(loaded, x, train=False)
        np.testing.assert_allclose(
            np.asarray(out1), np.asarray(out3), atol=1e-4)

    def test_save_load_round_trip(self, tmp_path):
        variables = init_params(TINY, (32, 64), jax.random.PRNGKey(2))
        path = str(tmp_path / "w.npz")
        save_weights(path, variables, TINY)
        loaded, spec = load_weights(path)
        assert spec == TINY
        x = jnp.ones((1, 32, 64, 3))
        out1 = HourglassNet(TINY).apply(variables, x, train=False)
        out2 = HourglassNet(spec).apply(loaded, x, train=False)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=0)

    def test_checkpoint_carries_input_shape(self, tmp_path):
        """A declared training resolution round-trips and wins in
        PoseEstimator over the caller's fallback; legacy checkpoints
        (input_shape=None) keep the caller's value."""
        import dataclasses

        from deepfly3d_tpu.models.inference import PoseEstimator

        spec = dataclasses.replace(TINY, input_shape=(32, 64))
        variables = init_params(spec, (32, 64), jax.random.PRNGKey(3))
        path = str(tmp_path / "w.npz")
        save_weights(path, variables, spec)
        _, loaded_spec = load_weights(path)
        assert loaded_spec.input_shape == (32, 64)
        est = PoseEstimator(path, input_shape=(64, 128))
        assert est.input_shape == (32, 64)

        legacy = str(tmp_path / "legacy.npz")
        save_weights(legacy, variables, TINY)
        est = PoseEstimator(legacy, input_shape=(64, 128))
        assert est.input_shape == (64, 128)


class TestDecode:
    def test_argmax_decode(self):
        hm = np.zeros((1, 64, 128, 2), dtype=np.float32)
        hm[0, 10, 100, 0] = 3.0
        hm[0, 63, 0, 1] = 0.5
        pts, conf = decode_mod.decode_argmax(jnp.asarray(hm))
        np.testing.assert_allclose(
            np.asarray(pts[0]), [[10 / 64, 100 / 128], [63 / 64, 0.0]]
        )
        np.testing.assert_allclose(np.asarray(conf[0, :, 0]), [3.0, 0.5])

    def test_softargmax_close_to_argmax_on_peaky_maps(self):
        rng = np.random.default_rng(0)
        hm = rng.random((2, 64, 128, 3)).astype(np.float32) * 0.01
        for n in range(2):
            for k in range(3):
                r, c = rng.integers(5, 59), rng.integers(5, 123)
                hm[n, r, c, k] = 5.0
        hard, _ = decode_mod.decode_argmax(jnp.asarray(hm))
        soft, _ = decode_mod.decode_softargmax(jnp.asarray(hm), temperature=30.0)
        np.testing.assert_allclose(np.asarray(soft), np.asarray(hard), atol=0.02)

    def test_postprocess_matches_golden_structure(self, golden_2d):
        """Inverting then re-applying the postprocess is the identity on
        golden data — proves the 19->38 assembly + flip semantics exactly."""
        from deepfly3d_tpu.models.train import golden_training_targets

        order = list(golden_2d["camera_ordering"])
        coords, peaks, known = golden_training_targets(
            golden_2d["points2d"], golden_2d["heatmap_confidence"], order
        )
        # rebuild the per-camera 19-channel predictions the network would
        # have produced (unknown channels decode to whatever -> use zeros)
        pred19 = np.where(known[..., None], coords, 0.0)
        rebuilt = decode_mod.postprocess_points2d(pred19, order)
        np.testing.assert_allclose(rebuilt, golden_2d["points2d"], atol=0)


class TestPatch16SubpixelHead:
    """The 1/8-resolution trunk + 2x depth-to-space head still emits
    input/4 heatmaps (the golden decode grid) and survives checkpoint
    round-trips."""

    def test_shapes_and_roundtrip(self, tmp_path):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from deepfly3d_tpu.models.hourglass import (
            HourglassNet, HourglassSpec, init_params, load_weights,
            save_weights,
        )

        spec = HourglassSpec(
            num_stacks=2, features=8, depth=2, stem="patch16",
            head_upsample=2, num_classes=19, input_shape=(64, 128),
        )
        v = init_params(spec, (64, 128), jax.random.PRNGKey(0))
        out = HourglassNet(spec).apply(
            v, jnp.zeros((1, 64, 128, 3)), train=False
        )
        assert out.shape == (2, 1, 16, 32, 19)
        path = str(tmp_path / "p16.npz")
        save_weights(path, v, spec)
        v2, spec2 = load_weights(path)
        assert spec2.head_upsample == 2 and spec2.stem == "patch16"
        out2 = HourglassNet(spec2).apply(
            v2, jnp.zeros((1, 64, 128, 3)), train=False
        )
        np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))

    def test_depth_to_space_layout(self):
        """Each output cell (h*2+dy, w*2+dx) must read channel block
        dy*2+dx — a mislaid transpose would scramble argmax decoding."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        u, K = 2, 3
        n, H, W = 1, 2, 2
        raw = jnp.arange(n * H * W * u * u * K, dtype=jnp.float32).reshape(
            n, H, W, u * u * K
        )
        score = (
            raw.reshape(n, H, W, u, u, K)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(n, H * u, W * u, K)
        )
        score = np.asarray(score)
        raw = np.asarray(raw)
        for h in range(H):
            for w in range(W):
                for dy in range(u):
                    for dx in range(u):
                        for k in range(K):
                            assert score[0, h * u + dy, w * u + dx, k] == (
                                raw[0, h, w, (dy * u + dx) * K + k]
                            )

    def test_shipped_p16_checkpoint_policy_and_forward(self):
        """The calibrated p16 checkpoint must carry its full deployment
        policy in __spec__ (the bench reconstructs the exact deployed
        program from it; a missing field silently changes numerics) and
        produce decode-grid heatmaps at input/4 via the subpixel head."""
        import os

        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "weights", "hourglass_fly_p16_tpu.npz",
        )
        if not os.path.exists(path):
            import pytest

            pytest.skip("calibrated p16 checkpoint not built")
        variables, spec = load_weights(path)
        assert spec.stem == "patch16"
        assert spec.head_upsample == 2
        assert spec.score_ksize == 3
        assert spec.hp_scope == "score"
        assert spec.input_shape == (256, 512)
        x = jnp.zeros((1, 256, 512, 3), jnp.float32)
        out = HourglassNet(spec).apply(variables, x, train=False)
        assert out.shape == (spec.num_stacks, 1, 64, 128, 19)


class TestCalibrationTargets:
    """Golden-cell inversion used by scripts/calibrate_score_head.py."""

    def test_golden_cells_structure(self, golden_2d):
        """Known-cell coverage must mirror the 19->38 assembly rules
        (reference core.py:189-199): middle camera fully free, the
        position-2/4 cameras free exactly on the 4 zeroed stripe/antenna
        channels, everything else pinned to an exact heatmap cell."""
        import sys

        sys.path.insert(
            0, __file__.rsplit("/tests/", 1)[0] + "/scripts"
        )
        from calibrate_score_head import golden_cells, region_cells

        cells = golden_cells(golden_2d, 64, 128)
        order = list(golden_2d["camera_ordering"])
        assert cells.shape == (105, 19)
        for pos, cam in enumerate(order):
            block = cells[cam * 15:(cam + 1) * 15]
            if pos == 3:
                assert (block == -1).all()
            elif pos in (2, 4):
                assert (block[:, :15] >= 0).all()
                assert (block[:, 15:] == -1).all()
            else:
                assert (block >= 0).all()
        # regions stay inside the contract: every region cell decodes
        # within 0.02 of the golden cell on both coordinates
        for cell in (0, 5000, 64 * 128 - 1):
            reg = region_cells(cell, 64, 128)
            r0, c0 = cell // 128, cell % 128
            for rc in reg:
                assert abs(rc // 128 - r0) / 64.0 < 0.02
                assert abs(rc % 128 - c0) / 128.0 < 0.02
