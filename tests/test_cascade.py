"""Cascade pipeline: splice logic, static shapes, scoring plumbing."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import CALIB_PRIOR

from deepfly3d_tpu.models.cascade import CascadeConfig, build_cascade_pipeline
from deepfly3d_tpu.models.hourglass import (
    HourglassNet, HourglassSpec, init_params,
)
from deepfly3d_tpu.ops import geometry


@pytest.fixture(scope="module")
def tiny_setup():
    import pickle

    student_spec = HourglassSpec(
        num_stacks=1, features=8, depth=2, stem="patch8", num_classes=19,
        input_shape=(64, 128),
    )
    teacher_spec = HourglassSpec(
        num_stacks=1, features=8, depth=2, stem="patchify", num_classes=19,
        input_shape=(64, 128),
    )
    student_vars = init_params(student_spec, (64, 128), jax.random.PRNGKey(1))
    teacher_vars = init_params(teacher_spec, (64, 128), jax.random.PRNGKey(2))
    with open(CALIB_PRIOR, "rb") as f:
        calib_dict = pickle.load(f)
    calib = geometry.calib_to_arrays(calib_dict, 7, dtype=np.float32)
    return student_spec, student_vars, teacher_spec, teacher_vars, calib


def _full_pass(spec, variables, frames, order):
    """Reference computation: one net on every image, decoded."""
    from deepfly3d_tpu.models.cascade import _decode
    from deepfly3d_tpu.ops import image as image_ops

    T, C, H, W, _ = frames.shape
    flip_mask = np.zeros(C, bool)
    flip_mask[np.asarray(order)[4:]] = True
    x = jnp.asarray(frames.reshape(T * C, H, W, 3))
    flip = jnp.tile(jnp.asarray(flip_mask), T)
    xp = image_ops.preprocess_frames(
        x, flip, tuple(spec.input_shape), jnp.float32
    )
    hm = HourglassNet(spec).apply(variables, xp, train=False)[-1]
    pts, conf = _decode(hm)
    return np.asarray(pts), np.asarray(conf)


class TestCascade:
    def test_output_contract_and_splice(self, tiny_setup):
        student_spec, student_vars, teacher_spec, teacher_vars, calib = (
            tiny_setup
        )
        order = np.arange(7)
        T = 3
        rng = np.random.default_rng(0)
        frames = rng.integers(
            0, 255, size=(T, 7, 480, 960, 3), dtype=np.uint8
        )
        cfg = CascadeConfig(repair_frac=0.2)
        pipe = build_cascade_pipeline(
            student_vars, student_spec, teacher_vars, teacher_spec,
            calib, order, cfg,
        )
        pts3d, p38, conf = jax.block_until_ready(pipe(jnp.asarray(frames)))
        assert pts3d.shape == (T, 38, 3)
        assert p38.shape == (7, T, 38, 2)
        assert conf.shape == (7, T, 19, 1)

        # per-image outputs must equal either the student's or the
        # teacher's own full pass — and the repaired count must match the
        # static bound ceil(0.2 * 21) = 5
        pts_s, conf_s = _full_pass(student_spec, student_vars, frames, order)
        pts_t, _ = _full_pass(teacher_spec, teacher_vars, frames, order)
        n = T * 7
        from_teacher = 0
        for i in range(n):
            t, c = divmod(i, 7)
            # undo the 38-assembly back to the network frame for comparison
            pos = list(order).index(c)
            if pos == 3:
                continue  # middle camera discarded by assembly
            side = slice(0, 19) if pos < 3 else slice(19, 38)
            got = np.asarray(p38[c, t, side])
            if pos > 3:
                got = got.copy()
                got[:, 1] = 1.0 - got[:, 1]
            # positions 2 and 4 have their stripe/antenna channels zeroed
            # by the assembly (reference core.py:193-195) — exclude them
            joints = slice(0, 15) if pos in (2, 4) else slice(0, 19)
            got = got[joints]
            if np.allclose(got, pts_t[i][joints], atol=1e-6) and not (
                np.allclose(pts_t[i][joints], pts_s[i][joints], atol=1e-6)
            ):
                from_teacher += 1
            else:
                assert np.allclose(
                    got, pts_s[i][joints], atol=1e-6
                ) or np.allclose(
                    got, pts_t[i][joints], atol=1e-6
                ), f"image {i} matches neither net"
        assert from_teacher >= 1  # the repair path actually fired
        # conf always comes from the student
        conf_got = np.asarray(conf).transpose(1, 0, 2, 3).reshape(n, 19, 1)
        # fused-program vs standalone-program XLA fusion jitter
        np.testing.assert_allclose(conf_got, conf_s, atol=1e-4)

    def test_loo_suspicion_blames_the_failing_camera(self, golden_3d):
        """A wrong argmax on ONE camera must rank that image — not an
        innocent frame-mate — at the top of the suspicion order.  Plain
        (non-LOO) residuals fail this: the corrupted joint reconstruction
        inflates every camera of the frame (ADVICE r3 finding)."""
        from deepfly3d_tpu.models.cascade import loo_suspicion

        calib = {
            c: golden_3d[c] for c in range(7)
        }
        R, tvec, intr, _ = geometry.calib_to_arrays(calib, 7, np.float32)
        p38 = np.array(golden_3d["points2d"], np.float32)  # (7, 15, 38, 2)

        for bad_cam, bad_t in [(0, 3), (1, 7), (5, 11)]:
            corrupted = p38.copy()
            # a one-heatmap-cell argmax flip on a handful of joints
            joints = np.nonzero(
                geometry.observation_mask(
                    jnp.asarray(corrupted[bad_cam, bad_t])[None]
                )[0]
            )[0][:4]
            corrupted[bad_cam, bad_t, joints, 0] += 10.0 / 64.0
            scores = np.asarray(loo_suspicion(
                jnp.asarray(corrupted), jnp.asarray(R), jnp.asarray(tvec),
                jnp.asarray(intr), (960, 480),
            ))
            flat_top = np.argmax(scores.T.reshape(-1))
            t_top, c_top = divmod(flat_top, 7)
            assert (c_top, t_top) == (bad_cam, bad_t), (
                f"corrupted ({bad_cam},{bad_t}) but top suspicion was "
                f"({c_top},{t_top})"
            )

    def test_static_cost_independent_of_data(self, tiny_setup):
        """Same jitted program for different inputs: the repair batch is a
        static top-R gather, so no retraces / data-dependent shapes."""
        student_spec, student_vars, teacher_spec, teacher_vars, calib = (
            tiny_setup
        )
        pipe = build_cascade_pipeline(
            student_vars, student_spec, teacher_vars, teacher_spec,
            calib, np.arange(7), CascadeConfig(repair_frac=0.1),
        )
        rng = np.random.default_rng(1)
        a = rng.integers(0, 255, size=(2, 7, 480, 960, 3), dtype=np.uint8)
        b = np.zeros((2, 7, 480, 960, 3), dtype=np.uint8)
        out_a = pipe(jnp.asarray(a))
        out_b = pipe(jnp.asarray(b))
        assert out_a[0].shape == out_b[0].shape
