"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepfly3d_tpu.models.hourglass import HourglassSpec
from deepfly3d_tpu.parallel import mesh as mesh_mod
from deepfly3d_tpu.parallel import pipeline
from deepfly3d_tpu.ops import geometry

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_mesh_has_8_devices():
    mesh = mesh_mod.data_mesh(8)
    assert mesh.devices.size == 8


def test_sharded_train_step_runs():
    mesh = mesh_mod.data_mesh(8)
    spec = HourglassSpec(num_stacks=2, features=16, depth=2, num_classes=19)
    with mesh:
        init_fn, step_fn = pipeline.make_sharded_train_step(spec, mesh)
        params, stats, opt = init_fn(jax.random.PRNGKey(0), (32, 64))
        images = mesh_mod.shard_batch(mesh, jnp.zeros((8, 32, 64, 3), jnp.float32))
        targets = mesh_mod.shard_batch(mesh, jnp.zeros((8, 8, 16, 19), jnp.float32))
        params, stats, opt, loss = step_fn(params, stats, opt, images, targets)
        params, stats, opt, loss2 = step_fn(params, stats, opt, images, targets)
    assert np.isfinite(float(loss)) and np.isfinite(float(loss2))
    assert float(loss2) <= float(loss)  # zero-target loss must not increase


def test_sharded_triangulate_matches_single_device(golden_3d):
    mesh = mesh_mod.data_mesh(8)
    R, tvec, intr, _ = geometry.calib_to_arrays(
        {c: golden_3d[c] for c in range(7)}, 7
    )
    # pad T=15 -> 16 so the frame axis splits evenly over 8 devices
    p2 = np.concatenate(
        [golden_3d["points2d"], golden_3d["points2d"][:, :1]], axis=1
    )
    with mesh:
        tri = pipeline.make_sharded_triangulate(mesh, (960, 480))
        out = tri(
            jnp.asarray(p2), jnp.asarray(R), jnp.asarray(tvec), jnp.asarray(intr)
        )
    np.testing.assert_allclose(
        np.asarray(out)[:15], golden_3d["points3d_wo_procrustes"], atol=1e-5
    )


def test_sharded_infer_matches_single_device(working_images):
    """The sample recording, image axis sharded over 8 devices, must decode
    the same keypoints as the single-device path (SURVEY §4: multi-chip run
    asserts identical results)."""
    import cv2
    import os
    from deepfly3d_tpu.models import inference as inf_mod
    from deepfly3d_tpu.models.hourglass import init_params

    spec = HourglassSpec(num_stacks=1, features=16, depth=2, num_classes=19)
    variables = init_params(spec, (64, 128), jax.random.PRNGKey(0))

    paths = [
        os.path.join(working_images, f"camera_{c}_img_{i}.jpg")
        for c in range(7) for i in range(2)
    ]
    images = np.stack([
        cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB) for p in paths
    ])
    flip = np.asarray([c >= 4 for c in range(7) for _ in range(2)])
    # pad 14 -> 16 so the image axis splits evenly over 8 devices
    images = np.concatenate([images, images[:2]])
    flip = np.concatenate([flip, flip[:2]])

    mesh = mesh_mod.data_mesh(8)
    with mesh:
        infer = pipeline.make_sharded_infer(spec, mesh, (64, 128))
        pts_sharded, conf_sharded = infer(
            variables, jnp.asarray(images), jnp.asarray(flip)
        )

    pts_single, conf_single = inf_mod.infer_batch(
        variables, jnp.asarray(images), jnp.asarray(flip), spec, (64, 128)
    )
    np.testing.assert_allclose(
        np.asarray(pts_sharded), np.asarray(pts_single), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(conf_sharded), np.asarray(conf_single), atol=1e-5
    )


def test_batched_calibration_vmapped():
    """Two identical synthetic recordings calibrate in one vmapped program."""
    rng = np.random.default_rng(0)
    C, N = 3, 30
    pts = rng.normal(size=(N, 3)) * 0.3
    K = np.tile(np.array([[700.0, 0, 320], [0, 700.0, 240], [0, 0, 1]]), (C, 1, 1))
    dist = np.zeros((C, 5))
    cams_true, obs = [], np.zeros((C, N, 2))
    for c in range(C):
        rvec = np.array([0.05, 0.4 * c, 0.0])
        tvec = np.array([0.0, 0.0, 9.0])
        cams_true.append(np.concatenate([rvec, tvec]))
        R = np.asarray(geometry.rodrigues(jnp.asarray(rvec)))
        obs[c] = np.asarray(
            geometry.project(
                jnp.asarray(pts), jnp.asarray(R), jnp.asarray(tvec),
                jnp.asarray(K[c]), jnp.asarray(dist[c]),
            )
        )
    cams0 = np.stack(cams_true) + 0.005
    pts0 = pts + 0.01

    B = 2
    batch = lambda x: jnp.asarray(np.stack([x] * B))
    calibrate = pipeline.make_batched_calibration((640, 480), max_iters=25)
    cams, out_pts, cost0, cost, iters = calibrate(
        batch(cams0), batch(pts0), batch(K), batch(dist),
        batch(obs), jnp.ones((B, C, N)),
    )
    assert cams.shape == (B, C, 6)
    for b in range(B):
        assert float(cost[b]) < 1e-9 * max(float(cost0[b]), 1.0)


def test_graft_entry_dryrun():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_graft_entry_single():
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    pts, conf = jax.jit(fn)(*args)
    assert pts.shape == (8, 19, 2)
    assert conf.shape == (8, 19, 1)
