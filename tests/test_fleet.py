"""Multi-recording fleet driver: one shared inference dispatch, sharded
over the virtual mesh, per-recording isolation, results matching the
single-recording Core pipeline."""

import os
import shutil

import jax
import numpy as np
import pytest

from deepfly3d_tpu.parallel import fleet
from deepfly3d_tpu.parallel import mesh as mesh_mod

WEIGHTS = os.path.join(os.getcwd(), "weights/hourglass_fly.npz")

pytestmark = pytest.mark.skipif(
    not os.path.exists(WEIGHTS), reason="trained weights not present"
)


@pytest.fixture
def two_recordings(tmp_path):
    src = os.path.join(os.getcwd(), "tests/data/reference")
    folders = []
    for name in ("flyA", "flyB"):
        dst = tmp_path / name / "images"
        shutil.copytree(src, dst)
        folders.append(str(dst))
    return folders


def test_fleet_two_recordings_sharded(two_recordings):
    mesh = mesh_mod.data_mesh(8) if len(jax.devices()) >= 8 else None
    results = fleet.process_recordings(
        two_recordings,
        checkpoint=WEIGHTS,
        mesh=mesh,
        num_images_max=2,
        solver="lm",
        camera_ordering=list(range(7)),
    )
    assert all(r.ok for r in results), [str(r.error) for r in results]
    # identical copies of the recording must produce identical results
    np.testing.assert_allclose(results[0].points2d, results[1].points2d)
    np.testing.assert_allclose(
        results[0].points3d, results[1].points3d, atol=1e-8
    )
    for r in results:
        assert r.points3d.shape == (2, 38, 3)
        assert os.path.exists(r.save_path)

    # fleet output matches the single-recording Core pipeline
    from deepfly3d_tpu.core import Core

    core = Core(two_recordings[0], None, 2, list(range(7)))
    core.pose2d_estimation(checkpoint=WEIGHTS)
    np.testing.assert_allclose(core.points2d, results[0].points2d, atol=1e-6)


def test_fleet_isolates_bad_recording(two_recordings, tmp_path):
    bad = str(tmp_path / "empty")
    os.makedirs(bad)
    results = fleet.process_recordings(
        [two_recordings[0], bad],
        checkpoint=WEIGHTS,
        num_images_max=1,
        solver="lm",
        camera_ordering=list(range(7)),
        save=False,
    )
    assert results[0].ok
    assert not results[1].ok and results[1].error is not None
