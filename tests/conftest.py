"""Test configuration.

Tests run on the CPU backend with 8 virtual devices so multi-chip sharding
is exercised without TPU hardware (the driver separately dry-runs the
multi-chip path). Must set XLA flags before jax initializes.
"""

import os

# NOTE: this image pins JAX_PLATFORMS=axon via sitecustomize; the env var
# alone does not stick — the config update below is what actually forces CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache makes repeated test runs cheap
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pathlib
import pickle

import numpy as np
import pytest

TEST_DATA = pathlib.Path(__file__).parent / "data"
REFERENCE_IMAGES = TEST_DATA / "reference"
GOLDEN_DIR = TEST_DATA / "reference_df3d"
REPO_ROOT = pathlib.Path(__file__).parent.parent
CALIB_PRIOR = REPO_ROOT / "data" / "calib.pkl"
PROCRUSTES_TEMPLATE = REPO_ROOT / "data" / "df3d_result.pkl"

IMAGE_SHAPE = (960, 480)  # (width, height)


def _load(path):
    with open(path, "rb") as f:
        return pickle.load(f)


# Golden fixtures are FUNCTION-scoped on purpose: they return mutable
# dicts of numpy arrays, and several consumers (Core resume, pictorial
# correction, pyba-compat camera construction) touch nested values in
# place.  Session scope let one test's in-place edit poison a later
# test's expected values — observed as test_skip_estimation_resume_
# subprocess failing at 0.057 (BA run against a polluted seed) in-suite
# while passing standalone.  The pickle re-read costs ~ms per test.
@pytest.fixture()
def golden_2d():
    return _load(GOLDEN_DIR / "df3d_result_2d.pkl")


@pytest.fixture()
def golden_3d():
    return _load(GOLDEN_DIR / "df3d_result_3d.pkl")


@pytest.fixture()
def calib_prior():
    return _load(CALIB_PRIOR)


@pytest.fixture()
def template_points3d():
    return np.asarray(_load(PROCRUSTES_TEMPLATE)["points3d"])


# Module-scoped copies for expensive module fixtures (a full scipy BA,
# a CameraNetwork build).  Each module gets a fresh load, so cross-
# module pollution is impossible; sharing within one module is that
# module's own responsibility.
@pytest.fixture(scope="module")
def golden_2d_module():
    return _load(GOLDEN_DIR / "df3d_result_2d.pkl")


@pytest.fixture(scope="module")
def golden_3d_module():
    return _load(GOLDEN_DIR / "df3d_result_3d.pkl")


@pytest.fixture(scope="module")
def calib_prior_module():
    return _load(CALIB_PRIOR)


@pytest.fixture()
def working_images(tmp_path):
    """Fresh copy of the sample recording images."""
    import shutil

    work = tmp_path / "working"
    work.mkdir()
    for img in REFERENCE_IMAGES.glob("*.jpg"):
        shutil.copy(img, work)
    return str(work)


@pytest.fixture()
def working_videos(tmp_path):
    """Fresh copy of the sample recording videos."""
    import shutil

    work = tmp_path / "working"
    work.mkdir()
    for vid in REFERENCE_IMAGES.glob("*.mp4"):
        shutil.copy(vid, work)
    return str(work)
