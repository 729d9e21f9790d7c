"""pyba-compatible CameraNetwork facade: golden-parity through the old API."""

import numpy as np
import pytest

from deepfly3d_tpu.compat import CameraNetwork, df3d_bones, df3d_colors


@pytest.fixture(scope="module")
def cam_net(golden_3d_module):
    # reference scaling (core.py:247)
    pts = golden_3d_module["points2d"] * [480, 960]
    return CameraNetwork(pts, calib=golden_3d_module)


def test_calib_harvested_from_result_dict(cam_net):
    assert cam_net.has_calibration()
    assert set(cam_net.summarize().keys()) == set(range(7))


def test_triangulate_golden(cam_net, golden_3d):
    pts3d = cam_net.triangulate()
    np.testing.assert_allclose(
        pts3d, golden_3d["points3d_wo_procrustes"], atol=1e-5
    )


def test_reprojection_error_scale(cam_net):
    err = cam_net.reprojection_error()
    assert 0.5 < err < 10.0


def test_bundle_adjust_from_prior(golden_2d, golden_3d, calib_prior):
    pts = golden_2d["points2d"] * [480, 960]
    net = CameraNetwork(pts, calib={int(k): v for k, v in calib_prior.items()
                                    if isinstance(k, (int, np.integer))})
    net.bundle_adjust(update_intrinsic=False, update_distort=False)
    for c in range(7):
        np.testing.assert_allclose(
            net.calib[c]["R"], golden_3d[c]["R"], atol=1e-4
        )
        np.testing.assert_allclose(
            net.calib[c]["tvec"], golden_3d[c]["tvec"], atol=1e-4
        )


def test_camera_accessors(cam_net, working_images):
    cam = cam_net[0]
    assert cam.points2d.shape == (15, 38, 2)
    assert cam[0].shape == (38, 2)
    assert not cam.is_empty()
    # camera 3 is all zeros in golden data
    assert cam_net[3].is_empty()


def test_skeleton_constants():
    assert df3d_bones.shape[1] == 2
    assert df3d_colors.shape == (38, 3)


def test_procrustes_seperate_reference_spelling(golden_3d):
    """The df3d-spelling shim defaults the template and matches golden."""
    import numpy as np
    from deepfly3d_tpu.compat import procrustes_seperate

    out = procrustes_seperate(np.asarray(golden_3d["points3d_wo_procrustes"]))
    np.testing.assert_allclose(np.asarray(out), golden_3d["points3d"], atol=1e-5)
