"""Procrustes golden parity: procrustes(points3d_wo_procrustes) == points3d."""

import numpy as np

from deepfly3d_tpu.ops import procrustes


def test_golden_procrustes(golden_3d, template_points3d):
    out = procrustes.procrustes_separate(
        golden_3d["points3d_wo_procrustes"], template_points3d
    )
    np.testing.assert_allclose(out, golden_3d["points3d"], atol=1e-5)


def test_template_loader(template_points3d):
    assert template_points3d.shape == (15, 38, 3)


def test_rotate_points3d_involution_axes():
    pts = np.random.default_rng(0).normal(size=(4, 38, 3))
    rot = procrustes.rotate_points3d(pts)
    np.testing.assert_allclose(rot[..., 0], pts[..., 0])
    np.testing.assert_allclose(rot[..., 1], -pts[..., 2])
    np.testing.assert_allclose(rot[..., 2], -pts[..., 1])


def test_normalize_median_centers():
    pts = np.random.default_rng(1).normal(size=(6, 38, 3)) + 5.0
    out = procrustes.normalize_pose_3d(pts)
    np.testing.assert_allclose(
        np.median(out.reshape(-1, 3), axis=0), np.zeros(3), atol=1e-12
    )
    # input not mutated
    assert pts.flatten()[0] != out.flatten()[0] or pts.mean() > 1.0
