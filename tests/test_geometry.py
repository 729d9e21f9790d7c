"""Geometry golden-parity and round-trip tests.

Golden contract: triangulating the golden points2d with the golden (post-BA)
calibration must reproduce points3d_wo_procrustes at 1e-5 (the reference's
own acceptance tolerance, tests/test_df3d.py:221-226).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepfly3d_tpu.ops import geometry

IMAGE_SHAPE = (960, 480)


def _calib_arrays(result, n=7):
    return geometry.calib_to_arrays(
        {c: result[c] for c in range(n)}, num_cameras=n
    )


class TestRodrigues:
    def test_round_trip(self):
        rng = np.random.default_rng(0)
        for _ in range(20):
            rvec = jnp.asarray(rng.normal(size=3))
            R = geometry.rodrigues(rvec)
            rvec_back = geometry.inv_rodrigues(R)
            np.testing.assert_allclose(rvec, rvec_back, atol=1e-9)

    def test_identity(self):
        R = geometry.rodrigues(jnp.zeros(3))
        np.testing.assert_allclose(R, np.eye(3), atol=1e-12)
        np.testing.assert_allclose(
            geometry.inv_rodrigues(jnp.eye(3)), np.zeros(3), atol=1e-12
        )

    def test_orthonormal(self):
        rvec = jnp.asarray([0.3, -1.2, 2.2])
        R = geometry.rodrigues(rvec)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
        assert np.isclose(np.linalg.det(R), 1.0)

    def test_matches_golden_calib(self, golden_3d):
        # inv_rodrigues(R) -> rodrigues round-trips the real camera rotations
        for c in range(7):
            R = jnp.asarray(golden_3d[c]["R"])
            np.testing.assert_allclose(
                geometry.rodrigues(geometry.inv_rodrigues(R)), R, atol=1e-10
            )


class TestProjection:
    def test_project_triangulate_round_trip(self, golden_3d):
        """Synthetic 3D points project and triangulate back exactly."""
        R, tvec, intr, distort = _calib_arrays(golden_3d)
        rng = np.random.default_rng(1)
        pts = rng.normal(size=(4, 6, 3)) * 0.5  # near world origin
        p2 = jax.vmap(
            lambda R_, t_, K_, d_: geometry.project_normalized_rowcol(
                jnp.asarray(pts), R_, t_, K_, d_, IMAGE_SHAPE
            )
        )(jnp.asarray(R), jnp.asarray(tvec), jnp.asarray(intr), jnp.asarray(distort))
        back = geometry.triangulate(
            p2, jnp.asarray(R), jnp.asarray(tvec), jnp.asarray(intr), IMAGE_SHAPE
        )
        np.testing.assert_allclose(back, pts, atol=1e-8)

    def test_undistort_round_trip(self):
        """undistort_points inverts the full 5-coefficient model."""
        rng = np.random.default_rng(7)
        xy = jnp.asarray(rng.uniform(-0.3, 0.3, size=(50, 2)))
        dist = jnp.asarray([-0.2, 0.05, 1e-3, -2e-3, 0.01])
        back = geometry.undistort_points(geometry.distort_points(xy, dist), dist)
        np.testing.assert_allclose(back, xy, atol=1e-10)

    def test_distorted_triangulation_round_trip(self):
        """Synthetic distorted rig (k1 != 0): project with distortion,
        triangulate with the distortion-aware DLT, recover 3D at 1e-5
        (VERDICT r1 item 8 — H3.6M-style rigs have real lenses)."""
        rng = np.random.default_rng(11)
        C = 4
        K = np.tile(
            np.asarray([[1100.0, 0, 500], [0, 1100.0, 500], [0, 0, 1]]), (C, 1, 1)
        )
        dist = np.zeros((C, 5))
        dist[:, 0] = [-0.21, -0.19, -0.18, -0.22]   # strong barrel k1
        dist[:, 1] = 0.04                            # k2
        dist[:, 2:4] = 1e-3                          # tangential
        Rs, ts = [], []
        for c in range(C):
            Rs.append(np.asarray(
                geometry.rodrigues(jnp.asarray([0.0, c * np.pi / 2, 0.0]))
            ))
            ts.append(np.asarray([0.0, 0.0, 6.0]))
        R, tvec = np.stack(Rs), np.stack(ts)
        pts = rng.normal(size=(3, 8, 3)) * 0.4
        image_shape = (1000, 1000)
        p2 = jax.vmap(
            lambda R_, t_, K_, d_: geometry.project_normalized_rowcol(
                jnp.asarray(pts), R_, t_, K_, d_, image_shape
            )
        )(jnp.asarray(R), jnp.asarray(tvec), jnp.asarray(K), jnp.asarray(dist))
        # without undistortion the linear DLT is visibly biased ...
        biased = geometry.triangulate(
            p2, jnp.asarray(R), jnp.asarray(tvec), jnp.asarray(K), image_shape
        )
        assert np.abs(np.asarray(biased) - pts).max() > 1e-3
        # ... with it the round trip closes
        back = geometry.triangulate(
            p2, jnp.asarray(R), jnp.asarray(tvec), jnp.asarray(K), image_shape,
            distort=jnp.asarray(dist),
        )
        np.testing.assert_allclose(back, pts, atol=1e-5)

    def test_distortion_zero_is_identity(self):
        xy = jnp.asarray(np.random.default_rng(2).normal(size=(10, 2)))
        out = geometry.distort_points(xy, jnp.zeros(5))
        np.testing.assert_allclose(out, xy, atol=0)

    def test_distortion_radial(self):
        xy = jnp.asarray([[0.1, 0.2]])
        dist = jnp.asarray([0.1, 0.0, 0.0, 0.0, 0.0])
        r2 = 0.1**2 + 0.2**2
        np.testing.assert_allclose(
            geometry.distort_points(xy, dist),
            np.asarray([[0.1, 0.2]]) * (1 + 0.1 * r2),
            rtol=1e-12,
        )


class TestTriangulationGolden:
    def test_points3d_wo_procrustes(self, golden_3d):
        R, tvec, intr, _ = _calib_arrays(golden_3d)
        p3 = geometry.triangulate(
            jnp.asarray(golden_3d["points2d"]),
            jnp.asarray(R),
            jnp.asarray(tvec),
            jnp.asarray(intr),
            IMAGE_SHAPE,
        )
        np.testing.assert_allclose(
            p3, golden_3d["points3d_wo_procrustes"], atol=1e-5
        )

    def test_eigh_method_matches_svd(self, golden_3d):
        """method='eigh' (4x4 normal-matrix eigendecomposition, the cheap
        f32 production path used by bench.py) agrees with the full-precision
        SVD path well inside the fly's working volume (~2-3 mm scale)."""
        R, tvec, intr, _ = _calib_arrays(golden_3d)
        args = (
            jnp.asarray(golden_3d["points2d"]),
            jnp.asarray(R),
            jnp.asarray(tvec),
            jnp.asarray(intr),
            IMAGE_SHAPE,
        )
        p_svd = np.asarray(geometry.triangulate(*args, method="svd"))
        p_eig = np.asarray(geometry.triangulate(*args, method="eigh"))
        np.testing.assert_allclose(p_eig, p_svd, atol=1e-4)
        # closed-form inverse-power path (fastest production variant, used
        # by bench.py): iterating on the ORIGINAL A^T A through the
        # preconditioned factorization converges onto the svd solution —
        # measured max 9.2e-6 (f64) / 1.1e-5 (f32) on golden data
        p_nrm = np.asarray(geometry.triangulate(*args, method="normal"))
        np.testing.assert_allclose(p_nrm, p_svd, atol=5e-5)
        assert np.isfinite(p_nrm).all()

    def test_observation_mask(self, golden_3d):
        mask = np.asarray(
            geometry.observation_mask(jnp.asarray(golden_3d["points2d"]))
        )
        # camera 3 discarded entirely (reference core.py:190-191)
        assert not mask[3].any()
        # left-side cameras observe only left joints
        assert not mask[0, :, 19:].any()
        assert mask[0, :, :15].all()

    def test_reprojection_error_scale(self, golden_3d):
        R, tvec, intr, distort = _calib_arrays(golden_3d)
        err = geometry.reprojection_error(
            jnp.asarray(golden_3d["points3d_wo_procrustes"]),
            jnp.asarray(golden_3d["points2d"]),
            jnp.asarray(R),
            jnp.asarray(tvec),
            jnp.asarray(intr),
            jnp.asarray(distort),
            IMAGE_SHAPE,
        )
        # golden recording's post-BA residual is a few pixels
        assert 0.5 < float(err) < 10.0
