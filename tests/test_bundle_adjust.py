"""Bundle-adjustment tests.

Parity solver must reproduce the golden post-BA calibration at 1e-4 (the
reference's acceptance tolerance, tests/test_df3d.py:234-244) and the golden
points3d chain at 1e-5.  The TPU-native LM solver is gauge-free, so it is
validated on reprojection error and gauge-invariant camera geometry.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from deepfly3d_tpu.ops import bundle_adjust, geometry, procrustes

IMAGE_SHAPE = (960, 480)


@pytest.fixture(scope="module")
def parity_result(golden_2d_module, calib_prior_module):
    calib_reordered = {
        cidx: calib_prior_module[idx]
        for idx, cidx in enumerate(golden_2d_module["camera_ordering"])
    }
    return bundle_adjust.bundle_adjust(
        golden_2d_module["points2d"], calib_reordered, IMAGE_SHAPE,
        solver="parity",
    )


class TestParitySolver:
    def test_calibration_golden(self, parity_result, golden_3d):
        for c in range(7):
            for key in ("R", "tvec", "intr", "distort"):
                np.testing.assert_allclose(
                    parity_result.calib[c][key],
                    golden_3d[c][key],
                    atol=1e-4,
                    err_msg=f"camera {c} {key}",
                )

    def test_points3d_golden_chain(self, parity_result, golden_3d, template_points3d):
        """Triangulation with refined calib reproduces golden points3d."""
        R, tvec, intr, _ = geometry.calib_to_arrays(parity_result.calib, 7)
        p3 = np.asarray(
            geometry.triangulate(
                jnp.asarray(golden_3d["points2d"]),
                jnp.asarray(R),
                jnp.asarray(tvec),
                jnp.asarray(intr),
                IMAGE_SHAPE,
            )
        )
        np.testing.assert_allclose(
            p3, golden_3d["points3d_wo_procrustes"], atol=1e-5
        )
        p3_proc = procrustes.procrustes_separate(p3, template_points3d)
        np.testing.assert_allclose(p3_proc, golden_3d["points3d"], atol=1e-5)

    def test_cost_decreases(self, parity_result):
        assert parity_result.cost_final < parity_result.cost_initial

    def test_camera3_untouched(self, parity_result, calib_prior):
        # the middle camera has no observations, its extrinsics must not move
        np.testing.assert_allclose(
            parity_result.calib[3]["R"], calib_prior[3]["R"], atol=1e-12
        )
        np.testing.assert_allclose(
            parity_result.calib[3]["tvec"], calib_prior[3]["tvec"], atol=1e-12
        )


class TestLMSolver:
    def test_converges_on_golden_problem(self, golden_2d, calib_prior, golden_3d):
        calib_reordered = {
            cidx: calib_prior[idx]
            for idx, cidx in enumerate(golden_2d["camera_ordering"])
        }
        res = bundle_adjust.bundle_adjust(
            golden_2d["points2d"], calib_reordered, IMAGE_SHAPE, solver="lm"
        )
        assert res.cost_final < res.cost_initial
        # reprojection RMS must reach the golden optimum's level (gauge-free
        # comparison): golden final cost is ~1.11e4 over 1590 observations
        R, tvec, intr, dist = geometry.calib_to_arrays(res.calib, 7)
        err = float(
            geometry.reprojection_error(
                jnp.asarray(res.points3d),
                jnp.asarray(golden_2d["points2d"]),
                jnp.asarray(R),
                jnp.asarray(tvec),
                jnp.asarray(intr),
                jnp.asarray(dist),
                IMAGE_SHAPE,
            )
        )
        # golden calibration's mean reprojection error is ~2.2 px
        R_g, t_g, K_g, d_g = geometry.calib_to_arrays(
            {c: golden_3d[c] for c in range(7)}, 7
        )
        err_golden = float(
            geometry.reprojection_error(
                jnp.asarray(golden_3d["points3d_wo_procrustes"]),
                jnp.asarray(golden_2d["points2d"]),
                jnp.asarray(R_g),
                jnp.asarray(t_g),
                jnp.asarray(K_g),
                jnp.asarray(d_g),
                IMAGE_SHAPE,
            )
        )
        assert err <= err_golden * 1.05

    def test_intrinsic_and_distortion_refinement(self):
        """update_intrinsic/update_distort (the mode the reference exposes
        but never enables, core.py:249): a prior with wrong focal lengths,
        principal points and distortion must be refined to reproject
        exactly on synthetic observations."""
        rng = np.random.default_rng(3)
        C, T, J = 4, 6, 8
        pts_true = rng.normal(size=(T, J, 3)) * 0.3
        W, H = 1000, 1000
        K_true = np.stack([
            np.asarray([[900.0 + 30 * c, 0, 480.0 + 5 * c],
                        [0, 880.0 + 25 * c, 510.0 - 4 * c],
                        [0, 0, 1]])
            for c in range(C)
        ])
        d_true = np.zeros((C, 5))
        d_true[:, 0] = -0.1
        d_true[:, 1] = 0.02
        calib_true, obs = {}, np.zeros((C, T, J, 2))
        import jax.numpy as jnp_

        for c in range(C):
            R = np.asarray(geometry.rodrigues(
                jnp_.asarray([0.05, np.pi / 2 * c, -0.03])))
            tvec = np.asarray([0.0, 0.0, 6.0]) + rng.normal(size=3) * 0.02
            calib_true[c] = {"R": R, "tvec": tvec, "intr": K_true[c],
                             "distort": d_true[c]}
            px = np.asarray(geometry.project(
                jnp_.asarray(pts_true.reshape(-1, 3)), jnp_.asarray(R),
                jnp_.asarray(tvec), jnp_.asarray(K_true[c]),
                jnp_.asarray(d_true[c]),
            )).reshape(T, J, 2)
            obs[c, ..., 0] = px[..., 1] / H
            obs[c, ..., 1] = px[..., 0] / W

        # corrupt the prior's intrinsics + distortion (extrinsics exact)
        prior = {}
        for c in range(C):
            K_bad = K_true[c].copy()
            K_bad[0, 0] *= 1.03
            K_bad[1, 1] *= 0.97
            K_bad[0, 2] += 6.0
            K_bad[1, 2] -= 5.0
            prior[c] = {
                "R": calib_true[c]["R"], "tvec": calib_true[c]["tvec"],
                "intr": K_bad, "distort": np.zeros(5),
            }
        res = bundle_adjust.bundle_adjust(
            obs, prior, (W, H), update_intrinsic=True, update_distort=True,
            solver="lm", max_iters=60,
        )
        assert res.cost_final < 1e-6 * res.cost_initial
        # refined reprojection is exact on the synthetic scene
        R_o, t_o, K_o, d_o = geometry.calib_to_arrays(res.calib, C)
        err = float(geometry.reprojection_error(
            jnp_.asarray(res.points3d), jnp_.asarray(obs), jnp_.asarray(R_o),
            jnp_.asarray(t_o), jnp_.asarray(K_o), jnp_.asarray(d_o), (W, H),
        ))
        assert err < 1e-4  # px

    def test_synthetic_exact_recovery(self):
        """Perfect synthetic observations -> LM drives cost to ~0."""
        rng = np.random.default_rng(0)
        C, N = 4, 50
        pts_true = rng.normal(size=(N, 3)) * 0.3
        K = np.tile(np.array([[800.0, 0, 320], [0, 800.0, 240], [0, 0, 1]]), (C, 1, 1))
        dist = np.zeros((C, 5))
        cams_true = []
        obs = np.zeros((C, N, 2))
        for c in range(C):
            rvec = rng.normal(size=3) * 0.1 + np.array([0, 0.4 * c, 0])
            tvec = np.array([0.0, 0.0, 8.0]) + rng.normal(size=3) * 0.05
            cams_true.append(np.concatenate([rvec, tvec]))
            R = np.asarray(geometry.rodrigues(jnp.asarray(rvec)))
            obs[c] = np.asarray(
                geometry.project(
                    jnp.asarray(pts_true), jnp.asarray(R), jnp.asarray(tvec),
                    jnp.asarray(K[c]), jnp.asarray(dist[c]),
                )
            )
        # perturb the prior
        cams0 = np.stack(cams_true) + rng.normal(size=(C, 6)) * 0.01
        pts0 = pts_true + rng.normal(size=(N, 3)) * 0.02
        cams, pts, cost0, cost, iters = bundle_adjust._lm_solve(
            jnp.asarray(cams0), jnp.asarray(pts0), jnp.asarray(K),
            jnp.asarray(dist), jnp.asarray(obs), jnp.ones((C, N)),
            max_iters=40,
        )
        assert float(cost) < 1e-10 * max(float(cost0), 1.0)


class TestHuberRobustLM:
    """huber_px robustification (IRLS in the Schur-complement LM): gross
    2D outliers stop dragging the solution, inliers keep least-squares
    efficiency.  The reference's optimizer has no robust loss — this is
    a TPU-native extra, exposed as bundle_adjust(huber_px=) and CLI
    --ba-huber-px."""

    def _problem(self, outlier_frac=0.1, seed=0):
        rng = np.random.default_rng(seed)
        C, N = 4, 80
        pts_true = rng.normal(size=(N, 3)) * 0.3
        K = np.tile(
            np.array([[800.0, 0, 320], [0, 800.0, 240], [0, 0, 1]]),
            (C, 1, 1),
        )
        dist = np.zeros((C, 5))
        cams_true, obs = [], np.zeros((C, N, 2))
        for c in range(C):
            rvec = rng.normal(size=3) * 0.1 + np.array([0, 0.4 * c, 0])
            tvec = np.array([0.0, 0.0, 8.0]) + rng.normal(size=3) * 0.05
            cams_true.append(np.concatenate([rvec, tvec]))
            R = np.asarray(geometry.rodrigues(jnp.asarray(rvec)))
            obs[c] = np.asarray(geometry.project(
                jnp.asarray(pts_true), jnp.asarray(R), jnp.asarray(tvec),
                jnp.asarray(K[c]), jnp.asarray(dist[c]),
            ))
        obs += rng.normal(size=obs.shape) * 0.5          # ~0.5 px inliers
        n_out = int(outlier_frac * C * N)
        oc = rng.integers(0, C, n_out)
        on = rng.integers(0, N, n_out)
        obs[oc, on] += rng.normal(size=(n_out, 2)) * 80  # gross outliers
        cams0 = np.stack(cams_true) + rng.normal(size=(C, 6)) * 0.01
        pts0 = pts_true + rng.normal(size=(N, 3)) * 0.02
        return cams_true, pts_true, cams0, pts0, K, dist, obs

    def _solve(self, prob, huber):
        cams_true, pts_true, cams0, pts0, K, dist, obs = prob
        C, N = obs.shape[:2]
        cams, pts, cost0, cost, iters = bundle_adjust._lm_solve(
            jnp.asarray(cams0), jnp.asarray(pts0), jnp.asarray(K),
            jnp.asarray(dist), jnp.asarray(obs), jnp.ones((C, N)),
            max_iters=60, huber_delta=huber,
        )
        # camera-parameter error vs truth (rvec+tvec stacked)
        return float(np.abs(np.asarray(cams) - np.stack(cams_true)).max())

    def test_outliers_corrupt_plain_lm_but_not_huber(self):
        prob = self._problem()
        err_plain = self._solve(prob, 0.0)
        err_huber = self._solve(prob, 2.0)
        # plain LS is dragged by the 80px outliers; Huber stays near truth
        # (the absolute bound is loose: the solve has a global gauge
        # freedom, so parameter-space distance to truth is approximate)
        assert err_huber < err_plain / 3, (err_plain, err_huber)
        assert err_huber < 0.08, err_huber

    def test_huber_matches_plain_on_clean_data(self):
        prob = self._problem(outlier_frac=0.0)
        err_plain = self._solve(prob, 0.0)
        err_huber = self._solve(prob, 5.0)
        assert abs(err_huber - err_plain) < 5e-3, (err_plain, err_huber)
