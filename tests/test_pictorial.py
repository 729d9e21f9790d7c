"""Pictorial-structures MAP correction: synthetic outlier-recovery tests.

No golden data exists for this capability (the reference only retains the
hyperparameter hooks, SURVEY §5.9), so the tests are constructive: build a
synthetic 3-camera rig and a known 3D leg chain, inject a grossly wrong
top-1 candidate for one joint, and verify the chain MAP picks the
geometrically + kinematically consistent candidate instead.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from deepfly3d_tpu.ops import geometry, pictorial


@pytest.fixture(scope="module")
def rig():
    rng = np.random.default_rng(0)
    n_cams = 3
    K = np.array([[900.0, 0, 320], [0, 900.0, 240], [0, 0, 1]])
    Ps, Rs, ts = [], [], []
    for c in range(n_cams):
        rvec = jnp.asarray([0.0, 0.5 * (c - 1), 0.0])
        R = np.asarray(geometry.rodrigues(rvec))
        t = np.array([0.0, 0.0, 10.0])
        Ps.append(K @ np.hstack([R, t[:, None]]))
        Rs.append(R)
        ts.append(t)
    return np.array(Ps), K


def _project(P, X):
    h = P[:, :3] @ X.T + P[:, 3:]
    return (h[:2] / h[2]).T


def test_viterbi_chain_exact():
    unary = jnp.asarray([[0.0, 1.0], [5.0, 0.0], [0.0, 2.0]])
    # transitions: forbid (1 -> 0) on the first edge
    pairwise = jnp.asarray(
        [[[0.0, 0.0], [-100.0, 0.0]], [[0.0, 0.0], [0.0, 0.0]]]
    )
    idx, score = pictorial._chain_viterbi(unary, pairwise)
    assert list(np.asarray(idx)) == [0, 0, 1]
    assert float(score) == pytest.approx(0.0 + 5.0 + 2.0)


def test_outlier_candidate_corrected(rig):
    Ps, K = rig
    rng = np.random.default_rng(1)
    n_cams, L, K_cand = 3, 5, 4

    # ground-truth leg chain: consecutive segments of length ~0.5
    chain = np.cumsum(
        np.concatenate(
            [np.zeros((1, 3)), rng.normal(size=(L - 1, 3)) * 0.1 + 0.3], axis=0
        ),
        axis=0,
    )

    cand2d = np.zeros((n_cams, L, K_cand, 2))
    scores = np.zeros((n_cams, L, K_cand))
    for c in range(n_cams):
        true_px = _project(Ps[c], chain)
        for l in range(L):
            cand2d[c, l, 0] = true_px[l]
            scores[c, l, 0] = 1.0
            for k in range(1, K_cand):
                cand2d[c, l, k] = true_px[l] + rng.normal(size=2) * 40
                scores[c, l, k] = 0.3
    # corrupt camera 0's TOP candidate for joint 2: swap true into slot 1
    cand2d[0, 2, 1] = cand2d[0, 2, 0]
    scores[0, 2, 1] = 0.9
    cand2d[0, 2, 0] = cand2d[0, 2, 0] + np.array([150.0, -120.0])
    scores[0, 2, 0] = 1.0

    seg = np.linalg.norm(np.diff(chain, axis=0), axis=-1)
    pts = pictorial.correct_legs_map(
        jnp.asarray(cand2d[:, None]),          # add time axis
        jnp.asarray(scores[:, None]),
        jnp.asarray(Ps),
        jnp.asarray(seg),                      # exact priors
        jnp.asarray(seg * 0 + 0.05),
        pictorial.PictorialParams(num_peak=K_cand, upper_bound=64),
        legs=1,
        leg_len=5,
    )[0]
    err = np.linalg.norm(pts - chain, axis=-1)
    assert err.max() < 0.05, f"MAP failed to recover the chain: {err}"


def test_top_k_peaks_shapes():
    hm = np.zeros((2, 8, 16, 3), dtype=np.float32)
    hm[0, 3, 10, 1] = 2.0
    coords, scores = pictorial.top_k_peaks(jnp.asarray(hm), k=4)
    assert coords.shape == (2, 3, 4, 2)
    assert scores.shape == (2, 3, 4)
    assert float(scores[0, 1, 0]) == 2.0
    np.testing.assert_allclose(np.asarray(coords[0, 1, 0]), [3 / 8, 10 / 16])
