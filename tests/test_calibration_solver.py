"""CPU validation of the generalized score-head calibration solver
(scripts/calibrate_score_head.py fit_scores): block decomposition for
subpixel heads, golden-cell argmax repair, and the confidence band fit.

The real calibration runs against the deployed TPU program; this test
drives the same solver on a tiny synthetic problem in CPU jax, asserting
the three contract properties the TPU run relies on:

* every enforced winner ends up inside its allowed region (points
  repair actually lands);
* every channel's peak value lands within the confidence band of its
  target;
* free channels (no golden cell) keep a stable argmax.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

_SPEC = importlib.util.spec_from_file_location(
    "calibrate_score_head",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts", "calibrate_score_head.py",
    ),
)
calib = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(calib)


@pytest.mark.parametrize("u", [1, 2])
def test_fit_repairs_argmax_and_holds_band(u):
    rng = np.random.default_rng(0)
    N, Hc, Wc, F, K = 4, 6, 10, 4, 2
    B = u * u
    Hu, Wu = Hc * u, Wc * u
    feat = (rng.normal(size=(N, Hc, Wc, F)) ** 2).astype(np.float64)
    feat_dev = jnp.asarray(feat, jnp.float32)
    w0 = rng.normal(scale=0.1, size=(3, 3, F, K * B))
    b0 = rng.normal(scale=0.01, size=(K * B,))

    check = calib.make_device_check(feat_dev, u)

    def full(j, w, b):
        ch = [q * K + j for q in range(B)]
        return np.asarray(
            check(w[..., ch], b[ch]), np.float64
        ).reshape(N, -1)

    # joint 0: golden cells FAR from the current argmax (true repair);
    # joint 1: free channels (gold = -1)
    gold = np.full((N, K), -1, np.int64)
    targets = np.zeros((N, K))
    for j in range(K):
        h = full(j, w0, b0)
        cur = h.argmax(1)
        for n in range(N):
            if j == 0:
                r = min(Hu - 1, cur[n] // Wu + calib.WINNER_DR + 1)
                c = min(Wu - 1, cur[n] % Wu + calib.WINNER_DC + 2)
                gold[n, j] = r * Wu + c
            targets[n, j] = h[n].max() + rng.normal(scale=0.003)

    S = calib.compute_gram(feat_dev)
    w, b, linf = calib.fit_scores(
        check, feat, S, w0, b0, targets, gold, u, alpha=0.003
    )
    assert linf <= calib.BAND + 1e-6

    for j in range(K):
        h = full(j, w, b)
        am = h.argmax(1)
        for n in range(N):
            g = gold[n, j]
            if g >= 0:
                region = set(
                    calib.region_cells(int(g), Hu, Wu).tolist()
                )
                assert am[n] in region, (j, n)
            err = abs(h[n].max() - targets[n, j])
            assert err <= 0.002, (j, n, err)
