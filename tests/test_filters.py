"""Filter parity tests.

The associative-scan One-Euro must match a direct transcription of the
reference recursion (df3d/signal_util.py:31-100) sample for sample.
"""

import math

import numpy as np

from deepfly3d_tpu.ops import filters


def _one_euro_reference(x, timestamps, freq, mincutoff, beta, dcutoff):
    """Straightforward sequential recursion (oracle for the scan version)."""

    def alpha(cutoff, f):
        tau = 1.0 / (2 * math.pi * cutoff)
        te = 1.0 / f
        return 1.0 / (1.0 + tau / te)

    out = np.zeros_like(x)
    s_x = s_dx = None
    prev_raw = None
    last_t = None
    f = freq
    for i, (xi, ti) in enumerate(zip(x, timestamps)):
        if last_t is not None and ti is not None:
            f = 1.0 / (ti - last_t)
        last_t = ti
        dx = 0.0 if prev_raw is None else (xi - prev_raw) * f
        a_d = alpha(dcutoff, f)
        s_dx = dx if s_dx is None else a_d * dx + (1 - a_d) * s_dx
        cutoff = mincutoff + beta * abs(s_dx)
        a_x = alpha(cutoff, f)
        s_x = xi if s_x is None else a_x * xi + (1 - a_x) * s_x
        prev_raw = xi
        out[i] = s_x
    return out


def test_one_euro_matches_reference_recursion():
    rng = np.random.default_rng(0)
    T = 50
    x = np.cumsum(rng.normal(size=T)) + rng.normal(size=T) * 0.1
    ts = (np.arange(T, dtype=np.float64) + 1.0) * 0.1
    want = _one_euro_reference(x, ts, 100.0, 0.1, 2.0, 1.0)
    got = filters.filter_batch(x[:, None, None].repeat(3, axis=2))[:, 0, 0]
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_filter_batch_shape_and_smoothness():
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(30, 38, 3)).cumsum(axis=0)
    out = filters.filter_batch(pts)
    assert out.shape == pts.shape
    # first sample passes through unfiltered
    np.testing.assert_allclose(out[0], pts[0], atol=1e-12)
    # filtering reduces frame-to-frame jitter
    assert np.abs(np.diff(out, axis=0)).mean() < np.abs(np.diff(pts, axis=0)).mean()


def test_filter_indices_passthrough():
    rng = np.random.default_rng(2)
    pts = rng.normal(size=(20, 38, 3)).cumsum(axis=0)
    out = filters.filter_batch(pts, filter_indices=[0, 1])
    np.testing.assert_allclose(out[:, 2:], pts[:, 2:], atol=0)
    assert not np.allclose(out[1:, 0], pts[1:, 0])


def test_smooth_pose2d_matches_scipy_loop():
    """Vectorized smoother equals the reference's per-window scipy loop."""
    from scipy.ndimage import gaussian_filter1d

    rng = np.random.default_rng(3)
    T, J = 25, 4
    # low-variance tracks (std < 5 triggers smoothing) plus one jumpy joint
    pts = rng.normal(size=(T, J, 2)) * 1.0
    pts[:, -1] += np.linspace(0, 300, T)[:, None]

    window, pad = 20, 20
    padded = np.concatenate(
        [np.repeat(pts[:1], pad, 0), pts, np.repeat(pts[-1:], pad, 0)], axis=0
    )
    want = pts.copy()
    for t in range(pad, T + pad):
        for j in range(J):
            for d in range(2):
                seg = padded[t - window // 2 : t + window // 2, j, d]
                sigma = 7 if np.std(seg) < 5 else 0.1
                want[t - pad, j, d] = gaussian_filter1d(
                    seg, sigma=sigma, mode="nearest"
                )[window // 2]

    got = filters.smooth_pose2d(pts)
    np.testing.assert_allclose(got, want, atol=1e-10)
