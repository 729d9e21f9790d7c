"""Trajectory filters.

The reference One-Euro filter is a Python object updated one sample at a
time inside a T x J x 3 triple loop (reference df3d/signal_util.py:31-100).
A One-Euro filter is two chained first-order IIR filters with time-varying
coefficients — each is the affine recurrence ``s_t = a_t * s_{t-1} + b_t``,
which composes associatively::

    (a2, b2) ∘ (a1, b1) = (a1*a2, a2*b1 + b2)

so the whole filter runs as two ``jax.lax.associative_scan`` passes: the
time axis parallelizes across VPU lanes and across devices (the SP analog of
this pipeline, SURVEY §2.4), instead of a sequential Python loop.

Numerical parity: timestamps are ``(i+1)*0.1`` with freq updated from float
timestamp differences, exactly like the reference (signal_util.py:94), so
outputs match the reference recursion bit-for-bit in float64.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_ONEEURO_3D = {"freq": 100.0, "mincutoff": 0.1, "beta": 2.0, "dcutoff": 1.0}
DEFAULT_ONEEURO_2D = {"freq": 100.0, "mincutoff": 0.0001, "beta": 30.0, "dcutoff": 1.0}


def _affine_scan(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve s_t = a_t * s_{t-1} + b_t (s_{-1} irrelevant: a_0 must be 0)."""

    def combine(left, right):
        a1, b1 = left
        a2, b2 = right
        return a1 * a2, a2 * b1 + b2

    _, s = jax.lax.associative_scan(combine, (a, b), axis=0)
    return s


def _alpha(cutoff: jnp.ndarray, freq: jnp.ndarray) -> jnp.ndarray:
    # alpha = 1 / (1 + tau/te), tau = 1/(2*pi*cutoff), te = 1/freq
    tau = 1.0 / (2.0 * math.pi * cutoff)
    return 1.0 / (1.0 + tau * freq)


def one_euro(
    x: jnp.ndarray,
    timestamps: jnp.ndarray,
    freq: float = 100.0,
    mincutoff: float = 0.1,
    beta: float = 2.0,
    dcutoff: float = 1.0,
) -> jnp.ndarray:
    """One-Euro filter along axis 0 of ``x`` (T, ...) via associative scans."""
    T = x.shape[0]
    dtype = x.dtype

    # Per-step sampling frequency. First step keeps the constructor freq
    # (reference: lasttime is None on the first call).
    dt = timestamps[1:] - timestamps[:-1]
    freq_t = jnp.concatenate(
        [jnp.asarray([freq], dtype=dtype), (1.0 / dt).astype(dtype)]
    )  # (T,)
    shape_t = (T,) + (1,) * (x.ndim - 1)
    freq_t = freq_t.reshape(shape_t)

    # Derivative signal: dx_t = (x_t - x_{t-1}) * freq_t, dx_0 = 0.
    dx = jnp.concatenate([jnp.zeros_like(x[:1]), (x[1:] - x[:-1])], axis=0) * freq_t
    dx = dx.at[0].set(0.0)

    # Scan 1: edx lowpass with alpha from dcutoff (first output = dx_0).
    a_d = _alpha(jnp.full_like(freq_t, dcutoff), freq_t)
    a1 = jnp.broadcast_to(1.0 - a_d, x.shape).at[0].set(0.0)
    b1 = jnp.broadcast_to(a_d, x.shape) * dx
    b1 = b1.at[0].set(dx[0])
    edx = _affine_scan(a1, b1)

    # Scan 2: x lowpass with cutoff driven by |edx| (first output = x_0).
    cutoff = mincutoff + beta * jnp.abs(edx)
    a_x = _alpha(cutoff, freq_t)
    a2 = (1.0 - a_x).at[0].set(0.0)
    b2 = a_x * x
    b2 = b2.at[0].set(x[0])
    return _affine_scan(a2, b2)


@partial(jax.jit, static_argnames=("freq", "mincutoff", "beta", "dcutoff"))
def _filter_batch_jit(pts, timestamps, freq, mincutoff, beta, dcutoff):
    return one_euro(
        pts, timestamps, freq=freq, mincutoff=mincutoff, beta=beta, dcutoff=dcutoff
    )


def filter_batch(
    pts: np.ndarray,
    filter_indices: Optional[Sequence[int]] = None,
    config_oneeuro: Optional[dict] = None,
    freq: Optional[float] = None,
) -> np.ndarray:
    """One-Euro-filter 3D trajectories (T, J, 3).

    Matches reference df3d/signal_util.py:69-100: timestamps are
    ``(i+1)*0.1`` seconds regardless of the recording fps, all joints
    filtered by default.
    """
    cfg = dict(DEFAULT_ONEEURO_3D if config_oneeuro is None else config_oneeuro)
    if freq is not None:
        cfg["freq"] = freq
    pts = np.asarray(pts)
    T = pts.shape[0]
    # reference timestamps: (i + 1) * 0.1 evaluated in float64
    ts = (np.arange(T, dtype=np.float64) + 1.0) * 0.1
    out = np.asarray(
        _filter_batch_jit(
            jnp.asarray(pts, dtype=jnp.float64),
            jnp.asarray(ts),
            cfg["freq"],
            cfg["mincutoff"],
            cfg["beta"],
            cfg["dcutoff"],
        )
    )
    if filter_indices is not None:
        keep = np.zeros(pts.shape[1], dtype=bool)
        keep[np.asarray(filter_indices)] = True
        out = np.where(keep[None, :, None], out, pts)
    return out


def filter_batch_2d(
    pts: np.ndarray,
    filter_indices: Optional[Sequence[int]] = None,
    config_oneeuro: Optional[dict] = None,
    freq: Optional[float] = None,
) -> np.ndarray:
    """One-Euro-filter 2D trajectories (T, J, 2) with timestamps ``i*0.1``."""
    cfg = dict(DEFAULT_ONEEURO_2D if config_oneeuro is None else config_oneeuro)
    if freq is not None:
        cfg["freq"] = freq
    pts = np.asarray(pts)
    T = pts.shape[0]
    ts = np.arange(T, dtype=np.float64) * 0.1
    out = np.asarray(
        _filter_batch_jit(
            jnp.asarray(pts, dtype=jnp.float64),
            jnp.asarray(ts),
            cfg["freq"],
            cfg["mincutoff"],
            cfg["beta"],
            cfg["dcutoff"],
        )
    )
    if filter_indices is not None:
        keep = np.zeros(pts.shape[1], dtype=bool)
        keep[np.asarray(filter_indices)] = True
        out = np.where(keep[None, :, None], out, pts)
    return out


# -------------------------------------------------- stateful API-parity shims


class LowPassFilter:
    """Stateful exponential filter (reference signal_util.py:5-28 contract)."""

    def __init__(self, alpha: float):
        self._set_alpha(alpha)
        self._y = self._s = None

    def _set_alpha(self, alpha: float):
        alpha = float(alpha)
        if not 0.0 < alpha <= 1.0:
            raise ValueError(f"alpha ({alpha}) should be in (0.0, 1.0]")
        self._alpha = alpha

    def __call__(self, value, timestamp=None, alpha=None):
        if alpha is not None:
            self._set_alpha(alpha)
        s = value if self._y is None else (
            self._alpha * value + (1.0 - self._alpha) * self._s
        )
        self._y = value
        self._s = s
        return s

    def lastValue(self):
        return self._y


class OneEuroFilter:
    """Stateful one-sample-at-a-time One-Euro filter.

    Same call contract as the reference class (signal_util.py:31-66); the
    batch path (`filter_batch`) uses the associative-scan formulation and
    matches this recursion exactly.
    """

    def __init__(self, freq, mincutoff=1.0, beta=0.0, dcutoff=1.0):
        if freq <= 0 or mincutoff <= 0 or dcutoff <= 0:
            raise ValueError("freq, mincutoff and dcutoff must be > 0")
        self._freq = float(freq)
        self._mincutoff = float(mincutoff)
        self._beta = float(beta)
        self._dcutoff = float(dcutoff)
        self._x = LowPassFilter(self._alpha_for(self._mincutoff))
        self._dx = LowPassFilter(self._alpha_for(self._dcutoff))
        self._lasttime = None

    def _alpha_for(self, cutoff):
        tau = 1.0 / (2 * math.pi * cutoff)
        te = 1.0 / self._freq
        return 1.0 / (1.0 + tau / te)

    def __call__(self, x, timestamp=None):
        if self._lasttime and timestamp:
            self._freq = 1.0 / (timestamp - self._lasttime)
        self._lasttime = timestamp
        prev_x = self._x.lastValue()
        dx = 0.0 if prev_x is None else (x - prev_x) * self._freq
        edx = self._dx(dx, timestamp, alpha=self._alpha_for(self._dcutoff))
        cutoff = self._mincutoff + self._beta * abs(edx)
        return self._x(x, timestamp, alpha=self._alpha_for(cutoff))


# ------------------------------------------------------- adaptive 2D smoother


def _gaussian_kernel(sigma: float, radius: int) -> np.ndarray:
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum()


def _effective_window_weights(sigma: float, window: int, center: int) -> np.ndarray:
    """Weights of gaussian_filter1d(mode='nearest') at the window center.

    scipy's nearest-mode correlation replicates segment endpoints; folding
    the out-of-range taps onto the clipped indices yields an exact
    fixed-weight dot product over the window.
    """
    radius = int(4.0 * sigma + 0.5)
    kern = _gaussian_kernel(sigma, radius)
    w = np.zeros(window, dtype=np.float64)
    for k in range(-radius, radius + 1):
        idx = min(max(center + k, 0), window - 1)
        w[idx] += kern[k + radius]
    return w


def smooth_pose2d(
    points2d: np.ndarray,
    window_size: int = 20,
    pad: int = 20,
    std_thr: float = 5.0,
    sigma_smooth: float = 7.0,
) -> np.ndarray:
    """Adaptive per-window gaussian smoothing of 2D tracks (T, J, 2).

    Behavior of reference df3d/signal_util.py:135-160 — per sliding window,
    smooth strongly (sigma=7) when the window std is below ``std_thr``,
    otherwise keep the raw value (the reference's sigma=0.1 kernel has radius
    0, i.e. identity) — but fully vectorized instead of a T x J x 2 loop.
    """
    points2d = np.asarray(points2d, dtype=np.float64)
    T = points2d.shape[0]
    padded = np.concatenate(
        [
            np.repeat(points2d[:1], pad, axis=0),
            points2d,
            np.repeat(points2d[-1:], pad, axis=0),
        ],
        axis=0,
    )
    half = window_size // 2
    # windows[t] = padded[t + pad - half : t + pad + half]  (length 20)
    idx = (np.arange(T)[:, None] + pad - half) + np.arange(window_size)[None, :]
    windows = padded[idx]  # (T, 20, J, 2)
    std = windows.std(axis=1)  # (T, J, 2) population std, as np.std
    w = _effective_window_weights(sigma_smooth, window_size, half)
    smoothed = np.einsum("twjd,w->tjd", windows, w)
    return np.where(std < std_thr, smoothed, points2d)
