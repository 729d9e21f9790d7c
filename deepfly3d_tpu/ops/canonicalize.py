"""Rig registration: canonicalize camera frames against the calibration
session before inference.

Why this is a *geometry* requirement, not a robustness trick: everything
downstream is anchored to the calibration session — the bundle-adjust
prior holds the cameras' extrinsics as they were THEN (reference
df3d/core.py:234-241 re-keys data/calib.pkl per recording), and the
shipped detector is fit to that session's appearance (README "Weights
provenance").  If a camera has drifted by a couple of pixels or the
illumination has changed by a few percent since calibration, feeding the
drifted pixels to the calib-time camera model yields *wrong 3D* even if
the 2D detector were perfect.  The production-correct treatment for a
fixed-rig capture system is to register incoming frames back to the
calibration-time reference — exactly what this module does:

* **integer translation** per camera (search ±8 px both axes), estimated
  separably: the batch-averaged frame is projected onto its row profile
  (mean over columns) and column profile (mean over rows), and each 1D
  profile is circularly cross-correlated against the rig template's
  zero-mean profile over the ±radius window.  For an integer circular
  shift the projections shift exactly with the image (a column roll
  leaves the row profile untouched and vice versa), so the two 1D
  argmaxes recover the 2D shift exactly — while costing only
  C·(2R+1)·(H+W) MACs, no FFT (the axon TPU backend's FFT is
  UNIMPLEMENTED at frame shapes) and no complex dtypes.  Averaging over
  the batch cancels the moving animal (measured: per-frame estimates
  scatter several px on clean input; the batch-level estimate is exact
  from ~8 frames up, and on the full calibration recording the profile
  correlation peaks at the autocorrelation maximum, i.e. exactly (0, 0)
  — canonicalization is then the bit-exact identity and golden parity
  is untouched, tests/test_canonicalize.py).
* **global gain** per camera (exposure/illumination), estimated as the
  batch-mean intensity ratio vs the template, with a dead zone
  (default ±1.5%) inside which no correction is applied: the rig's
  normal frame-to-frame variation, JPEG recompression, and the video
  re-encode path all measure ≤0.5% batch-level deviation, so they pass
  through untouched (bit-identical), while genuine exposure drift
  (≥2%) is corrected.

The decoded 2D points are emitted in the coordinates of the *provided*
frames (canonical keypoints + the estimated offset — see
``adjust_points38``), while triangulation consumes the *canonical*
points, because the calib-time extrinsics are only valid in the
calibration-time pixel frame.

The rig template (per-camera intensity profiles + mean intensity) is
captured
from the calibration recording by ``scripts/make_rig_template.py`` and
ships next to the weights (``weights/rig_template_fly.npz``).  The
held-out probe gate (bench.load_probe_frames) measures this module's
effect: the shift±2px and gain±5% probes are the drift axes the
recording-fit checkpoints are brittle to (weights/*.envelope.json).
"""

from __future__ import annotations

import os
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

SEARCH_RADIUS = 8          # ± pixels searched, both axes (static bound)
GAIN_DEAD_ZONE = 0.015     # |gain-1| below this -> identity (no correction)
MIN_EST_FRAMES = 8         # host ingest skips registration below this
                           # (measured: batch-level estimates are exact
                           # from 8 frames on the calibration recording)


class RigTemplate(NamedTuple):
    """Calibration-session reference statistics, one row per camera.

    row_profile: (C, H) f32 — frame/column/channel-mean intensity per row
    col_profile: (C, W) f32 — frame/row/channel-mean intensity per column
    mean:        (C,)   f32 — mean intensity
    """

    row_profile: np.ndarray
    col_profile: np.ndarray
    mean: np.ndarray

    @property
    def num_cameras(self) -> int:
        return self.row_profile.shape[0]

    @property
    def image_hw(self) -> Tuple[int, int]:
        return self.row_profile.shape[1], self.col_profile.shape[1]


def build_template(frames: np.ndarray) -> RigTemplate:
    """(C, T, H, W, 3) uint8 calibration frames -> RigTemplate."""
    f = frames.astype(np.float64)
    return RigTemplate(
        row_profile=f.mean(axis=(1, 3, 4)).astype(np.float32),
        col_profile=f.mean(axis=(1, 2, 4)).astype(np.float32),
        mean=f.reshape(f.shape[0], -1).mean(axis=1).astype(np.float32),
    )


def save_template(path: str, tpl: RigTemplate, source: str = "") -> None:
    np.savez(
        path,
        row_profile=tpl.row_profile.astype(np.float32),
        col_profile=tpl.col_profile.astype(np.float32),
        mean=tpl.mean.astype(np.float32),
        source=np.str_(source),
    )


def load_template(path: str) -> RigTemplate:
    z = np.load(path)
    return RigTemplate(
        row_profile=np.asarray(z["row_profile"], np.float32),
        col_profile=np.asarray(z["col_profile"], np.float32),
        mean=np.asarray(z["mean"], np.float32),
    )


def find_template(checkpoint_path: str) -> Optional[str]:
    """Auto-discovery used by the CLI/PoseEstimator: a ``.rig.npz``
    sidecar of the checkpoint, else ``rig_template_fly.npz`` in the
    checkpoint's directory (the rig is a property of the capture setup,
    not of the individual checkpoint)."""
    sidecar = checkpoint_path + ".rig.npz"
    if os.path.exists(sidecar):
        return sidecar
    shared = os.path.join(
        os.path.dirname(os.path.abspath(checkpoint_path)),
        "rig_template_fly.npz",
    )
    if os.path.exists(shared):
        return shared
    return None


class TemplateArrays(NamedTuple):
    """Device-ready template: zero-mean intensity profiles + means."""

    row_zm: jnp.ndarray          # (C, H) f32, zero-mean per camera
    col_zm: jnp.ndarray          # (C, W) f32, zero-mean per camera
    mean: jnp.ndarray            # (C,)
    image_hw: Tuple[int, int]
    radius: int
    gain_dead_zone: float


def prepare(tpl: RigTemplate, radius: int = SEARCH_RADIUS,
            gain_dead_zone: float = GAIN_DEAD_ZONE) -> TemplateArrays:
    return TemplateArrays(
        row_zm=jnp.asarray(_zero_mean(tpl.row_profile), jnp.float32),
        col_zm=jnp.asarray(_zero_mean(tpl.col_profile), jnp.float32),
        mean=jnp.asarray(tpl.mean, jnp.float32),
        image_hw=tpl.image_hw,
        radius=radius,
        gain_dead_zone=gain_dead_zone,
    )


def _zero_mean(profile: np.ndarray) -> np.ndarray:
    return profile - profile.mean(axis=-1, keepdims=True)


def _corr1d_argmax(p, q_zm, radius: int):
    """Circular 1D cross-correlation argmax over the ±radius window.

    p, q_zm: (C, L) profiles, the template side zero-mean.  Returns the
    per-camera integer offset k in [-radius, radius] maximizing
    corr[k] = sum_i p[i] · q_zm[(i - k) mod L] — the peak sits at the
    applied circular shift; a constant offset of p contributes nothing
    (q_zm sums to zero) and gain scaling leaves the argmax unchanged
    (it scales every candidate equally).  (2R+1) shifted template rows
    are gathered and the correlation is one small batched dot — no FFT
    (UNIMPLEMENTED on the axon TPU backend at frame shapes), no complex
    dtypes.
    """
    L = p.shape[-1]
    offs = jnp.arange(-radius, radius + 1)
    idx = (jnp.arange(L)[None, :] - offs[:, None]) % L   # (2R+1, L)
    qs = q_zm[:, idx]                                    # (C, 2R+1, L)
    corr = jnp.einsum("cl,ckl->ck", p, qs)
    return offs[corr.argmax(axis=1)].astype(jnp.int32)


def estimate_tc(frames_tc: jnp.ndarray, ta: TemplateArrays
                ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(T, C, H, W, 3) uint8 -> (dy (C,), dx (C,), gain (C,)).

    Batch-level per-camera estimates (see module docstring).  Pure JAX,
    jit-safe: one reduction over the batch, two 1D profile correlations
    per camera (_corr1d_argmax) — negligible against the conv trunk.

    For an integer circular shift the row profile shifts by dy exactly
    (the column roll is invisible to a full-row mean) and the column
    profile by dx, so the two 1D argmaxes recover the 2D shift exactly.
    """
    f = frames_tc.astype(jnp.float32)
    p = f.mean(axis=(0, 4))                             # (C, H, W)
    mean = p.mean(axis=(1, 2))                          # (C,)
    dy = _corr1d_argmax(p.mean(axis=2), ta.row_zm, ta.radius)
    dx = _corr1d_argmax(p.mean(axis=1), ta.col_zm, ta.radius)
    gain = mean / ta.mean
    gain = jnp.where(jnp.abs(gain - 1.0) <= ta.gain_dead_zone, 1.0, gain)
    return dy, dx, gain


def apply_shift_tc(frames_tc: jnp.ndarray, dy: jnp.ndarray, dx: jnp.ndarray
                   ) -> jnp.ndarray:
    """Undo a per-camera (dy, dx) translation: (T, C, H, W, 3) uint8 ->
    same, rolled by (-dy, -dx) per camera (two cheap integer gathers).

    With (dy, dx) = 0 the gathers are identity permutations — bit-exact
    passthrough on un-drifted input.
    """
    T, C, H, W, _ = frames_tc.shape
    ridx = (jnp.arange(H)[None, :] + dy[:, None]) % H        # (C, H)
    cidx = (jnp.arange(W)[None, :] + dx[:, None]) % W        # (C, W)
    x = jnp.take_along_axis(frames_tc, ridx[None, :, :, None, None], axis=2)
    return jnp.take_along_axis(x, cidx[None, :, None, :, None], axis=3)


def gain_correction(gain: jnp.ndarray, dtype) -> jnp.ndarray:
    """(C,) gain -> (C,) multiplicative correction in ``dtype``; exactly
    1 where the dead zone snapped the gain (multiplying by one is exact
    in every float format, preserving bit-parity on clean input)."""
    return jnp.where(gain == 1.0, 1.0, 1.0 / gain).astype(dtype)


def adjust_points38(p38: jnp.ndarray, dy: jnp.ndarray, dx: jnp.ndarray,
                    image_hw: Tuple[int, int]) -> jnp.ndarray:
    """Emit canonical points in the coordinates of the provided frames.

    p38: (C, T, 38, 2) normalized (row, col) in the canonical frame.
    The true keypoint in the drifted input sits at canonical + (dy/H,
    dx/W).  Entries carrying the reference's "unobserved" encodings —
    exact zeros and the flip artifact col=1.0 (reference
    core.py:198-200) — are structural constants, not observations, and
    stay untouched (geometry.observation_mask's convention).
    """
    from deepfly3d_tpu.ops import geometry

    H, W = image_hw
    off = jnp.stack(
        [dy.astype(jnp.float32) / H, dx.astype(jnp.float32) / W], axis=-1
    )                                                   # (C, 2)
    vis = geometry.observation_mask(p38)                # (C, T, 38)
    return p38 + vis[..., None] * off[:, None, None, :]


# ---------------------------------------------------------------------------
# Host-side helpers for the folder/video ingest paths (models/inference.py):
# estimation happens once per recording (numpy), application per batch.


def _corr1d_argmax_np(p: np.ndarray, q_zm: np.ndarray, radius: int) -> int:
    """Host twin of _corr1d_argmax for ONE camera: p, q_zm (L,)."""
    L = p.shape[-1]
    offs = np.arange(-radius, radius + 1)
    idx = (np.arange(L)[None, :] - offs[:, None]) % L
    return int(offs[np.argmax(q_zm[idx] @ p)])


def estimate_camera_np(frames_cam: np.ndarray, tpl: RigTemplate, cam: int,
                       radius: int = SEARCH_RADIUS,
                       gain_dead_zone: float = GAIN_DEAD_ZONE,
                       ) -> Tuple[int, int, float]:
    """(T, H, W, 3) uint8 frames of ONE camera -> (dy, dx, gain).

    Same profile-correlation estimator as the device path (estimate_tc)
    so folder/video ingest and the jitted pipeline agree exactly."""
    p = frames_cam.astype(np.float32).mean(axis=(0, 3))
    dy = _corr1d_argmax_np(
        p.mean(axis=1), _zero_mean(tpl.row_profile[cam]), radius)
    dx = _corr1d_argmax_np(
        p.mean(axis=0), _zero_mean(tpl.col_profile[cam]), radius)
    gain = float(frames_cam.astype(np.float64).mean() / tpl.mean[cam])
    if abs(gain - 1.0) <= gain_dead_zone:
        gain = 1.0
    return dy, dx, gain


def apply_np(frames: np.ndarray, dy: int, dx: int) -> np.ndarray:
    """Roll (N, H, W, 3) frames of one camera back to canonical."""
    if dy == 0 and dx == 0:
        return frames
    return np.roll(np.roll(frames, -dy, axis=1), -dx, axis=2)


def adjust_points_raw(pts: np.ndarray, dy: np.ndarray, dx: np.ndarray,
                      flip: np.ndarray, image_hw: Tuple[int, int]
                      ) -> np.ndarray:
    """Emit raw decoded points in provided-frame coordinates.

    pts: (N, K, 2) normalized (row, col) in the NETWORK frame — flipped
    cameras are still in the flipped frame (the df2d contract; the
    19->38 assembly unflips later via col <- 1 - col, reference
    core.py:198-199).  In that frame the drift offset is (dy/H, dx/W)
    for unflipped images and (dy/H, -dx/W) for flipped ones, so that the
    post-assembly coordinates come out at canonical + (dy/H, dx/W).

    Every raw entry is a real observation (the unobserved/flip-artifact
    encodings are introduced BY the assembly), so no masking is needed.
    """
    H, W = image_hw
    off = np.stack(
        [np.asarray(dy, np.float64) / H,
         np.where(np.asarray(flip, bool), -1.0, 1.0)
         * np.asarray(dx, np.float64) / W],
        axis=-1,
    )                                                   # (N, 2)
    return pts + off[:, None, :]
