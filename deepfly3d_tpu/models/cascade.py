"""Full-contract fast inference: student pass + selective parity repair.

The throughput/parity dilemma (docs/ARCHITECTURE.md): the only checkpoint
that is argmax-EXACT against the golden recording is the 2-stack f96
conv-stem teacher (~636 frames/s bf16), while the fast students plateau
with a small residue of wrong-argmax cells (~0.3% of observations, far
left/right-ambiguity flips).  This module composes the two into one jitted
program that holds the reference's full golden contract (points2d atol
0.02, conf atol 0.002, reference tests/test_df3d.py:167-179) at student
speed:

1. the student runs on every image (bf16 trunk, f32 head);
2. each image (camera, frame) is scored by LEAVE-ONE-OUT multi-view
   consistency: the frame is re-triangulated *without* that camera and
   the camera's own observations are reprojected against that
   reconstruction.  A wrong argmax on camera c corrupts the *joint*
   reconstruction — plain reprojection residuals therefore inflate on
   every camera of the frame and can rank an innocent camera above the
   failing one — but the LOO-c reconstruction is clean exactly when c is
   the (single) offender, so blame lands on the right image (multi-view
   consistency is the one signal that does not require knowing the
   golden answer);
3. the top-R suspicious images (R = ceil(repair_frac * N), a STATIC
   bound so the program has fixed shapes and data-independent cost) are
   re-run through the parity teacher and their POINTS are spliced in;
   confidences stay the student's (the student's conf residual is the
   smaller one — the teacher's bf16 conf drifts past the 0.002 contract,
   the student is trained through its deployed bf16 forward).

The repair is exact where it fires (teacher bf16 points are argmax-exact)
so the contract holds as long as every actually-failing image ranks
inside the top-R — verified in-run by bench.py against the golden pickle
before this configuration may become the official headline.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from deepfly3d_tpu.models.hourglass import HourglassNet, HourglassSpec
from deepfly3d_tpu.ops import geometry


@dataclasses.dataclass(frozen=True)
class CascadeConfig:
    repair_frac: float = 0.125   # static fraction of images re-run on the teacher
    image_shape: Tuple[int, int] = (960, 480)   # (width, height)


def _decode(heatmaps):
    """(N, H, W, K) -> pts (N, K, 2) normalized (row, col), conf (N, K, 1)."""
    N, H, W, K = heatmaps.shape
    flat = heatmaps.astype(jnp.float32).transpose(0, 3, 1, 2).reshape(
        N, K, H * W
    )
    idx = jnp.argmax(flat, axis=-1)
    conf = jnp.max(flat, axis=-1, keepdims=True)
    row = (idx // W).astype(jnp.float32) / H
    col = (idx % W).astype(jnp.float32) / W
    return jnp.stack([row, col], -1), conf


def _assemble38(pts19, order, left_cams, right_cams, K):
    """(C, T, 19, 2) -> (C, T, 38, 2) on device (reference core.py:189-199
    semantics incl. the flip artifact)."""
    C, T = pts19.shape[:2]
    p38 = jnp.zeros((C, T, 2 * K, 2), jnp.float32)
    p38 = p38.at[left_cams, :, :K].set(pts19[left_cams])
    p38 = p38.at[right_cams, :, K:].set(pts19[right_cams])
    p38 = p38.at[order[2], :, 15:].set(0.0)
    p38 = p38.at[order[4], :, K + 15 :].set(0.0)
    flipped = 1.0 - p38[right_cams, ..., 1]
    return p38.at[right_cams, ..., 1].set(flipped)


def loo_suspicion(p38, R, tvec, intr, image_shape):
    """Per-image leave-one-out suspicion scores.

    p38: (C, T, 38, 2) normalized (row, col) with the reference's
    zero/flip-artifact "unobserved" encoding.  For each camera c the frame
    is DLT-triangulated WITHOUT c's observations and c's own points are
    reprojected against that reconstruction; the score of image (c, t) is
    the worst per-joint residual (pixels).  When a single camera's argmax
    is wrong, the LOO-c reconstruction is the one built only from correct
    observations, so the blame lands on c rather than on frame-mates whose
    plain residuals the corrupted joint reconstruction would inflate.

    Returns (C, T) float scores.  Joints whose LOO reconstruction is
    under-determined (<2 remaining observers) are excluded — reprojecting
    the zero point they triangulate to would accuse an innocent camera.
    """
    C = p38.shape[0]
    W_img, H_img = image_shape
    dist0 = jnp.zeros((C, 5), jnp.float32)
    obs_mask = geometry.observation_mask(p38)           # (C, T, 38)

    def loo_cam_score(cam):
        keep = 1.0 - jax.nn.one_hot(cam, C, dtype=jnp.float32)
        p_loo = p38 * keep[:, None, None, None]
        pts3d_loo = geometry.triangulate(
            p_loo, R, tvec, intr, (W_img, H_img), method="normal",
        )
        res, mask = geometry.reprojection_residuals(
            pts3d_loo, p38, R, tvec, intr, dist0, (W_img, H_img),
        )                                               # (C, T, 38, 2)
        loo_valid = (
            jnp.sum(obs_mask * keep[:, None, None], axis=0) >= 2
        )                                               # (T, 38)
        err = (
            jnp.linalg.norm(res[cam], axis=-1) * mask[cam] * loo_valid
        )                                               # (T, 38)
        return err.max(axis=-1)                         # (T,)

    return jax.vmap(loo_cam_score)(jnp.arange(C))       # (C, T)


def build_cascade_pipeline(
    student_vars,
    student_spec: HourglassSpec,
    teacher_vars,
    teacher_spec: HourglassSpec,
    calib,
    camera_ordering,
    cfg: CascadeConfig = CascadeConfig(),
    rig=None,
):
    """-> jitted fn: (T, C, H, W, 3) uint8 ->
    (points3d (T, 38, 3), points2d38 (C, T, 38, 2), conf (C, T, 19, 1)).

    Matches bench.build_pipeline's output contract so bench.py can verify
    and time it interchangeably with the single-net configurations.

    ``rig``: prepared rig template (ops/canonicalize.prepare) — frames
    are registered to the calibration session before both the student
    and teacher passes, exactly as in bench.build_pipeline.
    """
    from deepfly3d_tpu.ops import canonicalize
    from deepfly3d_tpu.ops import image as image_ops

    student = HourglassNet(student_spec)
    teacher = HourglassNet(teacher_spec)
    s_input = tuple(student_spec.input_shape or (256, 512))
    t_input = tuple(teacher_spec.input_shape or (256, 512))

    R_cal, tvec, intr, _ = calib
    order = np.asarray(camera_ordering)
    C = order.shape[0]
    flip_mask = np.zeros(C, bool)
    flip_mask[order[4:]] = True
    flip_d = jnp.asarray(flip_mask)
    left_cams = jnp.asarray(order[:3])
    right_cams = jnp.asarray(order[4:])
    W_img, H_img = cfg.image_shape

    @jax.jit
    def pipeline(frames_u8):
        T = frames_u8.shape[0]
        N = T * C
        n_repair = max(int(np.ceil(cfg.repair_frac * N)), 1)
        if rig is not None:
            dy, dx, gain = canonicalize.estimate_tc(frames_u8, rig)
            frames_u8 = canonicalize.apply_shift_tc(frames_u8, dy, dx)
            gain_corr = jnp.tile(
                canonicalize.gain_correction(gain, jnp.float32), T)
        x_u8 = frames_u8.reshape(N, H_img, W_img, 3)
        flip = jnp.tile(flip_d, T)

        # ---- 1. student pass on every image (preprocess dtype follows
        # each net's own deployment policy, HourglassSpec.preprocess_dtype)
        xs = image_ops.preprocess_frames(
            x_u8, flip, s_input,
            jnp.dtype(student_spec.preprocess_dtype).type,
        )
        if rig is not None:
            xs = xs * gain_corr[:, None, None, None].astype(xs.dtype)
        hm_s = student.apply(student_vars, xs, train=False)[-1]
        pts_s, conf_s = _decode(hm_s)                    # (N, 19, 2/1)
        K = pts_s.shape[1]
        pts19 = pts_s.reshape(T, C, K, 2).transpose(1, 0, 2, 3)
        conf = conf_s.reshape(T, C, K, 1).transpose(1, 0, 2, 3)
        p38_s = _assemble38(pts19, order, left_cams, right_cams, K)

        # ---- 2. suspicion: per-image worst LEAVE-ONE-OUT reprojection
        # residual (loo_suspicion above) — vmapped over cameras: 7 extra
        # DLT passes, all VPU math, a few ms against the student forward.
        score = loo_suspicion(
            p38_s, jnp.asarray(R_cal, jnp.float32),
            jnp.asarray(tvec, jnp.float32), jnp.asarray(intr, jnp.float32),
            (W_img, H_img),
        )                                               # (C, T)
        score_flat = score.T.reshape(N)                 # image-major (t, c)

        # ---- 3. static top-R parity repair
        _, repair_idx = jax.lax.top_k(score_flat, n_repair)
        xr_u8 = x_u8[repair_idx]
        xr = image_ops.preprocess_frames(
            xr_u8, flip[repair_idx], t_input,
            jnp.dtype(teacher_spec.preprocess_dtype).type,
        )
        if rig is not None:
            xr = xr * (
                gain_corr[repair_idx][:, None, None, None].astype(xr.dtype)
            )
        hm_t = teacher.apply(teacher_vars, xr, train=False)[-1]
        pts_t, _ = _decode(hm_t)                        # (R, 19, 2)
        # splice teacher POINTS into the per-image student points
        pts_fixed = pts_s.at[repair_idx].set(pts_t)
        pts19_f = pts_fixed.reshape(T, C, K, 2).transpose(1, 0, 2, 3)
        p38 = _assemble38(pts19_f, order, left_cams, right_cams, K)

        pts3d = geometry.triangulate(
            p38, jnp.asarray(R_cal, jnp.float32),
            jnp.asarray(tvec, jnp.float32), jnp.asarray(intr, jnp.float32),
            (W_img, H_img), method="normal",
        )
        if rig is not None:
            p38 = canonicalize.adjust_points38(p38, dy, dx, (H_img, W_img))
        return pts3d, p38, conf

    return pipeline
