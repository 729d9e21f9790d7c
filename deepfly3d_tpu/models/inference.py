"""Batched 2D pose inference over a recording folder.

TPU-native replacement for the external df2d ``inference_folder`` contract
(called at reference df3d/core.py:177-185): host threads decode JPEGs while
the device runs resize -> normalize -> hourglass -> decode as one fused XLA
program; batches are prefetched so H2D transfer overlaps compute (the role
of the reference's pinned-memory DataLoader, reference cli.py:146-150).

Output contract: ``points2d`` (C, T, 19, 2) normalized (row, col) with
right-side cameras fed horizontally flipped images, ``conf`` (C, T, 19, 1)
unnormalized heatmap maxima.
"""

from __future__ import annotations

import concurrent.futures as futures
import os
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from deepfly3d_tpu import logger
from deepfly3d_tpu.io import discovery
from deepfly3d_tpu.models import decode as decode_mod
from deepfly3d_tpu.models.hourglass import HourglassNet, HourglassSpec, load_weights


@partial(
    jax.jit,
    static_argnames=(
        "spec", "input_shape", "soft_argmax", "fused", "return_heatmaps"
    ),
)
def infer_batch(
    variables,
    images_u8: jnp.ndarray,       # (N, H, W, 3) uint8
    flip: jnp.ndarray,            # (N,) bool — flip width before inference
    spec: HourglassSpec,
    input_shape: Tuple[int, int],
    soft_argmax: bool = False,
    fused: bool = False,
    return_heatmaps: bool = False,
    gain: Optional[jnp.ndarray] = None,   # (N,) exposure correction (rig
                                          # registration, ops/canonicalize)
):
    """uint8 images -> (points2d (N,19,2) normalized (row,col), conf (N,19,1)).

    The whole pipeline — normalize, flip, resize, forward, decode — is one
    jitted program: a single H2D transfer of uint8 pixels per batch, no
    intermediate host round-trips.

    ``fused=True`` takes ``variables`` as pre-folded parameters from
    ``fused_inference.fold_hourglass`` (BN folded into convs — the
    production throughput path; see docs/ARCHITECTURE.md perf notes).
    """
    from deepfly3d_tpu.ops import image as image_ops

    # cast/normalize/flip/resize as two MXU matmuls (exact vs the naive
    # cast->flip->jax.image.resize chain; ops/image.py, tests/test_image_ops);
    # dtype follows the checkpoint's deployment policy (HourglassSpec)
    x = image_ops.preprocess_frames(
        images_u8, flip, tuple(input_shape),
        jnp.dtype(spec.preprocess_dtype).type,
    )
    if gain is not None:
        # rig-registration exposure correction on the small tensor; the
        # caller passes exact 1.0 where the dead zone disabled correction
        # (multiplying by one is exact — bit-parity on clean input)
        x = x * gain[:, None, None, None].astype(x.dtype)
    if fused:
        from deepfly3d_tpu.models import fused_inference

        last = fused_inference.fused_apply(variables, spec, x)[-1]
    else:
        model = HourglassNet(spec)
        heatmaps = model.apply(variables, x, train=False)  # (S, N, h, w, K)
        last = heatmaps[-1]
    if soft_argmax:
        pts, conf = decode_mod.decode_softargmax(last)
    else:
        pts, conf = decode_mod.decode_argmax(last)
    if return_heatmaps:
        # last-stack heatmaps, flipped-camera maps stay in the flipped
        # frame (the reference df2d `return_heatmap` contract,
        # reference core.py:177-185 / README.md:404)
        return pts, conf, last
    return pts, conf


def _read_images_threaded(paths: Sequence[str], workers: int = 16) -> np.ndarray:
    """Decode JPEGs -> (N, H, W, 3) uint8.

    Prefers the native libjpeg thread-pool decoder (native/ingest.cpp) which
    writes one contiguous buffer ready for a single H2D transfer; falls back
    to a Python thread pool over OpenCV.
    """
    from deepfly3d_tpu.io import native

    if native.available() and paths:
        probe = discovery.read_image(paths[0])
        try:
            return native.decode_jpeg_batch(
                list(paths), probe.shape[0], probe.shape[1], num_threads=workers
            )
        except (IOError, RuntimeError) as e:
            logger.warning(f"native decode failed ({e}), falling back to cv2")

    out = [None] * len(paths)

    def job(i):
        out[i] = discovery.read_image(paths[i])

    with futures.ThreadPoolExecutor(max_workers=workers) as pool:
        list(pool.map(job, range(len(paths))))
    return np.stack(out)


class PoseEstimator:
    """Loads weights once, runs folder-level inference."""

    def __init__(
        self,
        checkpoint: str,
        input_shape: Optional[Tuple[int, int]] = None,
        soft_argmax: bool = False,
        fused: bool = False,
        rig_template: Optional[str] = "auto",
    ):
        from deepfly3d_tpu.ops import canonicalize

        self.variables, self.spec = load_weights(checkpoint)
        # rig registration (ops/canonicalize.py): frames are registered
        # against the calibration-session template before inference.
        # "auto" discovers the template shipped next to the checkpoint;
        # identity on un-drifted recordings (the estimates are exact
        # zeros there), so golden parity is unaffected.
        if rig_template == "auto":
            rig_template = canonicalize.find_template(checkpoint)
        elif rig_template in (None, "", "off"):
            rig_template = None
        self.rig = (
            canonicalize.load_template(rig_template) if rig_template else None
        )
        # the checkpoint's training resolution is the source of truth
        # (golden parity only holds there); the argument covers legacy
        # checkpoints that don't declare one.
        resolved = self.spec.input_shape or input_shape or (256, 512)
        self.input_shape = tuple(resolved)
        self.soft_argmax = soft_argmax
        self.fused = fused
        if fused:
            from deepfly3d_tpu.models import fused_inference

            self.variables = fused_inference.fold_hourglass(
                self.variables, self.spec, dtype=jnp.float32
            )

    def infer_images(self, images_u8: np.ndarray, flip: np.ndarray,
                     batch_size: int = 8, return_heatmaps: bool = False,
                     gain: Optional[np.ndarray] = None):
        """(N,H,W,3) uint8 + (N,) flip flags -> (pts (N,19,2), conf (N,19,1)).

        With ``return_heatmaps`` a third array (N, h, w, 19) of last-stack
        heatmaps is returned (flipped cameras in the flipped frame).

        H2D transfers are prefetched one batch ahead (``jax.device_put`` is
        async), so the upload of batch i+1 overlaps the device compute of
        batch i — the role of the reference DataLoader's pinned-memory
        staging (reference cli.py:146-150).
        """
        pts_all, conf_all, hm_all = [], [], []
        N = images_u8.shape[0]
        pad = (-N) % batch_size
        if pad:
            images_u8 = np.concatenate([images_u8, images_u8[:pad]], axis=0)
            flip = np.concatenate([flip, flip[:pad]], axis=0)
            if gain is not None:
                gain = np.concatenate([gain, gain[:pad]], axis=0)
        if gain is not None and np.all(gain == 1.0):
            gain = None        # keep the gain-free program (identity anyway)
        gain = None if gain is None else np.asarray(gain, np.float32)

        def put(i):
            return (
                jax.device_put(images_u8[i : i + batch_size]),
                jax.device_put(flip[i : i + batch_size]),
                None if gain is None
                else jax.device_put(gain[i : i + batch_size]),
            )

        starts = list(range(0, images_u8.shape[0], batch_size))
        staged = put(starts[0])
        for n, i in enumerate(starts):
            imgs_d, flip_d, gain_d = staged
            if n + 1 < len(starts):
                staged = put(starts[n + 1])   # prefetch next H2D in flight
            out = infer_batch(
                self.variables,
                imgs_d,
                flip_d,
                self.spec,
                self.input_shape,
                self.soft_argmax,
                self.fused,
                return_heatmaps,
                gain_d,
            )
            pts_all.append(np.asarray(out[0]))
            conf_all.append(np.asarray(out[1]))
            if return_heatmaps:
                hm_all.append(np.asarray(out[2]))
        pts = np.concatenate(pts_all)[:N]
        conf = np.concatenate(conf_all)[:N]
        if return_heatmaps:
            return pts, conf, np.concatenate(hm_all)[:N]
        return pts, conf

    def _register_chunk(self, images: np.ndarray, cams: np.ndarray,
                        reg: dict):
        """Rig registration (ops/canonicalize.py) for one ingest chunk.

        Per-camera (dy, dx, gain) is estimated ONCE per recording — from
        the first chunk in which the camera appears (drift is a property
        of the session, not the frame; batch-level estimation needs
        several frames, MIN_EST_FRAMES) — then applied to every chunk:
        frames are rolled back to the calibration-time pixel frame on
        the host (exact integer roll) and the exposure correction is
        returned for the device pipeline (infer_batch ``gain``).

        Returns (images, gain (N,) or None, dy (N,), dx (N,)).
        """
        from deepfly3d_tpu.ops import canonicalize

        zeros = np.zeros(len(cams), np.int64)
        if self.rig is None or images.shape[1:3] != self.rig.image_hw:
            return images, None, zeros, zeros
        cams = np.asarray(cams)
        for cam in np.unique(cams):
            if int(cam) not in reg:
                cam_frames = images[cams == cam]
                if len(cam_frames) < canonicalize.MIN_EST_FRAMES:
                    reg[int(cam)] = (0, 0, 1.0)
                else:
                    reg[int(cam)] = canonicalize.estimate_camera_np(
                        cam_frames, self.rig, int(cam))
        dy = np.array([reg[int(c)][0] for c in cams])
        dx = np.array([reg[int(c)][1] for c in cams])
        gain = np.array([reg[int(c)][2] for c in cams], np.float32)
        if np.any(dy) or np.any(dx):
            images = images.copy()
            for cam in np.unique(cams):
                d_y, d_x, _ = reg[int(cam)]
                if d_y or d_x:
                    m = cams == cam
                    images[m] = canonicalize.apply_np(images[m], d_y, d_x)
        return images, (None if np.all(gain == 1.0) else gain), dy, dx

    def infer_videos(
        self,
        folder: str,
        camera_ids_to_flip: Sequence[int],
        batch_size: int = 8,
        num_cameras: int = 7,
        max_frames: Optional[int] = None,
        chunk_frames: int = 512,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Streaming decode of camera_{c}.mp4 -> keypoints, no JPEGs on disk.

        The reference must expand videos to JPEG files via ffmpeg
        subprocesses before inference (reference core.py:446-459); this path
        streams frames straight from the demuxer (native libav when built,
        OpenCV otherwise) into the device pipeline, at most ``chunk_frames``
        host-resident at a time — hour-long recordings never materialize in
        RAM.
        """
        from deepfly3d_tpu.io import native

        flip_set = set(camera_ids_to_flip)
        per_cam_pts, per_cam_conf = [], []
        reg: dict = {}
        for cam in range(num_cameras):
            path = os.path.join(folder, f"camera_{cam}.mp4")
            flip_cam = cam in flip_set
            cam_pts, cam_conf = [], []
            frames: list = []

            def flush(cam=cam, flip_cam=flip_cam, cam_pts=cam_pts,
                      cam_conf=cam_conf, frames=frames):
                if not frames:
                    return
                images = np.stack(frames)
                frames.clear()
                images, gain, dy_c, dx_c = self._register_chunk(
                    images, np.full(len(images), cam), reg)
                flip = np.full(images.shape[0], flip_cam)
                p, c = self.infer_images(images, flip,
                                         batch_size=batch_size, gain=gain)
                if np.any(dy_c) or np.any(dx_c):
                    from deepfly3d_tpu.ops import canonicalize

                    p = canonicalize.adjust_points_raw(
                        p, dy_c, dx_c, flip, self.rig.image_hw)
                cam_pts.append(p)
                cam_conf.append(c)

            def consume(frame_iter):
                n = 0
                for frame in frame_iter:
                    frames.append(frame)
                    n += 1
                    if len(frames) >= chunk_frames:
                        flush()
                    if max_frames and n >= max_frames:
                        break
                flush()

            if native.available():
                with native.VideoReader(path) as vr:
                    consume(vr)
            else:
                import cv2

                def cv2_frames():
                    cap = cv2.VideoCapture(path)
                    try:
                        while True:
                            ok, frame = cap.read()
                            if not ok:
                                break
                            yield cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
                    finally:
                        cap.release()

                consume(cv2_frames())
            per_cam_pts.append(np.concatenate(cam_pts))
            per_cam_conf.append(np.concatenate(cam_conf))
        T = min(p.shape[0] for p in per_cam_pts)
        pts = np.stack([p[:T] for p in per_cam_pts]).astype(np.float64)
        conf = np.stack([c[:T] for c in per_cam_conf]).astype(np.float64)
        return pts, conf

    def infer_folder(
        self,
        folder: str,
        camera_ids_to_flip: Sequence[int],
        max_img_id: int,
        batch_size: int = 8,
        num_cameras: int = 7,
        return_heatmap: bool = False,
        chunk_images: int = 512,
    ):
        """-> (points2d (C, T, 19, 2), conf (C, T, 19, 1)), T = max_img_id + 1.

        Same call contract as the reference's df2d dependency
        (reference core.py:177-185), including the ``return_heatmap``
        option — when set, a third array (C, T, h, w, 19) is returned
        (flipped cameras in the flipped frame).

        At most ``chunk_images`` decoded frames are resident at once (a
        decoded 480x960 frame is ~1.3 MB, so the default bounds the
        ingest at ~0.7 GB regardless of recording length — the video
        path bounds itself the same way via ``chunk_frames``); with
        ``return_heatmap`` the heatmaps themselves are O(C*T) and the
        caller has asked for them all, so chunking only bounds the
        decoded-frame ingest, not the returned array.
        """
        T = max_img_id + 1
        paths, cams, flips = [], [], []
        flip_set = set(camera_ids_to_flip)
        for cam in range(num_cameras):
            for img in range(T):
                paths.append(
                    os.path.join(folder, f"camera_{cam}_img_{img}.jpg")
                )
                cams.append(cam)
                flips.append(cam in flip_set)
        flips = np.asarray(flips)
        # chunk boundaries aligned to batch_size so per-chunk padding
        # cannot change batch contents vs the unchunked computation
        chunk = max(chunk_images - chunk_images % batch_size, batch_size)
        pts_parts, conf_parts, hm_parts = [], [], []
        reg: dict = {}
        dy_parts, dx_parts = [], []
        for lo in range(0, len(paths), chunk):
            images = _read_images_threaded(paths[lo:lo + chunk])
            images, gain, dy_c, dx_c = self._register_chunk(
                images, np.asarray(cams[lo:lo + chunk]), reg)
            dy_parts.append(dy_c)
            dx_parts.append(dx_c)
            out = self.infer_images(
                images, flips[lo:lo + chunk], batch_size=batch_size,
                return_heatmaps=return_heatmap, gain=gain,
            )
            pts_parts.append(out[0])
            conf_parts.append(out[1])
            if return_heatmap:
                hm_parts.append(out[2])
        pts = np.concatenate(pts_parts, axis=0)
        conf = np.concatenate(conf_parts, axis=0)
        dy_all = np.concatenate(dy_parts)
        dx_all = np.concatenate(dx_parts)
        if np.any(dy_all) or np.any(dx_all):
            # registered recordings: points go out in provided-frame
            # coordinates (ops/canonicalize.adjust_points_raw)
            from deepfly3d_tpu.ops import canonicalize

            pts = canonicalize.adjust_points_raw(
                pts, dy_all, dx_all, flips, self.rig.image_hw)
        if return_heatmap:
            out = (pts, conf, np.concatenate(hm_parts, axis=0))
        else:
            out = (pts, conf)
        K = pts.shape[1]
        result = (
            pts.reshape(num_cameras, T, K, 2).astype(np.float64),
            conf.reshape(num_cameras, T, K, 1).astype(np.float64),
        )
        if return_heatmap:
            hm = out[2]
            return result + (
                hm.reshape((num_cameras, T) + hm.shape[1:]),
            )
        return result
