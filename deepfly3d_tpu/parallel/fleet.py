"""Multi-recording fleet processing.

The reference's only batch mechanism is a serial per-folder loop
(reference cli.py:244-273).  This module is the TPU-native fleet path
(BASELINE "multi-recording batch: N flies x 7 cams data-parallel"):

1. all recordings' images are decoded on host (threaded / native libjpeg)
   and pushed through **one** inference program — single-device jit, or
   image-axis data-parallel over a `jax.sharding.Mesh` when given;
2. the 19->38 postprocess, bundle adjustment, triangulation and procrustes
   then run per recording with the same per-recording error isolation as
   the CLI batch loop (one bad recording never kills the fleet);
3. each recording gets a reference-schema `df3d_result_*.pkl`.

For pure-geometry fleets (already-detected 2D points), see
``pipeline.make_batched_calibration`` — N bundle adjustments vmapped into
one XLA program.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import numpy as np

from deepfly3d_tpu import logger
from deepfly3d_tpu.config import Config, fly_config


@dataclass
class RecordingResult:
    folder: str
    ok: bool
    error: Optional[Exception] = None
    points2d: Optional[np.ndarray] = None        # (C, T, 38, 2) normalized
    conf: Optional[np.ndarray] = None
    points3d: Optional[np.ndarray] = None        # (T, 38, 3) post-procrustes
    calib: Optional[Dict[int, dict]] = None
    save_path: Optional[str] = None


def process_recordings(
    folders: Sequence[str],
    checkpoint: Optional[str] = None,
    mesh=None,
    config: Optional[Config] = None,
    batch_size: int = 8,
    solver: str = "lm",
    num_images_max: int = 0,
    save: bool = True,
    camera_ordering: Optional[Sequence[int]] = None,
    **solver_kwargs,
) -> List[RecordingResult]:
    """Process N recordings with one shared inference dispatch.

    ``mesh``: optional `jax.sharding.Mesh` — images shard across its
    devices (padded to a device multiple); without it the single-device
    batched path is used.  ``solver``: "lm" (TPU-native, default for
    fleets) or "parity"; extra ``solver_kwargs`` (e.g. ``huber_px``)
    flow to ops.bundle_adjust per recording.
    """
    import jax.numpy as jnp

    from deepfly3d_tpu.io import discovery
    from deepfly3d_tpu.models import decode as decode_mod
    from deepfly3d_tpu.models.inference import (
        PoseEstimator,
        _read_images_threaded,
    )

    cfg = config or fly_config()
    ckpt = checkpoint or cfg.network.checkpoint
    estimator = PoseEstimator(ckpt, input_shape=cfg.network.input_shape)
    C = cfg.num_cameras

    results = [RecordingResult(folder=f, ok=False) for f in folders]

    # ---- 1. discover + decode every recording's images on the host
    all_paths: List[str] = []
    all_flips: List[bool] = []
    spans: List[Optional[tuple]] = []  # (start, T, ordering) per recording
    for rec in results:
        try:
            if camera_ordering is not None:
                ordering = np.asarray(camera_ordering)
            else:
                from deepfly3d_tpu.core import find_default_camera_ordering

                try:
                    ordering = find_default_camera_ordering(rec.folder)
                except NotImplementedError:
                    ordering = np.arange(C)
            max_id = discovery.get_max_img_id(rec.folder)
            T = max_id + 1
            if num_images_max:
                T = min(T, num_images_max)
            flip_cams = {int(ordering[i]) for i in range(4, C)}
            start = len(all_paths)
            for cam in range(C):
                for img in range(T):
                    all_paths.append(
                        os.path.join(rec.folder, f"camera_{cam}_img_{img}.jpg")
                    )
                    all_flips.append(cam in flip_cams)
            spans.append((start, T, ordering))
        except Exception as e:  # noqa: BLE001 — per-recording isolation
            rec.error = e
            spans.append(None)
            logger.warning(f"{rec.folder}: discovery failed: {e}")

    if not all_paths:
        return results

    images = _read_images_threaded(all_paths)
    flips = np.asarray(all_flips)

    # ---- 2. ONE inference pass over every image of every recording
    if mesh is not None:
        from deepfly3d_tpu.parallel.pipeline import make_sharded_infer

        n_dev = mesh.devices.size
        pad = (-images.shape[0]) % n_dev
        if pad:
            images = np.concatenate([images, images[:pad]])
            flips = np.concatenate([flips, flips[:pad]])
        infer = make_sharded_infer(
            estimator.spec, mesh, estimator.input_shape
        )
        with mesh:
            pts_all, conf_all = infer(
                estimator.variables, jnp.asarray(images), jnp.asarray(flips)
            )
        pts_all = np.asarray(pts_all)[: len(all_paths)]
        conf_all = np.asarray(conf_all)[: len(all_paths)]
    else:
        pts_all, conf_all = estimator.infer_images(
            images, flips, batch_size=batch_size
        )

    # ---- 3. per-recording geometry + save, isolated
    from deepfly3d_tpu.core import Core

    for rec, span in zip(results, spans):
        if span is None:
            continue
        try:
            start, T, ordering = span
            n = C * T
            K = pts_all.shape[1]
            pts19 = pts_all[start:start + n].reshape(C, T, K, 2).astype(np.float64)
            conf = conf_all[start:start + n].reshape(C, T, K, 1).astype(np.float64)
            core = Core(
                input_folder=rec.folder,
                output_folder=None,
                num_images_max=T,
                camera_ordering=list(ordering),
            )
            core.points2d = decode_mod.postprocess_points2d(
                pts19, core.camera_ordering, cfg.num_joints
            )
            core.conf = conf
            core.calibrate_calc(0, T - 1, solver=solver, **solver_kwargs)
            if save:
                core.save()
                rec.save_path = core.save_path
            rec.points2d = core.points2d
            rec.conf = conf
            rec.points3d = core.points3d if save else None
            rec.calib = core.calib
            rec.ok = True
        except Exception as e:  # noqa: BLE001 — per-recording isolation
            rec.error = e
            logger.warning(f"{rec.folder}: processing failed: {e}")
    failed = [r for r in results if not r.ok]
    if failed:
        logger.warning(
            f"{len(failed)} of {len(results)} recordings failed: "
            + ", ".join(r.folder for r in failed)
        )
    return results
