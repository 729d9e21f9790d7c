"""Procrustes registration of predicted 3D pose onto a template skeleton.

Device-side (jnp.linalg.svd, vmappable over sides/recordings) equivalent of
the reference's per-side MATLAB-style procrustes chain (reference
df3d/procrustes.py:51-151 + plot_util.py:85-91):

1. per-side scale from median bone lengths of the three 5-keypoint legs
2. median-center the side, apply the scale
3. rigid (scaling=False) orthogonal alignment of the time-median
   BODY_COXA/COXA_FEMUR anchor points onto the template's
4. apply the rotation+translation to every frame

Validated against the golden pickle: procrustes(points3d_wo_procrustes)
== points3d at 1e-5 (reference tests/test_df3d.py:227-232).
"""

from __future__ import annotations

import glob
import os
import pickle
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def load_template_points3d(path: str) -> np.ndarray:
    """Template pose (T, J, 3) from a df3d_result pickle file or directory.

    Same resolution rule as reference df3d/procrustes.py:38-48.
    """
    if os.path.isfile(path):
        file = path
    else:
        matches = sorted(glob.glob(os.path.join(path, "df3d_result*.pkl")))
        if not matches:
            raise FileNotFoundError(f"No df3d_result*.pkl under {path}")
        file = matches[0]
    with open(file, "rb") as f:
        d = pickle.load(f)
    pts3d = d["points3d"]
    assert pts3d is not None
    return np.asarray(pts3d)


def _leg_bone_lengths(pts: jnp.ndarray, n_legs: int = 3, leg_len: int = 5):
    """(T, J, 3) -> (T, n_legs*(leg_len-1)) adjacent-segment lengths."""
    segs = []
    for leg in range(n_legs):
        leg_pts = pts[:, leg * leg_len : (leg + 1) * leg_len]
        segs.append(jnp.linalg.norm(leg_pts[:, 1:] - leg_pts[:, :-1], axis=-1))
    return jnp.concatenate(segs, axis=1)


def _orthogonal_align(X: jnp.ndarray, Y: jnp.ndarray):
    """Rigid MATLAB-procrustes with scaling=False, reflection='best'.

    Returns (T_rot, c) such that Y @ T_rot + c best aligns Y onto X.
    (Behavioral contract of reference df3d/procrustes.py:154-263 in the
    scaling=False branch.)
    """
    muX = X.mean(axis=0)
    muY = Y.mean(axis=0)
    X0 = X - muX
    Y0 = Y - muY
    normX = jnp.sqrt((X0**2).sum())
    normY = jnp.sqrt((Y0**2).sum())
    A = (X0 / normX).T @ (Y0 / normY)
    U, _, Vt = jnp.linalg.svd(A, full_matrices=False)
    T_rot = Vt.T @ U.T
    c = muX - muY @ T_rot
    return T_rot, c


def procrustes_side(
    pts: jnp.ndarray,
    template: jnp.ndarray,
    anchor_idx: jnp.ndarray,
    n_legs: int = 3,
    leg_len: int = 5,
) -> jnp.ndarray:
    """Align one body side (T, J_side, 3) onto its template."""
    # 1. scale: per-bone time-medians, then median of template/pred ratios
    bl_pred = _leg_bone_lengths(pts, n_legs, leg_len)
    bl_tmpl = _leg_bone_lengths(template, n_legs, leg_len)
    ratio = jnp.median(bl_tmpl, axis=0) / jnp.median(bl_pred, axis=0)
    s = jnp.median(ratio)

    # 2. median-center over all (T * J_side) points, then scale
    center = jnp.median(pts.reshape(-1, 3), axis=0)
    pts = (pts - center) * s

    # 3. rigid alignment of time-median anchors
    X = jnp.median(template[:, anchor_idx], axis=0)
    Y = jnp.median(pts[:, anchor_idx], axis=0)
    T_rot, c = _orthogonal_align(X, Y)

    # 4. apply to every frame
    return pts @ T_rot + c


@partial(jax.jit, static_argnames=("side_joints",))
def _procrustes_separate_jit(pts, template, anchor_idx, side_joints: int):
    left = procrustes_side(
        pts[:, :side_joints], template[:, :side_joints], anchor_idx
    )
    right = procrustes_side(
        pts[:, side_joints : 2 * side_joints],
        template[:, side_joints : 2 * side_joints],
        anchor_idx,
    )
    return jnp.concatenate([left, right], axis=1)


def procrustes_separate(
    pts: np.ndarray,
    template: np.ndarray,
    anchor_idx: Optional[Sequence[int]] = None,
    side_joints: int = 19,
) -> np.ndarray:
    """Per-side procrustes of (T, 2*side_joints, 3) onto the template.

    anchor_idx defaults to the per-side BODY_COXA/COXA_FEMUR joints of the
    fly skeleton (first two keypoints of each 5-keypoint leg).
    """
    if anchor_idx is None:
        anchor_idx = [0, 1, 5, 6, 10, 11]
    out = _procrustes_separate_jit(
        jnp.asarray(pts, dtype=jnp.float64),
        jnp.asarray(template, dtype=jnp.float64),
        jnp.asarray(list(anchor_idx)),
        side_joints,
    )
    return np.asarray(out)


# ------------------------------------------------------------- normalization


def rotate_points3d(pts: np.ndarray) -> np.ndarray:
    """Axis shuffle for plotting: (x, y, z) -> (x, -z, -y).

    Same transform as reference df3d/plot_util.py:10-17.
    """
    pts = np.asarray(pts)
    return np.stack([pts[..., 0], -pts[..., 2], -pts[..., 1]], axis=-1)


def normalize_pose_3d(
    pts: np.ndarray, normalize_median: bool = True, rotate: bool = False
) -> np.ndarray:
    """Median-center (over all points) and optionally axis-rotate.

    Non-mutating version of reference df3d/plot_util.py:85-91.
    """
    pts = np.array(pts)
    if normalize_median:
        pts = pts - np.median(pts.reshape(-1, 3), axis=0)
    if rotate:
        pts = rotate_points3d(pts)
    return pts
