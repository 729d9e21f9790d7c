"""Compatibility facade mirroring the external pyba ``CameraNetwork`` API.

The reference drives all multi-view geometry through pyba's CameraNetwork
object (reference df3d/core.py:120-126, 246-250, 355-360).  Code written
against that API can switch to this class unchanged; internally everything
dispatches to the vectorized JAX ops.

Also exposes ``df3d_bones`` / ``df3d_colors`` equivalents (the reference
imports them from pyba.config at core.py:110-111).
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import numpy as np

from deepfly3d_tpu.io import discovery, result_schema
from deepfly3d_tpu.ops import bundle_adjust as ba_mod
from deepfly3d_tpu.ops import geometry
from deepfly3d_tpu.skeletons import fly
from deepfly3d_tpu.viz import plot2d

df3d_bones = np.array(fly.bones)
df3d_colors = fly.skeleton.joint_colors_rgb()


class Camera:
    """One view of the network: 2D points in pixel (x, y) + image access."""

    def __init__(self, cam_id: int, network: "CameraNetwork"):
        self.cam_id = cam_id
        self._net = network

    @property
    def points2d(self) -> np.ndarray:
        """(T, J, 2) pixel (x, y)."""
        return self._net._points2d_xy[self.cam_id]

    def __getitem__(self, img_id: int) -> np.ndarray:
        return self.points2d[img_id]

    def is_empty(self) -> bool:
        return not np.any(self.points2d)

    def get_image(self, img_id: int) -> np.ndarray:
        path = self._net.image_path.format(cam_id=self.cam_id, img_id=img_id)
        return discovery.read_image(path)

    def plot_2d(
        self,
        img_id: int,
        points2d: Optional[np.ndarray] = None,
        bones=None,
        colors=None,
    ) -> np.ndarray:
        pts = points2d if points2d is not None else self[img_id]
        return plot2d.draw_pose2d(
            self.get_image(img_id), pts, fly.skeleton, cam_id=self.cam_id
        )


class CameraNetwork:
    """pyba-compatible calibration/triangulation session.

    points2d: (C, T, J, 2) in the pyba plane convention — the reference
    passes ``stored_normalized * image_shape[::-1]`` i.e. (row_px, col_px)
    (reference core.py:121, 247); internally this is swapped to (x, y).
    calib: either {cam: {R, tvec, intr, distort}} or a whole df3d_result
    dict (integer keys harvested, reference core.py:120-126).
    """

    def __init__(
        self,
        points2d: np.ndarray,
        calib: Optional[dict] = None,
        image_path: Optional[str] = None,
        bones=None,
        colors=None,
        image_shape=(960, 480),
    ):
        points2d = np.asarray(points2d, dtype=np.float64)
        self.num_cameras, self.T = points2d.shape[:2]
        # (row_px, col_px) -> pixel (x, y)
        self._points2d_xy = points2d[..., ::-1].copy()
        self.image_shape = tuple(image_shape)
        # normalized (row, col) for the geometry ops
        w, h = self.image_shape
        self._points2d_rowcol = np.stack(
            [points2d[..., 0] / h, points2d[..., 1] / w], axis=-1
        )
        self.image_path = image_path
        self.points3d: Optional[np.ndarray] = None
        self.calib: Optional[Dict[int, dict]] = None
        if calib is not None:
            harvested = result_schema.extract_calib(calib)
            if harvested:
                self.calib = harvested
        self.cam_list = [Camera(c, self) for c in range(self.num_cameras)]

    def __getitem__(self, cam_id: int) -> Camera:
        return self.cam_list[cam_id]

    def has_calibration(self) -> bool:
        return self.calib is not None

    def bundle_adjust(
        self,
        update_intrinsic: bool = False,
        update_distort: bool = False,
        solver: str = "parity",
    ) -> float:
        assert self.calib is not None, "construct with a calibration prior first"
        result = ba_mod.bundle_adjust(
            self._points2d_rowcol,
            self.calib,
            self.image_shape,
            update_intrinsic=update_intrinsic,
            update_distort=update_distort,
            solver=solver,
        )
        self.calib = result.calib
        return result.cost_final

    def triangulate(self) -> np.ndarray:
        import jax.numpy as jnp

        R, tvec, intr, dist = geometry.calib_to_arrays(self.calib, self.num_cameras)
        self.points3d = np.asarray(
            geometry.triangulate(
                jnp.asarray(self._points2d_rowcol),
                jnp.asarray(R),
                jnp.asarray(tvec),
                jnp.asarray(intr),
                self.image_shape,
                distort=jnp.asarray(dist),
            )
        )
        return self.points3d

    def reprojection_error(self) -> float:
        import jax.numpy as jnp

        if self.points3d is None:
            self.triangulate()
        R, tvec, intr, dist = geometry.calib_to_arrays(self.calib, self.num_cameras)
        return float(
            geometry.reprojection_error(
                jnp.asarray(self.points3d),
                jnp.asarray(self._points2d_rowcol),
                jnp.asarray(R),
                jnp.asarray(tvec),
                jnp.asarray(intr),
                jnp.asarray(dist),
                self.image_shape,
            )
        )

    def summarize(self) -> Dict[int, dict]:
        """{cam: {R, tvec, distort, intr}} — merged into result pickles
        (reference core.py:360)."""
        return {
            c: {
                "R": np.asarray(self.calib[c]["R"]),
                "tvec": np.asarray(self.calib[c]["tvec"]),
                "distort": np.asarray(self.calib[c]["distort"]),
                "intr": np.asarray(self.calib[c]["intr"]),
            }
            for c in self.calib
        }


def procrustes_seperate(pts3d: np.ndarray) -> np.ndarray:
    """Reference-spelling shim (df3d/procrustes.py:51): per-side procrustes
    onto the shipped template, template argument defaulted from config."""
    from deepfly3d_tpu.config import fly_config
    from deepfly3d_tpu.ops import procrustes as _procrustes

    template = _procrustes.load_template_points3d(
        fly_config().procrustes_template_path
    )
    return _procrustes.procrustes_separate(pts3d, template)
