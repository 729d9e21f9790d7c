"""Typed configuration.

The reference uses a mutable module-global dict (reference df3d/config.py:15-69)
that binds camera topology, skeleton module, network shape, belief-propagation
hyperparameters and template paths.  Here the same information lives in a
frozen-by-convention dataclass; `as_dict()` provides the reference's dict view
for compatibility.  Two profiles ship: the fly default and an H3.6M-style
4-camera human profile, proving the framework is not fly-hardcoded.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional, Tuple

import numpy as np

from deepfly3d_tpu.skeletons import fly
from deepfly3d_tpu.skeletons.skeleton import Skeleton

_DATA_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")
_WEIGHTS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "weights"
)


@dataclasses.dataclass
class NetworkConfig:
    """Stacked-hourglass shape (reference df3d/config.py:30-39)."""

    num_stacks: int = 2
    num_features: int = 64          # channels in the hourglass trunk
    hourglass_depth: int = 4        # recursive down/up levels
    num_blocks: int = 1             # residual blocks per stage
    num_predict: int = fly.num_joints // 2   # 19 channels = one body side
    input_shape: Tuple[int, int] = (256, 512)   # (h, w) network input
    heatmap_shape: Tuple[int, int] = (64, 128)  # (h, w) output heatmaps
    batch_size: int = 8
    checkpoint: str = os.path.join(_WEIGHTS_DIR, "hourglass_fly.npz")


@dataclasses.dataclass
class BeliefPropagationConfig:
    """Pictorial-structures MAP hyperparameters (reference df3d/config.py:55-60)."""

    num_peak: int = 10
    upper_bound: int = 200
    alpha_reproj: float = 30.0
    alpha_heatmap: float = 600.0
    alpha_bone: float = 10.0


@dataclasses.dataclass
class Config:
    name: str = "fly"
    num_cameras: int = 7
    skeleton: Skeleton = dataclasses.field(default_factory=lambda: fly.skeleton)
    left_cameras: Tuple[int, ...] = (0, 1, 2)
    right_cameras: Tuple[int, ...] = (6, 5, 4)
    flip_cameras: Tuple[int, ...] = (4, 5, 6)
    image_shape: Optional[Tuple[int, int]] = None   # (width, height), probed at runtime
    network: NetworkConfig = dataclasses.field(default_factory=NetworkConfig)
    bp: BeliefPropagationConfig = dataclasses.field(
        default_factory=BeliefPropagationConfig
    )
    # per-joint reprojection-error threshold in px for error navigation
    reproj_thr_px: float = 40.0
    # rough per-camera yaw prior in radians (reference df3d/config.py:43-51)
    calib_rough: Dict[int, float] = dataclasses.field(
        default_factory=lambda: {
            0: 0 / 57.2, 1: -30 / 57.2, 2: -70 / 57.2, 3: -125 / 57.2,
            6: +110 / 57.2, 5: +150 / 57.2, 4: +179 / 57.2,
        }
    )
    calib_prior_path: str = os.path.join(_DATA_DIR, "calib.pkl")
    procrustes_apply: bool = True
    procrustes_template_path: str = _DATA_DIR  # dir containing df3d_result*.pkl
    # plotting (style swept against the reference's shipped golden video:
    # filled navy circles r=8 over thickness-5 LINE_8 bones, viz/plot2d.py)
    line_thickness: int = 5
    scatter_r: int = 8
    # recordings longer than this auto-switch Core to the bounded-memory
    # streaming video path (Core.__init__ streaming=None); at 480x960x3
    # uint8 the image pipeline materializes ~9.7 MB/frame across 7 cams,
    # so 512 frames ~ 5 GB host RAM — the practical ceiling here
    streaming_auto_threshold: int = 512

    @property
    def num_joints(self) -> int:
        return self.skeleton.num_joints

    @property
    def heatmap_shape(self) -> Tuple[int, int]:
        return self.network.heatmap_shape

    def reproj_thr(self) -> Dict[int, float]:
        return {j: self.reproj_thr_px for j in range(self.num_joints)}

    def as_dict(self) -> dict:
        """Reference-compatible dict view (keys of df3d/config.py:15-66)."""
        return {
            "name": self.name,
            "num_cameras": self.num_cameras,
            "image_shape": list(self.image_shape) if self.image_shape else None,
            "heatmap_shape": list(self.network.heatmap_shape),
            "left_cameras": list(self.left_cameras),
            "right_cameras": list(self.right_cameras),
            "skeleton": self.skeleton,
            "bones": [list(b) for b in self.skeleton.bones],
            "bone_param": self.skeleton.bone_param,
            "num_joints": self.num_joints,
            "line_thickness": self.line_thickness,
            "scatter_r": self.scatter_r,
            "num_stacks": self.network.num_stacks,
            "batch_size": self.network.batch_size,
            "flip_cameras": list(self.flip_cameras),
            "num_predict": self.network.num_predict,
            "reproj_thr": self.reproj_thr(),
            "calib_rough": dict(self.calib_rough),
            "num_peak": self.bp.num_peak,
            "upper_bound": self.bp.upper_bound,
            "alpha_reproj": self.bp.alpha_reproj,
            "alpha_heatmap": self.bp.alpha_heatmap,
            "alpha_bone": self.bp.alpha_bone,
            "procrustes_apply": self.procrustes_apply,
            "procrustes_template": self.procrustes_template_path,
        }


def fly_config() -> Config:
    return Config()


def h36m_config() -> Config:
    """H3.6M-style 4-camera human profile: deeper stacks, larger heatmaps."""
    from deepfly3d_tpu.skeletons import h36m

    return Config(
        name="h36m",
        num_cameras=4,
        skeleton=h36m.skeleton,
        left_cameras=(0, 1),
        right_cameras=(2, 3),
        flip_cameras=(),
        # the per-side fly registration scheme (and its shipped template)
        # does not apply to the human skeleton; raw triangulated points are
        # the 3D output for this profile
        procrustes_apply=False,
        network=NetworkConfig(
            num_stacks=4,
            num_features=128,
            num_predict=h36m.num_joints,
            # higher-res than the fly profile (BASELINE config #4: "deeper
            # hourglass stack, higher-res heatmaps"): 96x96 = 9216 cells vs
            # the fly's 64x128 = 8192
            input_shape=(384, 384),
            heatmap_shape=(96, 96),
            checkpoint=os.path.join(_WEIGHTS_DIR, "hourglass_h36m.npz"),
        ),
    )
