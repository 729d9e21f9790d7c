"""Pluggable skeleton models.

The reference binds a single fly skeleton module through its config dict
(reference df3d/config.py:22-26).  Here a skeleton is a frozen dataclass of
arrays — TPU code consumes the precomputed boolean masks directly instead of
calling per-joint Python predicates (reference df3d/skeleton_fly.py:222-249).
"""

from deepfly3d_tpu.skeletons.skeleton import Skeleton, Tracked
from deepfly3d_tpu.skeletons import fly

__all__ = ["Skeleton", "Tracked", "fly"]
