"""Device mesh and sharding helpers.

Axes:

* ``data``  — recordings / frames / images (pure DP; the dominant axis for
  this workload: every frame is independent until triangulation).
* ``time``  — frame axis inside one recording, used by the sequence-parallel
  analogs (sharded triangulation, associative-scan One-Euro; SURVEY §2.4).

There is no tensor/pipeline/expert split here by design: the hourglass is a
small CNN whose weights replicate cheaply; stating that explicitly (rather
than fabricating TP/PP) mirrors SURVEY §2.4's guidance.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(
    n_devices: Optional[int] = None, axis_name: str = "data"
) -> Mesh:
    """1-D mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def grid_mesh(shape: Sequence[int], axis_names: Sequence[str]) -> Mesh:
    """N-D mesh, e.g. ('data', 'time') for recording x frame sharding."""
    devices = np.array(jax.devices()[: int(np.prod(shape))]).reshape(shape)
    return Mesh(devices, tuple(axis_names))


def shard_batch(mesh: Mesh, x, axis_name: str = "data"):
    """Place an array with its leading axis split over the mesh."""
    spec = P(axis_name, *([None] * (np.ndim(x) - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (e.g. model params) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def batch_sharding(mesh: Mesh, ndim: int, axis_name: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis_name, *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
