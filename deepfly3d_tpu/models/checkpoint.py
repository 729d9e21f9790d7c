"""Orbax checkpointing for network weights and training state.

The reference's only model checkpoint is a torch tar file path in its
config (reference df3d/config.py:30-32).  Here weights move through two
formats: a portable flat ``.npz`` (models/hourglass.py — used for the
shipped inference weights) and orbax directories for training state
(params + optimizer + step), which scale to sharded multi-chip state.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Optional

from deepfly3d_tpu.models.hourglass import HourglassSpec


def save_checkpoint(path: str, state: Any, step: int, spec: HourglassSpec):
    """Save a training-state pytree (orbax)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.CheckpointManager(
        path, options=ocp.CheckpointManagerOptions(max_to_keep=3)
    ) as mgr:
        mgr.save(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(state),
                spec=ocp.args.JsonSave(dataclasses.asdict(_spec_jsonable(spec))),
            ),
        )


def load_checkpoint(path: str, step: Optional[int] = None):
    """-> (state_pytree, HourglassSpec, step)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.CheckpointManager(path) as mgr:
        step = mgr.latest_step() if step is None else step
        restored = mgr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(),
                spec=ocp.args.JsonRestore(),
            ),
        )
    spec_dict = dict(restored["spec"])
    spec_dict.pop("compute_dtype", None)
    return restored["state"], HourglassSpec(**spec_dict), step


def _spec_jsonable(spec: HourglassSpec) -> HourglassSpec:
    # compute_dtype is a jnp dtype object — not JSON-serializable; drop it
    # (it is a runtime choice, not a weight property).
    return dataclasses.replace(spec, compute_dtype=None)
