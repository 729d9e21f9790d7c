"""Multi-chip parallelism: mesh construction, sharded train/infer steps.

The reference is a single-process pipeline with no distributed layer
(SURVEY §2.4); here parallelism is first-class: recordings x cameras x
frames shard over a ``jax.sharding.Mesh`` and XLA inserts the collectives.
"""

from deepfly3d_tpu.parallel.mesh import data_mesh, shard_batch, replicate

__all__ = ["data_mesh", "shard_batch", "replicate"]
