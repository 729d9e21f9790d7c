"""Sharded end-to-end pipeline steps.

Implements the multi-chip configurations from BASELINE.json:

* data-parallel hourglass training step (batch sharded over ``data``,
  replicated params; XLA emits the psum for the gradient reduction)
* data-parallel inference (frames sharded over ``data``)
* frame-sharded ("sequence-parallel") triangulation + One-Euro filtering
* vmapped per-recording Levenberg–Marquardt calibration — N recordings
  bundle-adjust concurrently on one program ("streaming triangulation",
  BASELINE.json config #5)
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from deepfly3d_tpu.models.hourglass import HourglassNet, HourglassSpec
from deepfly3d_tpu.models import decode as decode_mod
from deepfly3d_tpu.ops import geometry
from deepfly3d_tpu.parallel import mesh as mesh_mod


# ------------------------------------------------------------- training step


def make_sharded_train_step(
    spec: HourglassSpec,
    mesh: Mesh,
    learning_rate: float = 1e-3,
    axis_name: str = "data",
):
    """jit-compiled DP training step over the mesh.

    Batch arrays shard on their leading axis; params/opt state replicate.
    Returns (init_fn, step_fn).
    """
    model = HourglassNet(spec)
    tx = optax.adam(learning_rate)

    rep = mesh_mod.replicated_sharding(mesh)

    def init_fn(rng, input_shape: Tuple[int, int]):
        variables = model.init(
            rng, jnp.zeros((1, input_shape[0], input_shape[1], 3), jnp.float32),
            train=False,
        )
        params, batch_stats = variables["params"], variables["batch_stats"]
        opt_state = tx.init(params)
        return (
            jax.device_put(params, rep),
            jax.device_put(batch_stats, rep),
            jax.device_put(opt_state, rep),
        )

    def loss_fn(params, batch_stats, images, targets):
        heatmaps, updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            images,
            train=True,
            mutable=["batch_stats"],
        )
        loss = jnp.mean((heatmaps - targets[None]) ** 2)
        return loss, updates["batch_stats"]

    @partial(
        jax.jit,
        in_shardings=(
            rep, rep, rep,
            mesh_mod.batch_sharding(mesh, 4, axis_name),
            mesh_mod.batch_sharding(mesh, 4, axis_name),
        ),
        out_shardings=(rep, rep, rep, rep),
    )
    def step_fn(params, batch_stats, opt_state, images, targets):
        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch_stats, images, targets
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, loss

    return init_fn, step_fn


# ------------------------------------------------------------ inference step


def make_sharded_infer(
    spec: HourglassSpec,
    mesh: Mesh,
    input_shape: Tuple[int, int],
    axis_name: str = "data",
):
    """DP inference: (N, H, W, 3) uint8 + (N,) flips, sharded over devices.

    Same per-image math as the single-chip ``models.inference.infer_batch``
    (matmul preprocess, hourglass, argmax decode) with the image axis laid
    out over the mesh — each device runs its shard with zero collectives.
    """
    from deepfly3d_tpu.ops import image as image_ops

    model = HourglassNet(spec)
    rep = mesh_mod.replicated_sharding(mesh)

    @partial(
        jax.jit,
        in_shardings=(
            rep,
            mesh_mod.batch_sharding(mesh, 4, axis_name),
            mesh_mod.batch_sharding(mesh, 1, axis_name),
        ),
        out_shardings=(None, None),
    )
    def infer(variables, images_u8, flip):
        x = image_ops.preprocess_frames(images_u8, flip, tuple(input_shape))
        heatmaps = model.apply(variables, x, train=False)
        return decode_mod.decode_argmax(heatmaps[-1])

    return infer


# --------------------------------------------------- frame-sharded geometry


def make_sharded_triangulate(mesh: Mesh, image_shape, axis_name: str = "data"):
    """Triangulation with the frame axis sharded across devices.

    The DLT of every (frame, joint) is independent — the classic
    sequence-parallel case: zero collectives in the forward pass.
    """
    rep = mesh_mod.replicated_sharding(mesh)
    p2_sharding = NamedSharding(mesh, P(None, axis_name, None, None))
    out_sharding = NamedSharding(mesh, P(axis_name, None, None))

    @partial(
        jax.jit,
        in_shardings=(p2_sharding, rep, rep, rep),
        out_shardings=out_sharding,
    )
    def tri(points2d, R, tvec, intr):
        return geometry.triangulate(points2d, R, tvec, intr, image_shape)

    return tri


# ------------------------------------------------- batched LM over recordings


def make_batched_calibration(image_shape, max_iters: int = 20):
    """vmapped Levenberg–Marquardt: calibrate N recordings in one program.

    Input: cams0 (B, C, 6), pts0 (B, N, 3), K (B, C, 3, 3), dist (B, C, 5),
    obs (B, C, N, 2), mask (B, C, N).
    """
    from deepfly3d_tpu.ops.bundle_adjust import _lm_solve

    @jax.jit
    def calibrate(cams0, pts0, K, dist, obs, mask):
        return jax.vmap(
            lambda c, p, k, d, o, m: _lm_solve(c, p, k, d, o, m, max_iters=max_iters)
        )(cams0, pts0, K, dist, obs, mask)

    return calibrate
