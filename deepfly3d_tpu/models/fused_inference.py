"""Folded-weight fused forward for the stacked hourglass (inference only).

Reproduces ``HourglassNet.__call__`` (models/hourglass.py) with every
batch-norm folded into its neighbouring convolution and every bottleneck
block executed by the single-pass Pallas kernel
(ops/pallas/bottleneck.fused_bottleneck) — one HBM read + one write per
block instead of ~8.  The glue between blocks (stem conv, max pools,
nearest-2x upsample + skip add, 1x1 heads) stays in XLA, which fuses those
fine on its own.

Two blocks intentionally stay on the XLA oracle path
(``bottleneck_xla``): the stem-resolution block (quarter-megapixel
activations don't fit a single-program VMEM working set).

Usage::

    folded = fold_hourglass(variables, spec, dtype=jnp.bfloat16)
    heatmaps = fused_apply(folded, spec, x)    # == model.apply(...) stack

Numerical parity with the Flax path is covered by
tests/test_fused_hourglass.py (exact-ish in f32; the production bf16 path
is validated end-to-end by the argmax-decode golden test tolerances).
"""

from __future__ import annotations


from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from deepfly3d_tpu.models.hourglass import HourglassSpec
from deepfly3d_tpu.ops.pallas.bottleneck import (
    bn_affine,
    bottleneck_xla,
    fold_bottleneck,
    fused_bottleneck,
)

# largest per-image VMEM working set the Pallas kernel should take on;
# blocks above this always run on the XLA path (the 128x256 stem block).
_MAX_FUSED_PIXELS = 64 * 128

# Block executor: "xla" (default) = folded-BN XLA graph — measured fastest
# on v5e (the Pallas kernel's shifted-window relayouts and K=32 matmuls
# currently lose to XLA's conv lowering; see docs/ARCHITECTURE.md perf
# notes).  "pallas" switches the per-block kernel back on for tuning.
import os as _os

_EXECUTOR = _os.environ.get("DF3D_FUSED_KERNEL", "xla")


def _fold_conv_bn(conv: Dict, bn_params: Dict, bn_stats: Dict, dtype):
    """conv -> bn folds into the conv: W' = W*s (out channels), b' = b*s + t."""
    s, t = bn_affine(**bn_params, **bn_stats)
    w = np.asarray(conv["kernel"], np.float64) * s.reshape(
        (1,) * (np.asarray(conv["kernel"]).ndim - 1) + (-1,)
    )
    b = np.asarray(conv["bias"], np.float64) * s + t
    return jnp.asarray(w, dtype), jnp.asarray(b, jnp.float32)


def fold_hourglass(variables: Dict, spec: HourglassSpec, dtype=jnp.float32) -> Dict:
    """One-time host-side folding of a trained HourglassNet checkpoint."""
    params = variables["params"]
    stats = variables["batch_stats"]

    def fold_block(name: str) -> Dict[str, jnp.ndarray]:
        return fold_bottleneck(params[name], stats[name], dtype=dtype)

    folded: Dict[str, Any] = {"blocks": {}}
    folded["stem_w"], folded["stem_b"] = _fold_conv_bn(
        params["stem_conv"], params["stem_bn"], stats["stem_bn"], dtype
    )
    for name in ("stem_res1", "stem_res2", "stem_res3"):
        folded["blocks"][name] = fold_block(name)

    def walk_hourglass(prefix: str, d: int):
        for i in range(spec.num_blocks):
            for kind in ("skip", "down", "up"):
                nm = f"{prefix}/{kind}_d{d}_{i}"
                folded["blocks"][nm] = fold_bottleneck(
                    params[prefix][f"{kind}_d{d}_{i}"],
                    stats[prefix][f"{kind}_d{d}_{i}"], dtype=dtype,
                )
        if d > 1:
            walk_hourglass(prefix, d - 1)
        else:
            for i in range(spec.num_blocks):
                nm = f"{prefix}/innermost_{i}"
                folded["blocks"][nm] = fold_bottleneck(
                    params[prefix][f"innermost_{i}"],
                    stats[prefix][f"innermost_{i}"], dtype=dtype,
                )

    folded["stacks"] = []
    for s_idx in range(spec.num_stacks):
        hg = f"hg{s_idx}"
        walk_hourglass(hg, spec.depth)
        folded["blocks"][f"feat_res{s_idx}"] = fold_block(f"feat_res{s_idx}")
        stack: Dict[str, Any] = {}
        fw, stack["feat_b"] = _fold_conv_bn(
            params[f"feat_conv{s_idx}"], params[f"feat_bn{s_idx}"],
            stats[f"feat_bn{s_idx}"], dtype,
        )
        stack["feat_w"] = fw[0, 0]          # 1x1 conv kernel -> (Cin, Cout)
        stack["score_w"] = jnp.asarray(
            np.asarray(params[f"score{s_idx}"]["kernel"])[0, 0], jnp.float32
        )
        stack["score_b"] = jnp.asarray(
            params[f"score{s_idx}"]["bias"], jnp.float32
        )
        if s_idx < spec.num_stacks - 1:
            stack["remap_feat_w"] = jnp.asarray(
                np.asarray(params[f"remap_feat{s_idx}"]["kernel"])[0, 0], dtype
            )
            stack["remap_feat_b"] = jnp.asarray(
                params[f"remap_feat{s_idx}"]["bias"], dtype
            )
            stack["remap_score_w"] = jnp.asarray(
                np.asarray(params[f"remap_score{s_idx}"]["kernel"])[0, 0], dtype
            )
            stack["remap_score_b"] = jnp.asarray(
                params[f"remap_score{s_idx}"]["bias"], dtype
            )
        folded["stacks"].append(stack)
    return folded


def _block(x: jnp.ndarray, folded_block: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    if _EXECUTOR == "pallas" and x.shape[1] * x.shape[2] <= _MAX_FUSED_PIXELS:
        return fused_bottleneck(x, folded_block)
    return bottleneck_xla(x, folded_block)


def _maxpool2(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, jnp.array(-jnp.inf, x.dtype), jax.lax.max,
        (1, 2, 2, 1), (1, 2, 2, 1), "VALID",
    )


def _upsample2_add(inner: jnp.ndarray, skip: jnp.ndarray) -> jnp.ndarray:
    n, h, w, c = inner.shape
    up = jnp.broadcast_to(
        inner[:, :, None, :, None, :], (n, h, 2, w, 2, c)
    ).reshape(n, 2 * h, 2 * w, c)
    return skip + up


def _dot1x1(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    y = jax.lax.dot_general(
        x, w, (((3,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    return y + b


def fused_apply(folded: Dict, spec: HourglassSpec, x: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, 3) f32/bf16 -> stacked heatmaps (num_stacks, N, H/4, W/4, K).

    Same output contract as ``HourglassNet.apply(variables, x, train=False)``.
    """
    dt = folded["stem_w"].dtype
    blocks = folded["blocks"]
    x = x.astype(dt)

    y = jax.lax.conv_general_dilated(
        x, folded["stem_w"], window_strides=(2, 2), padding=((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ) + folded["stem_b"]
    y = jnp.maximum(y, 0).astype(dt)
    y = _block(y, blocks["stem_res1"])
    y = _maxpool2(y)
    y = _block(y, blocks["stem_res2"])
    y = _block(y, blocks["stem_res3"])

    def level(y: jnp.ndarray, prefix: str, d: int) -> jnp.ndarray:
        skip = y
        for i in range(spec.num_blocks):
            skip = _block(skip, blocks[f"{prefix}/skip_d{d}_{i}"])
        down = _maxpool2(y)
        for i in range(spec.num_blocks):
            down = _block(down, blocks[f"{prefix}/down_d{d}_{i}"])
        if d > 1:
            inner = level(down, prefix, d - 1)
        else:
            inner = down
            for i in range(spec.num_blocks):
                inner = _block(inner, blocks[f"{prefix}/innermost_{i}"])
        for i in range(spec.num_blocks):
            inner = _block(inner, blocks[f"{prefix}/up_d{d}_{i}"])
        return _upsample2_add(inner, skip)

    outputs = []
    for s_idx in range(spec.num_stacks):
        stack = folded["stacks"][s_idx]
        hg = level(y, f"hg{s_idx}", spec.depth)
        f = _block(hg, blocks[f"feat_res{s_idx}"])
        f = jnp.maximum(_dot1x1(f, stack["feat_w"], stack["feat_b"]), 0).astype(dt)
        score = jax.lax.dot_general(
            f.astype(jnp.float32), stack["score_w"],
            (((3,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ) + stack["score_b"]
        outputs.append(score)
        if s_idx < spec.num_stacks - 1:
            y = (
                y
                + _dot1x1(f, stack["remap_feat_w"],
                          stack["remap_feat_b"].astype(jnp.float32)).astype(dt)
                + _dot1x1(score.astype(dt), stack["remap_score_w"],
                          stack["remap_score_b"].astype(jnp.float32)).astype(dt)
            )
    return jnp.stack(outputs)
