"""Stacked-hourglass 2D keypoint network (Flax, NHWC, bf16-ready).

TPU-native reimplementation of the capability provided by the external
``df2d`` package (stacked hourglass per Newell et al. 1603.06937; invoked by
reference df3d/core.py:177-185 with num_stacks=2 and 19 output channels,
reference df3d/config.py:33-36, heatmaps 64x128, config.py:18).

Design choices for TPU:

* NHWC layout — XLA's native convolution layout on TPU.
* Pre-activation bottleneck residuals (BN -> ReLU -> conv), channels kept at
  multiples of 8/128 lanes where sizes allow.
* ``compute_dtype`` switches the trunk to bfloat16 (MXU native) while
  parameters and batch-norm statistics stay float32; the heatmap head and
  decode run in float32 (the reference contract's 0.002 confidence tolerance
  demands f32 peaks).
* Nearest-neighbor upsampling via reshape-broadcast (cheap on VPU) instead
  of gather-based interpolation.
* No Python-level data-dependent control flow — the whole forward is one
  XLA program; stacks unroll statically.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class HourglassSpec:
    """Architecture hyperparameters."""

    num_stacks: int = 2
    features: int = 64          # trunk width
    depth: int = 4              # hourglass recursion depth
    num_blocks: int = 1         # residual blocks per stage
    num_classes: int = 19       # output heatmap channels
    expansion: int = 2          # bottleneck output = mid * expansion
    # Skip-projection input convention for width-changing Bottlenecks.
    # False (this repo's native nets): project the pre-activated tensor
    # relu(bn1(x)).  True (canonical torch stacked-hourglass lineage,
    # pytorch-pose style — what df2d's sh8 checkpoints follow): project
    # the RAW block input x.  Checkpoints converted from torch must set
    # True or the width-changing blocks compute a different function
    # (tests/test_convert_torch_forward.py pins this forward-parity).
    proj_from_raw: bool = False
    compute_dtype: Any = jnp.float32
    bn_momentum: float = 0.99   # batch-stat EMA; 0.0 = adopt batch stats
    # "conv": 7x7/2 conv + residual + pool (the classic hourglass stem —
    #         its high-res convs run at ~14% of the TPU conv roofline and
    #         dominated the round-1 profile);
    # "patchify": non-overlapping 4x4 patch embedding, one (HW/16, 48) x
    #         (48, features) matmul straight onto the MXU — goes directly
    #         to heatmap resolution with zero high-res convolutions.
    # "patch8": overlapping 8x8 stride-4 embedding (one strided conv to
    #         heatmap resolution). The non-overlapping 4x4 embed destroys
    #         sub-patch phase — a 1-px input shift changes patch contents
    #         discontinuously, which caps exact argmax-cell accuracy; the
    #         2x-overlap restores cross-patch context for ~10% more FLOPs.
    # "patch16": overlapping 16x16 stride-8 embedding — the trunk runs at
    #         1/8 resolution (4x fewer cells than the /4 stems, ~4x less
    #         trunk compute); pair with head_upsample=2 so the heatmap
    #         head still emits input/4-resolution maps via a subpixel
    #         (depth-to-space) decode.
    stem: str = "conv"
    # heatmap head upsampling factor: the score conv predicts
    # classes*u^2 channels at trunk resolution which depth-to-space
    # rearranges to (H*u, W*u, classes) — each output cell gets its own
    # linear predictor, so argmax-cell precision is learned, not
    # interpolated.  1 = classic head (heatmaps at trunk resolution).
    head_upsample: int = 1
    # score conv spatial extent (k x k, SAME zero padding).  1 = classic
    # per-cell linear read-out.  3 widens each score read-out to the 3x3
    # feature neighborhood: 9x the per-joint parameters at negligible
    # FLOP cost (the score conv is <1% of the forward), which gives the
    # TPU score-head calibration (scripts/calibrate_score_head.py)
    # enough capacity to interpolate the golden confidences exactly.
    score_ksize: int = 1
    # (h, w) the weights were trained at.  Convolutions are shape-
    # polymorphic but golden parity only holds at the training resolution,
    # so checkpoints carry it and consumers treat it as the source of
    # truth (None = legacy checkpoint; callers fall back to their config).
    input_shape: Optional[Tuple[int, int]] = None
    # Late-layer matmul precision pinning (TPU-only concern): float32
    # convolutions default to a fast single-pass bf16 MXU mode whose
    # rounding adds ~+0.0003 confidence drift vs the golden contract
    # (docs/ARCHITECTURE.md precision ladder).  Drift accumulates through
    # the forward, so pinning only the LATE layers buys back most of the
    # precision at a fraction of the full-"highest" slowdown.  ``hp_scope``
    # pins every conv from a point in the forward onward to
    # ``hp_precision``:
    #   None     - no pinning (XLA default everywhere)
    #   "score"  - the f32 score heads only
    #   "head"   - the final stack's head (feat_res onward)
    #   "stack"  - the final hourglass onward
    #   "all"    - every conv
    # Serialized by save_weights only when set: a score-head-calibrated
    # checkpoint (scripts/calibrate_score_head.py) is only valid under
    # the pinning policy it was calibrated for, so the artifact carries
    # its own deployment policy.
    hp_scope: Optional[str] = None
    hp_precision: str = "highest"
    # Deployment-policy dtype for the uint8->resized-frame preprocess
    # (ops/image.preprocess_frames).  The resize is two dense matmuls
    # (~1.5 GFLOP/image at 480x960->256x512) feeding a trunk that casts
    # to bf16 anyway — at the calibrated-p16 throughput the f32
    # preprocess is the LARGEST FLOP consumer in the whole pipeline
    # (~57% by XLA cost analysis).  "bfloat16" halves it; the extra
    # rounding is deterministic, so a score-head calibration performed
    # under this policy absorbs it (the checkpoint carries the field,
    # like hp_scope, because the calibration is only valid under the
    # preprocess it was fit through).
    preprocess_dtype: str = "float32"


def _resolve_precision(name: str):
    return {
        "high": jax.lax.Precision.HIGH,        # ~bf16_3x ("tensorfloat32")
        "highest": jax.lax.Precision.HIGHEST,  # ~bf16_6x (full f32)
    }[name]


class Bottleneck(nn.Module):
    """Pre-activation bottleneck residual block."""

    features: int               # output channels
    dtype: Any = jnp.float32
    momentum: float = 0.99
    precision: Any = None       # matmul precision for this block's convs
    proj_from_raw: bool = False  # see HourglassSpec.proj_from_raw

    def _bn(self, name, train):
        return nn.BatchNorm(
            use_running_average=not train, dtype=self.dtype,
            momentum=self.momentum, name=name,
        )

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = self.features // 2
        residual = x
        y = self._bn("bn1", train)(x)
        y = nn.relu(y)
        # project the skip when widths differ: from the post-activation
        # tensor (native) or the raw input (torch lineage; see spec)
        if x.shape[-1] != self.features:
            residual = nn.Conv(self.features, (1, 1), use_bias=True,
                               dtype=self.dtype, precision=self.precision,
                               name="proj")(x if self.proj_from_raw else y)
        y = nn.Conv(mid, (1, 1), use_bias=True, dtype=self.dtype,
                    precision=self.precision, name="conv1")(y)
        y = self._bn("bn2", train)(y)
        y = nn.relu(y)
        y = nn.Conv(mid, (3, 3), padding=1, use_bias=True, dtype=self.dtype,
                    precision=self.precision, name="conv2")(y)
        y = self._bn("bn3", train)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (1, 1), use_bias=True, dtype=self.dtype,
                    precision=self.precision, name="conv3")(y)
        return y + residual


def _upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """NHWC nearest 2x upsample via broadcast (no gathers)."""
    n, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


class Hourglass(nn.Module):
    """Recursive encoder/decoder with skip residuals at every level."""

    features: int
    depth: int
    num_blocks: int
    dtype: Any = jnp.float32
    momentum: float = 0.99
    precision: Any = None
    proj_from_raw: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        def blocks(y, name):
            for i in range(self.num_blocks):
                y = Bottleneck(self.features, dtype=self.dtype,
                               momentum=self.momentum,
                               precision=self.precision,
                               proj_from_raw=self.proj_from_raw,
                               name=f"{name}{i}")(y, train)
            return y

        def level(y, d):
            skip = blocks(y, f"skip_d{d}_")
            down = nn.max_pool(y, (2, 2), strides=(2, 2))
            down = blocks(down, f"down_d{d}_")
            if d > 1:
                inner = level(down, d - 1)
            else:
                inner = blocks(down, "innermost_")
            inner = blocks(inner, f"up_d{d}_")
            return skip + _upsample_nearest_2x(inner)

        return level(x, self.depth)


class HourglassNet(nn.Module):
    """Stem + stacked hourglasses with intermediate supervision.

    Returns heatmaps from every stack: (num_stacks, N, H/4, W/4, classes),
    in float32 regardless of compute dtype.
    """

    spec: HourglassSpec

    @nn.compact
    def __call__(self, x, train: bool = False):
        s = self.spec
        dt = s.compute_dtype
        mom = s.bn_momentum
        x = x.astype(dt)

        # late-layer precision pinning (see HourglassSpec.hp_scope)
        hp = _resolve_precision(s.hp_precision) if s.hp_scope else None
        scope = s.hp_scope
        stem_prec = hp if scope == "all" else None

        def stack_prec(i):
            """(trunk, head, score) precision for stack i."""
            last = i == s.num_stacks - 1
            trunk = hp if (scope == "all" or (scope == "stack" and last)) \
                else None
            head = hp if (trunk is not None
                          or (scope == "head" and last)) else None
            score = hp if (head is not None or scope == "score") else None
            return trunk, head, score

        if s.stem == "patch16":
            # overlapping embed straight to H/8 x W/8 (use head_upsample=2
            # to keep input/4-resolution heatmaps)
            y = nn.Conv(s.features, (16, 16), strides=(8, 8), padding=4,
                        use_bias=True, dtype=dt, precision=stem_prec,
                        name="patch_embed")(x)
            y = nn.BatchNorm(use_running_average=not train, dtype=dt,
                             momentum=mom, name="stem_bn")(y)
            y = nn.relu(y)
            y = Bottleneck(s.features, dtype=dt, momentum=mom,
                           proj_from_raw=s.proj_from_raw,
                           precision=stem_prec, name="stem_res2")(y, train)
            y = Bottleneck(s.features, dtype=dt, momentum=mom,
                           proj_from_raw=s.proj_from_raw,
                           precision=stem_prec, name="stem_res3")(y, train)
        elif s.stem == "patch8":
            # overlapping embed straight to H/4 x W/4
            y = nn.Conv(s.features, (8, 8), strides=(4, 4), padding=2,
                        use_bias=True, dtype=dt, precision=stem_prec,
                        name="patch_embed")(x)
            y = nn.BatchNorm(use_running_average=not train, dtype=dt,
                             momentum=mom, name="stem_bn")(y)
            y = nn.relu(y)
            y = Bottleneck(s.features, dtype=dt, momentum=mom,
                           proj_from_raw=s.proj_from_raw,
                           precision=stem_prec, name="stem_res2")(y, train)
            y = Bottleneck(s.features, dtype=dt, momentum=mom,
                           proj_from_raw=s.proj_from_raw,
                           precision=stem_prec, name="stem_res3")(y, train)
        elif s.stem == "patchify":
            # 4x4 space-to-depth + linear embed: one MXU matmul from pixels
            # to trunk features at H/4 x W/4, then two low-res residuals
            n, h, w, c = x.shape
            y = x.reshape(n, h // 4, 4, w // 4, 4, c)
            y = y.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 4, w // 4, 16 * c)
            y = nn.Conv(s.features, (1, 1), use_bias=True, dtype=dt,
                        name="patch_embed")(y)
            y = nn.BatchNorm(use_running_average=not train, dtype=dt,
                             momentum=mom, name="stem_bn")(y)
            y = nn.relu(y)
            y = Bottleneck(s.features, dtype=dt, momentum=mom,
                           proj_from_raw=s.proj_from_raw,
                           precision=stem_prec, name="stem_res2")(y, train)
            y = Bottleneck(s.features, dtype=dt, momentum=mom,
                           proj_from_raw=s.proj_from_raw,
                           precision=stem_prec, name="stem_res3")(y, train)
        else:
            # stem: /2 conv, residual, /2 pool, residuals -> features @ H/4
            y = nn.Conv(s.features // 2, (7, 7), strides=(2, 2), padding=3,
                        use_bias=True, dtype=dt, precision=stem_prec,
                        name="stem_conv")(x)
            y = nn.BatchNorm(use_running_average=not train, dtype=dt,
                             momentum=mom, name="stem_bn")(y)
            y = nn.relu(y)
            y = Bottleneck(s.features, dtype=dt, momentum=mom,
                           proj_from_raw=s.proj_from_raw,
                           precision=stem_prec, name="stem_res1")(y, train)
            y = nn.max_pool(y, (2, 2), strides=(2, 2))
            y = Bottleneck(s.features, dtype=dt, momentum=mom,
                           proj_from_raw=s.proj_from_raw,
                           precision=stem_prec, name="stem_res2")(y, train)
            y = Bottleneck(s.features, dtype=dt, momentum=mom,
                           proj_from_raw=s.proj_from_raw,
                           precision=stem_prec, name="stem_res3")(y, train)

        u = s.head_upsample
        outputs = []
        for i in range(s.num_stacks):
            p_trunk, p_head, p_score = stack_prec(i)
            hg = Hourglass(s.features, s.depth, s.num_blocks, dtype=dt,
                           momentum=mom, precision=p_trunk,
                           proj_from_raw=s.proj_from_raw,
                           name=f"hg{i}")(y, train)
            f = Bottleneck(s.features, dtype=dt, momentum=mom,
                           proj_from_raw=s.proj_from_raw,
                           precision=p_head, name=f"feat_res{i}")(hg, train)
            f = nn.Conv(s.features, (1, 1), use_bias=True, dtype=dt,
                        precision=p_head, name=f"feat_conv{i}")(f)
            f = nn.BatchNorm(use_running_average=not train, dtype=dt,
                             momentum=mom, name=f"feat_bn{i}")(f)
            f = nn.relu(f)
            ks = s.score_ksize
            raw = nn.Conv(s.num_classes * u * u, (ks, ks), use_bias=True,
                          padding="SAME", dtype=jnp.float32,
                          precision=p_score, name=f"score{i}")(
                f.astype(jnp.float32)
            )
            if u > 1:
                # subpixel decode: (N,H,W,u*u*K) -> (N,H*u,W*u,K); output
                # cell (h*u+dy, w*u+dx) reads channel block (dy*u+dx)
                n, hh, ww, _ = raw.shape
                score = (
                    raw.reshape(n, hh, ww, u, u, s.num_classes)
                    .transpose(0, 1, 3, 2, 4, 5)
                    .reshape(n, hh * u, ww * u, s.num_classes)
                )
            else:
                score = raw
            outputs.append(score)
            if i < s.num_stacks - 1:
                # re-inject features and predictions into the trunk (the
                # pre-shuffle channels carry the prediction at trunk
                # resolution, so re-injection is resolution-agnostic)
                y = (
                    y
                    + nn.Conv(s.features, (1, 1), use_bias=True, dtype=dt,
                              precision=p_trunk, name=f"remap_feat{i}")(f)
                    + nn.Conv(s.features, (1, 1), use_bias=True, dtype=dt,
                              precision=p_trunk,
                              name=f"remap_score{i}")(raw.astype(dt))
                )
        return jnp.stack(outputs)


def init_params(
    spec: HourglassSpec, input_shape: Tuple[int, int], rng: jax.Array
):
    """Initialize {params, batch_stats} for the given (h, w) input."""
    model = HourglassNet(spec)
    dummy = jnp.zeros((1, input_shape[0], input_shape[1], 3), jnp.float32)
    variables = model.init(rng, dummy, train=False)
    return variables


def save_weights(path: str, variables, spec: HourglassSpec) -> None:
    """Flat .npz checkpoint (portable, no orbax dir needed for small nets)."""
    import numpy as np
    from flax.traverse_util import flatten_dict

    flat = flatten_dict(variables, sep="/")
    arrays = {k: np.asarray(v) for k, v in flat.items()}
    meta = {
        "__spec__/num_stacks": spec.num_stacks,
        "__spec__/features": spec.features,
        "__spec__/depth": spec.depth,
        "__spec__/num_blocks": spec.num_blocks,
        "__spec__/num_classes": spec.num_classes,
        "__spec__/expansion": spec.expansion,
        "__spec__/bn_momentum": float(spec.bn_momentum),
        "__spec__/stem": spec.stem,
        "__spec__/head_upsample": spec.head_upsample,
    }
    if spec.input_shape is not None:
        meta["__spec__/input_shape"] = np.asarray(spec.input_shape, np.int64)
    if spec.hp_scope is not None:
        meta["__spec__/hp_scope"] = spec.hp_scope
        meta["__spec__/hp_precision"] = spec.hp_precision
    if spec.preprocess_dtype != "float32":
        meta["__spec__/preprocess_dtype"] = spec.preprocess_dtype
    if spec.score_ksize != 1:
        meta["__spec__/score_ksize"] = spec.score_ksize
    if spec.proj_from_raw:
        meta["__spec__/proj_from_raw"] = 1
    np.savez(path, **arrays, **{k: np.asarray(v) for k, v in meta.items()})


def load_weights(path: str):
    """-> (variables, HourglassSpec)."""
    import numpy as np
    from flax.traverse_util import unflatten_dict

    data = np.load(path)
    spec_kwargs = {}
    arrays = {}
    for k in data.files:
        if k.startswith("__spec__/"):
            field = k.split("/", 1)[1]
            if field == "input_shape":
                spec_kwargs[field] = tuple(int(v) for v in data[k])
                continue
            value = data[k].item()
            if field in ("stem", "hp_scope", "hp_precision",
                         "preprocess_dtype"):
                spec_kwargs[field] = str(value)
            elif field == "bn_momentum":
                spec_kwargs[field] = float(value)
            elif field == "proj_from_raw":
                spec_kwargs[field] = bool(int(value))
            else:
                spec_kwargs[field] = int(value)
        else:
            arrays[k] = jnp.asarray(data[k])
    spec = HourglassSpec(**spec_kwargs)
    variables = unflatten_dict(arrays, sep="/")
    return variables, spec
