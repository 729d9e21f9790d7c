"""Fused inference bottleneck — the hourglass hot kernel.

The stacked hourglass (reference df2d capability, see models/hourglass.py)
spends its whole forward in ~30 pre-activation bottleneck blocks:

    bn1 -> relu -> conv1(1x1, C->C/2) -> bn2 -> relu ->
    conv2(3x3, C/2->C/2) -> bn3 -> relu -> conv3(1x1, C/2->C) -> + residual

As separate XLA ops each block makes ~8 HBM round trips over the
activation tensor.  At inference batch-norm is a per-channel affine, so the
whole block collapses to three matmuls with folded scales and biases:

    a1 = relu(x * s1 + t1)                      # bn1 fused elementwise
    a2 = relu(a1 @ W1' + b1')                   # conv1 with bn2 folded in
    a3 = relu(conv3x3(a2, W2') + b2')           # conv2 with bn3 folded in
    y  = a3 @ W3 + b3 + residual                # conv3 + skip

This kernel computes the entire chain per image (group) with every
intermediate resident in VMEM: one HBM read of ``x``, one HBM write of
``y``.  The 3x3 convolution is nine shifted (M, Cmid) @ (Cmid, Cmid)
matmuls accumulated in float32 over a zero-padded VMEM scratch, so image
boundaries get the same zero padding as ``nn.Conv(padding=1)``.

Large images are processed in row chunks *inside* the kernel (the full
image block is already in VMEM, so chunk halos are free reads — no
overlapping BlockSpecs needed); small images are packed several per grid
program to keep the MXU fed.

Weight folding is done once on host by :func:`fold_bottleneck`; numerical
equivalence with the Flax ``Bottleneck`` is covered by
tests/test_fused_hourglass.py.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BN_EPS = 1e-5  # flax.linen.BatchNorm default


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def bn_affine(scale, bias, mean, var, eps: float = _BN_EPS):
    """BatchNorm at inference is x*s + t; return (s, t) as float32."""
    s = np.asarray(scale, np.float64) / np.sqrt(np.asarray(var, np.float64) + eps)
    t = np.asarray(bias, np.float64) - np.asarray(mean, np.float64) * s
    return s.astype(np.float32), t.astype(np.float32)


def fold_bottleneck(params: Dict, stats: Dict, dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
    """Fold the block's three BatchNorms into elementwise/conv parameters.

    ``params``/``stats`` are the Flax collections of one Bottleneck module
    (keys bn1..bn3, conv1..conv3, optional proj).  Returns arrays shaped for
    the kernel: s1/t1 (1, Cin); w1 (Cin, Cmid) with bn2 folded; w2
    (9, Cmid, Cmid) with bn3 folded; w3 (Cmid, Cout); biases (1, C).
    """
    s1, t1 = bn_affine(**params["bn1"], **stats["bn1"])
    s2, t2 = bn_affine(**params["bn2"], **stats["bn2"])
    s3, t3 = bn_affine(**params["bn3"], **stats["bn3"])

    w1 = np.asarray(params["conv1"]["kernel"], np.float64)[0, 0]     # (Cin, Cmid)
    b1 = np.asarray(params["conv1"]["bias"], np.float64)
    w1f = w1 * s2[None, :]
    b1f = b1 * s2 + t2

    w2 = np.asarray(params["conv2"]["kernel"], np.float64)           # (3,3,Cmid,Cmid)
    b2 = np.asarray(params["conv2"]["bias"], np.float64)
    w2f = (w2 * s3[None, None, None, :]).reshape(9, w2.shape[2], w2.shape[3])
    b2f = b2 * s3 + t3

    w3 = np.asarray(params["conv3"]["kernel"], np.float64)[0, 0]     # (Cmid, Cout)
    b3 = np.asarray(params["conv3"]["bias"], np.float64)

    out = {
        "s1": jnp.asarray(s1[None, :], dtype),
        "t1": jnp.asarray(t1[None, :], dtype),
        "w1": jnp.asarray(w1f, dtype),
        "b1": jnp.asarray(b1f[None, :], jnp.float32),
        "w2": jnp.asarray(w2f, dtype),
        "b2": jnp.asarray(b2f[None, :], jnp.float32),
        "w3": jnp.asarray(w3, dtype),
        "b3": jnp.asarray(b3[None, :], jnp.float32),
    }
    if "proj" in params:
        out["wp"] = jnp.asarray(
            np.asarray(params["proj"]["kernel"], np.float64)[0, 0], dtype
        )
        out["bp"] = jnp.asarray(
            np.asarray(params["proj"]["bias"], np.float64)[None, :], jnp.float32
        )
    return out


def _dotf32(a: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """(..., K) @ (K, M) with float32 accumulation on the MXU."""
    return jax.lax.dot_general(
        a, w,
        dimension_numbers=(((a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _plan(n: int, h: int, w: int) -> Tuple[int, int]:
    """-> (images per program, chunk rows): keep ~2048 matmul rows live."""
    rows = h * w
    if rows >= 2048:
        hc = max(2048 // w, 1)
        # chunk rows must tile H exactly (all resolutions here are powers of 2)
        while h % hc:
            hc -= 1
        return 1, hc
    ipp = max(2048 // rows, 1)
    while n % ipp:          # grid must tile the batch exactly
        ipp -= 1
    return ipp, h


def _block_kernel(
    x_ref, s1_ref, t1_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
    *rest,
    H: int, W: int, HC: int, cmid: int, has_proj: bool, cdtype,
):
    if has_proj:
        wp_ref, bp_ref, out_ref, a2p_ref = rest
    else:
        out_ref, a2p_ref = rest
    ipp = x_ref.shape[0]
    s1 = s1_ref[0]
    t1 = t1_ref[0]

    def a1_rows(r0, r1):
        x = x_ref[:, r0:r1]
        return jnp.maximum(x * s1 + t1, 0).astype(cdtype)

    for h0 in range(0, H, HC):
        h1 = h0 + HC
        # a2 on the chunk + its one-row halos (image borders are zeros)
        src0, src1 = max(h0 - 1, 0), min(h1 + 1, H)
        z1 = _dotf32(a1_rows(src0, src1), w1_ref[:]) + b1_ref[0]
        a2 = jnp.maximum(z1, 0).astype(cdtype)
        a2p_ref[...] = jnp.zeros_like(a2p_ref)
        off = src0 - (h0 - 1)
        a2p_ref[:, off:off + (src1 - src0), 1:W + 1, :] = a2
        # 3x3 conv as nine shifted matmuls, f32 accumulation
        acc = jnp.broadcast_to(b2_ref[0], (ipp, HC, W, cmid)).astype(jnp.float32)
        for k in range(9):
            dy, dx = divmod(k, 3)
            win = a2p_ref[:, dy:dy + HC, dx:dx + W, :]
            acc = acc + _dotf32(win, w2_ref[k])
        a3 = jnp.maximum(acc, 0).astype(cdtype)
        z3 = _dotf32(a3, w3_ref[:]) + b3_ref[0]
        if has_proj:
            res = _dotf32(a1_rows(h0, h1), wp_ref[:]) + bp_ref[0]
        else:
            res = x_ref[:, h0:h1].astype(jnp.float32)
        out_ref[:, h0:h1] = (z3 + res).astype(out_ref.dtype)


def _block_kernel_v2(
    x_ref, s1_ref, t1_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
    *rest,
    H: int, W: int, HC: int, cmid: int, has_proj: bool, cdtype,
):
    """im2col variant: the 3x3 conv is ONE (M, 9*Cmid) @ (9*Cmid, Cmid)
    matmul per chunk — full 128-lane contraction on the MXU instead of nine
    K=Cmid dots (w2 arrives pre-reshaped to (9*Cmid, Cmid))."""
    if has_proj:
        wp_ref, bp_ref, out_ref, a2p_ref, col_ref = rest
    else:
        out_ref, a2p_ref, col_ref = rest
    ipp = x_ref.shape[0]
    s1 = s1_ref[0]
    t1 = t1_ref[0]

    def a1_rows(r0, r1):
        x = x_ref[:, r0:r1]
        return jnp.maximum(x * s1 + t1, 0).astype(cdtype)

    for h0 in range(0, H, HC):
        h1 = h0 + HC
        src0, src1 = max(h0 - 1, 0), min(h1 + 1, H)
        z1 = _dotf32(a1_rows(src0, src1), w1_ref[:]) + b1_ref[0]
        a2 = jnp.maximum(z1, 0).astype(cdtype)
        a2p_ref[...] = jnp.zeros_like(a2p_ref)
        off = src0 - (h0 - 1)
        a2p_ref[:, off:off + (src1 - src0), 1:W + 1, :] = a2
        for k in range(9):
            dy, dx = divmod(k, 3)
            col_ref[:, :, :, k * cmid:(k + 1) * cmid] = (
                a2p_ref[:, dy:dy + HC, dx:dx + W, :]
            )
        acc = _dotf32(col_ref[...], w2_ref[:]) + b2_ref[0]
        a3 = jnp.maximum(acc, 0).astype(cdtype)
        z3 = _dotf32(a3, w3_ref[:]) + b3_ref[0]
        if has_proj:
            res = _dotf32(a1_rows(h0, h1), wp_ref[:]) + bp_ref[0]
        else:
            res = x_ref[:, h0:h1].astype(jnp.float32)
        out_ref[:, h0:h1] = (z3 + res).astype(out_ref.dtype)


def _block_kernel_v3(
    x_top_ref, x_mid_ref, x_bot_ref,
    s1_ref, t1_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
    *rest,
    HC: int, W: int, J: int, cmid: int, has_proj: bool, cdtype,
):
    """Row-tiled variant: grid (N, H/HC); halo rows come from the same array
    fetched under shifted block-index maps, so Mosaic's grid pipeline
    overlaps every tile's DMA with the previous tile's compute (the
    whole-image v1/v2 kernels serialize them, which is why they lose to
    XLA).  The 3x3 conv uses the v2 im2col single-dot formulation."""
    if has_proj:
        wp_ref, bp_ref, out_ref, a2p_ref, col_ref = rest
    else:
        out_ref, a2p_ref, col_ref = rest
    j = pl.program_id(1)
    s1 = s1_ref[0]
    t1 = t1_ref[0]

    def a1_of(rows):
        return jnp.maximum(rows * s1 + t1, 0).astype(cdtype)

    a1_mid = a1_of(x_mid_ref[0])                      # (HC, W, Cin)
    top = a1_of(x_top_ref[0, HC - 1:HC])              # (1, W, Cin)
    bot = a1_of(x_bot_ref[0, 0:1])
    top = jnp.where(j > 0, top, jnp.zeros_like(top))
    bot = jnp.where(j < J - 1, bot, jnp.zeros_like(bot))
    a1_ext = jnp.concatenate([top, a1_mid, bot], axis=0)   # (HC+2, W, Cin)

    z1 = _dotf32(a1_ext, w1_ref[:]) + b1_ref[0]
    a2 = jnp.maximum(z1, 0).astype(cdtype)            # (HC+2, W, Cmid)
    a2p_ref[...] = jnp.zeros_like(a2p_ref)
    a2p_ref[:, 1:W + 1, :] = a2
    for k in range(9):
        dy, dx = divmod(k, 3)
        col_ref[:, :, k * cmid:(k + 1) * cmid] = a2p_ref[dy:dy + HC, dx:dx + W, :]
    acc = _dotf32(col_ref[...], w2_ref[:]) + b2_ref[0]
    a3 = jnp.maximum(acc, 0).astype(cdtype)
    z3 = _dotf32(a3, w3_ref[:]) + b3_ref[0]
    if has_proj:
        res = _dotf32(a1_mid, wp_ref[:]) + bp_ref[0]
    else:
        res = x_mid_ref[0].astype(jnp.float32)
    out_ref[0] = (z3 + res).astype(out_ref.dtype)


def _block_kernel_v4(
    x_ref, xb_ref,
    s1_ref, t1_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
    *rest,
    HC: int, W: int, J: int, cmid: int, has_proj: bool, cdtype,
):
    """v4: row-tiled grid WITHOUT redundant halo traffic.

    The v3 post-mortem (docs/ARCHITECTURE.md) identified two costs that
    made the grid-pipelined kernel lose to XLA: (a) every x row was
    fetched THREE times (its own tile + both neighbours' halo blocks),
    and (b) im2col materialized a 9*Cmid-wide copy of a2.  v4 removes
    both:

    * TOP halo: TPU grid steps run sequentially per core and scratch
      persists across them — the last input row of tile j is stashed in
      ``carry_ref`` and read back as tile j+1's top halo (zero extra HBM
      traffic; masked to the conv's zero padding at image boundaries).
    * BOTTOM halo: a separate 1-row BlockSpec fetches only row
      (j+1)*HC — 1/HC extra traffic instead of a whole duplicate tile.
    * The 3x3 conv stays in the v1 shifted-dot formulation: nine
      (M, Cmid) @ (Cmid, Cmid) MXU dots accumulated in f32, no im2col
      copy.  Mosaic's grid pipeline double-buffers the x/out tiles, so
      tile DMA overlaps the previous tile's compute.
    """
    if has_proj:
        wp_ref, bp_ref, out_ref, a2p_ref, carry_ref = rest
    else:
        out_ref, a2p_ref, carry_ref = rest
    j = pl.program_id(1)
    s1 = s1_ref[0]
    t1 = t1_ref[0]

    def a1_of(rows):
        return jnp.maximum(rows * s1 + t1, 0).astype(cdtype)

    x_mid = x_ref[0]                                   # (HC, W, Cin)
    a1_mid = a1_of(x_mid)
    # top halo: previous tile's last row, carried in scratch (garbage at
    # j == 0 — masked to the zero padding of nn.Conv(padding=1))
    a1_top = a1_of(carry_ref[...])                     # (1, W, Cin)
    a1_top = jnp.where(j > 0, a1_top, jnp.zeros_like(a1_top))
    a1_bot = a1_of(xb_ref[0])                          # (1, W, Cin)
    a1_bot = jnp.where(j < J - 1, a1_bot, jnp.zeros_like(a1_bot))
    a1_ext = jnp.concatenate([a1_top, a1_mid, a1_bot], axis=0)

    z1 = _dotf32(a1_ext, w1_ref[:]) + b1_ref[0]
    a2 = jnp.maximum(z1, 0).astype(cdtype)             # (HC+2, W, Cmid)
    a2p_ref[...] = jnp.zeros_like(a2p_ref)
    a2p_ref[:, 1:W + 1, :] = a2
    acc = jnp.broadcast_to(b2_ref[0], (HC, W, cmid)).astype(jnp.float32)
    for k in range(9):
        dy, dx = divmod(k, 3)
        acc = acc + _dotf32(a2p_ref[dy:dy + HC, dx:dx + W, :], w2_ref[k])
    a3 = jnp.maximum(acc, 0).astype(cdtype)
    z3 = _dotf32(a3, w3_ref[:]) + b3_ref[0]
    if has_proj:
        res = _dotf32(a1_mid, wp_ref[:]) + bp_ref[0]
    else:
        res = x_mid.astype(jnp.float32)
    out_ref[0] = (z3 + res).astype(out_ref.dtype)
    # stash this tile's last row for the next tile's top halo
    carry_ref[...] = x_mid[HC - 1:HC]


def _fused_bottleneck_v4(x: jnp.ndarray, folded: Dict[str, jnp.ndarray],
                         interpret: Optional[bool] = None,
                         hc: Optional[int] = None) -> jnp.ndarray:
    """Launch _block_kernel_v4 on grid (N, H/HC)."""
    n, h, w, cin = x.shape
    cmid = folded["w1"].shape[1]
    cout = folded["w3"].shape[1]
    has_proj = "wp" in folded
    cdtype = x.dtype

    if hc is None:
        hc = max(min(4096 // w, h), 8)
    hc = min(hc, h)
    while h % hc:
        hc -= 1
    J = h // hc

    names = ["s1", "t1", "w1", "b1", "w2", "b2", "w3", "b3"]
    if has_proj:
        names += ["wp", "bp"]
    param_args = [folded[k] for k in names]
    param_specs = [
        pl.BlockSpec(folded[k].shape,
                     (lambda *_, nd=folded[k].ndim: (0,) * nd),
                     memory_space=pltpu.VMEM)
        for k in names
    ]

    def bot_idx(i, j):
        # 1-row block units: row index of the NEXT tile's first row
        return (i, jnp.minimum((j + 1) * hc, h - 1), 0, 0)

    kernel = partial(
        _block_kernel_v4, HC=hc, W=w, J=J, cmid=cmid, has_proj=has_proj,
        cdtype=cdtype,
    )
    return pl.pallas_call(
        kernel,
        grid=(n, J),
        in_specs=[
            pl.BlockSpec((1, hc, w, cin), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, w, cin), bot_idx, memory_space=pltpu.VMEM),
            *param_specs,
        ],
        out_specs=pl.BlockSpec((1, hc, w, cout), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, cout), cdtype),
        scratch_shapes=[
            pltpu.VMEM((hc + 2, w + 2, cmid), cdtype),
            pltpu.VMEM((1, w, cin), cdtype),
        ],
        interpret=_interpret() if interpret is None else interpret,
    )(x, x, *param_args)


@partial(jax.jit, static_argnames=("interpret", "version"))
def fused_bottleneck(x: jnp.ndarray, folded: Dict[str, jnp.ndarray],
                     interpret: Optional[bool] = None,
                     version: int = 1) -> jnp.ndarray:
    """Apply one folded bottleneck block to x (N, H, W, Cin) -> (N, H, W, Cout)."""
    n, h, w, cin = x.shape
    cmid = folded["w1"].shape[1]
    cout = folded["w3"].shape[1]
    has_proj = "wp" in folded
    if version not in (3, 4):
        # whole-image VMEM residency (v1/v2): reject blocks whose
        # lane-padded x/out blocks alone would blow the ~16MB budget
        lane = 128
        block_bytes = h * w * lane * x.dtype.itemsize * 2  # x + out, padded
        if block_bytes > 12 * 2**20:
            raise ValueError(
                f"fused_bottleneck: ({h}x{w}) image too large for "
                "single-program VMEM residency — use version=3 or "
                "bottleneck_xla for this block"
            )
    ipp, hc = _plan(n, h, w)
    cdtype = x.dtype

    if version == 3:
        return _fused_bottleneck_v3(
            x, dict(folded), interpret=interpret
        )
    if version == 4:
        return _fused_bottleneck_v4(x, dict(folded), interpret=interpret)

    folded = dict(folded)
    if version == 2:
        # pre-reshape taps for the single im2col dot
        folded["w2"] = folded["w2"].reshape(9 * cmid, cmid)

    names = ["s1", "t1", "w1", "b1", "w2", "b2", "w3", "b3"]
    if has_proj:
        names += ["wp", "bp"]
    param_args = [folded[k] for k in names]
    param_specs = [
        pl.BlockSpec(folded[k].shape,
                     (lambda *_, nd=folded[k].ndim: (0,) * nd),
                     memory_space=pltpu.VMEM)
        for k in names
    ]

    kernel_fn = _block_kernel if version == 1 else _block_kernel_v2
    kernel = partial(
        kernel_fn, H=h, W=w, HC=hc, cmid=cmid, has_proj=has_proj,
        cdtype=cdtype,
    )
    scratch = [pltpu.VMEM((ipp, hc + 2, w + 2, cmid), cdtype)]
    if version == 2:
        scratch.append(pltpu.VMEM((ipp, hc, w, 9 * cmid), cdtype))
    return pl.pallas_call(
        kernel,
        grid=(n // ipp,),
        in_specs=[
            pl.BlockSpec((ipp, h, w, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            *param_specs,
        ],
        out_specs=pl.BlockSpec((ipp, h, w, cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, cout), cdtype),
        scratch_shapes=scratch,
        interpret=_interpret() if interpret is None else interpret,
    )(x, *param_args)


def _fused_bottleneck_v3(x: jnp.ndarray, folded: Dict[str, jnp.ndarray],
                         interpret: Optional[bool] = None) -> jnp.ndarray:
    """Row-tiled launch of _block_kernel_v3 (grid (N, H/HC), halo via
    shifted block-index maps)."""
    n, h, w, cin = x.shape
    cmid = folded["w1"].shape[1]
    cout = folded["w3"].shape[1]
    has_proj = "wp" in folded
    cdtype = x.dtype
    folded["w2"] = folded["w2"].reshape(9 * cmid, cmid)

    hc = max(min(2048 // w, h), 8)
    while h % hc:
        hc -= 1
    J = h // hc

    names = ["s1", "t1", "w1", "b1", "w2", "b2", "w3", "b3"]
    if has_proj:
        names += ["wp", "bp"]
    param_args = [folded[k] for k in names]
    param_specs = [
        pl.BlockSpec(folded[k].shape,
                     (lambda *_, nd=folded[k].ndim: (0,) * nd),
                     memory_space=pltpu.VMEM)
        for k in names
    ]

    def xspec(shift):
        def idx(i, j):
            jj = jnp.clip(j + shift, 0, J - 1)
            return (i, jj, 0, 0)
        return pl.BlockSpec((1, hc, w, cin), idx, memory_space=pltpu.VMEM)

    kernel = partial(
        _block_kernel_v3, HC=hc, W=w, J=J, cmid=cmid, has_proj=has_proj,
        cdtype=cdtype,
    )
    return pl.pallas_call(
        kernel,
        grid=(n, J),
        in_specs=[xspec(-1), xspec(0), xspec(+1), *param_specs],
        out_specs=pl.BlockSpec((1, hc, w, cout), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, cout), cdtype),
        scratch_shapes=[
            pltpu.VMEM((hc + 2, w + 2, cmid), cdtype),
            pltpu.VMEM((hc, w, 9 * cmid), cdtype),
        ],
        interpret=_interpret() if interpret is None else interpret,
    )(x, x, x, *param_args)


def bottleneck_xla(x: jnp.ndarray, folded: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Plain-XLA oracle for the fused kernel (same folded parameters).

    Also the production path for blocks too large for single-image VMEM
    residency (the 128x256 stem block).
    """
    cdtype = x.dtype
    a1 = jnp.maximum(x * folded["s1"][0] + folded["t1"][0], 0).astype(cdtype)
    z1 = _dotf32(a1, folded["w1"]) + folded["b1"][0]
    a2 = jnp.maximum(z1, 0).astype(cdtype)
    w2 = folded["w2"].reshape(3, 3, *folded["w2"].shape[1:])
    z2 = jax.lax.conv_general_dilated(
        a2, w2, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ) + folded["b2"][0]
    a3 = jnp.maximum(z2, 0).astype(cdtype)
    z3 = _dotf32(a3, folded["w3"]) + folded["b3"][0]
    if "wp" in folded:
        res = _dotf32(a1, folded["wp"]) + folded["bp"][0]
    else:
        res = x.astype(jnp.float32)
    return (z3 + res).astype(cdtype)
