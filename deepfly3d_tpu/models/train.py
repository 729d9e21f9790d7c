"""Hourglass training (TPU).

The reference ships pretrained torch weights through the df2d pip package
(``weights/sh8_deepfly.tar``, reference df3d/config.py:30-32 — the file is
not in the repo).  This module trains our Flax hourglass directly: heatmap
MSE with intermediate supervision across stacks, plus an explicit
peak-amplitude term so decoded confidences match the heatmap-maximum
contract (reference README.md:404, tested at atol 0.002,
tests/test_df3d.py:173-179).

Used both to (re)produce the golden-parity fly weights on the bundled
sample recording and as the generic supervised trainer for new datasets —
the train step is pjit-shardable over a device mesh (see
deepfly3d_tpu/parallel/).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from deepfly3d_tpu.models.hourglass import HourglassNet, HourglassSpec


# ---------------------------------------------------------------- targets


def render_target_heatmaps(
    coords_rowcol: np.ndarray,     # (N, K, 2) normalized, NETWORK frame
    peak_values: np.ndarray,       # (N, K)
    known: np.ndarray,             # (N, K) bool — coords valid
    heatmap_shape: Tuple[int, int],
    sigma: float = 1.5,
    subpixel: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Gaussian target heatmaps with peak == confidence target.

    Unknown-position channels get their peak at the heatmap center — the
    decode contract only constrains their *maximum value*, not its location
    (e.g. the middle camera's predictions are discarded by the reference
    postprocess, core.py:190-191, yet their confidences are kept).
    Returns (heatmaps (N, H, W, K), peak_cells (N, K, 2) int).

    ``subpixel=False`` (the fly golden contract) centers each Gaussian ON
    the rounded argmax cell — sub-cell position is deliberately quantized
    away because the golden 2D points live exactly on the heatmap grid.
    ``subpixel=True`` centers the Gaussian at the TRUE real-valued
    position and rescales so the value at the rounded cell (the discrete
    max) still equals ``peak_values`` — the peak/max losses stay
    consistent, and decode_softargmax can recover sub-cell position from
    the trained maps (without this, soft-argmax can only ever refine back
    to the quantized cell center).
    """
    H, W = heatmap_shape
    N, K = peak_values.shape
    rows_f = np.where(known, coords_rowcol[..., 0] * H, float(H // 2))
    cols_f = np.where(known, coords_rowcol[..., 1] * W, float(W // 2))
    rows = np.clip(np.round(rows_f).astype(int), 0, H - 1)
    cols = np.clip(np.round(cols_f).astype(int), 0, W - 1)
    if not subpixel:
        rows_f, cols_f = rows.astype(np.float64), cols.astype(np.float64)
    yy = np.arange(H)[:, None]
    xx = np.arange(W)[None, :]
    hm = np.zeros((N, H, W, K), dtype=np.float32)
    # scale so the discrete max (at the rounded cell, the grid point
    # nearest the center) equals peak_values exactly
    at_cell = np.exp(
        -0.5 * ((rows - rows_f) ** 2 + (cols - cols_f) ** 2) / sigma**2
    )
    amp = peak_values / np.maximum(at_cell, 1e-12)
    for n in range(N):
        d2 = (yy[None] - rows_f[n][:, None, None]) ** 2 + (
            xx[None] - cols_f[n][:, None, None]
        ) ** 2  # (K, H, W)
        g = np.exp(-0.5 * d2 / sigma**2) * amp[n][:, None, None]
        hm[n] = g.transpose(1, 2, 0)
    return hm, np.stack([rows, cols], axis=-1)


def golden_training_targets(
    points2d_38: np.ndarray,       # (C, T, 38, 2) golden normalized (row, col)
    conf: np.ndarray,              # (C, T, 19, 1)
    camera_ordering: Sequence[int],
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Invert the reference postprocess (core.py:189-203) to per-camera
    19-channel network-frame targets.

    Returns (coords (C, T, 19, 2), peaks (C, T, 19), known (C, T, 19)).
    Right-side cameras' columns are re-flipped (the network sees mirrored
    images); channels whose positions the postprocess destroyed (middle
    camera, zeroed stripe channels) are marked unknown.
    """
    order = list(camera_ordering)
    C, T = points2d_38.shape[:2]
    side = points2d_38.shape[2] // 2
    coords = np.zeros((C, T, side, 2), dtype=np.float64)
    known = np.zeros((C, T, side), dtype=bool)
    for pos, cam in enumerate(order):
        if pos <= 2:
            stored = points2d_38[cam, :, :side]
            coords[cam] = stored
            known[cam] = stored.any(axis=-1)
        elif pos >= 4:
            stored = points2d_38[cam, :, side:]
            net = stored.copy()
            net[..., 1] = 1.0 - net[..., 1]   # undo the unflip
            coords[cam] = net
            # artifact entries are stored as (0, 1) -> net (0, 0): unknown
            known[cam] = net.any(axis=-1)
        # pos == 3: all unknown
    peaks = conf[..., 0].astype(np.float64)
    return coords, peaks, known


# --------------------------------------------------------- BN recalibration


def recalibrate_batch_stats(variables, spec: HourglassSpec, images_f32):
    """Replace EMA batch-norm statistics with exact full-dataset statistics.

    One momentum-0 training-mode pass over the whole (device-resident)
    dataset; closes the train/eval BN gap that otherwise caps golden-parity
    accuracy after heavy overfitting.
    """
    spec0 = dataclasses.replace(spec, bn_momentum=0.0)
    model = HourglassNet(spec0)
    _, updates = model.apply(
        variables, jnp.asarray(images_f32), train=True, mutable=["batch_stats"]
    )
    return {"params": variables["params"], "batch_stats": updates["batch_stats"]}


# ------------------------------------------------------------------ trainer


@dataclasses.dataclass
class TrainConfig:
    learning_rate: float = 2.5e-3
    steps: int = 6000
    batch_size: int = 16
    sigma: float = 1.5
    peak_loss_weight: float = 30.0
    warmup: int = 200
    seed: int = 0
    noise_scale: float = 0.0   # uniform pixel jitter (input units, ~1/255)
    freeze_bn: bool = False    # train against inference-time BN statistics
    mse_weight: float = 1.0    # heatmap-shape loss; lower it in the final
                               # conf fine-tune (shape fights exact peaks)
    shift_aug: int = 0         # max random horizontal shift in HEATMAP
                               # cells per step (input rolls 4x that).
                               # Forces translation equivariance the fixed
                               # augmentation pools cannot: a finite pool
                               # can be memorized variant-by-variant, a
                               # fresh shift every step cannot.
    gain_aug: float = 0.0      # random brightness gain per step: inputs
                               # scale by 1 + U(-g, g).  Points-robustness
                               # under ±5% gain is a held-out bench probe;
                               # value (conf) invariance under gain is NOT
                               # demanded by any contract, but from-scratch
                               # training absorbs the mild value pressure
                               # fine (the measured conf-collapse was a
                               # fine-tune-on-a-memorized-seed phenomenon)


def make_train_epoch(
    spec: HourglassSpec,
    tx,
    peak_loss_weight: float = 30.0,
    steps_per_call: int = 100,
    batch_size: int = 16,
    noise_scale: float = 0.0,
    freeze_bn: bool = False,
    mse_weight: float = 1.0,
    shift_aug: int = 0,
    gain_aug: float = 0.0,
):
    """Build a jitted multi-step trainer: ``lax.scan`` over `steps_per_call`
    optimizer steps with on-device batch sampling.

    One dispatch per `steps_per_call` steps — essential here because the TPU
    sits behind a high-latency tunnel; per-step Python dispatch would
    dominate wall-clock (measured ~2 s/step vs ~ms of compute).
    """

    model = HourglassNet(spec)

    def loss_fn(params, batch_stats, images, targets, peak_cells, peak_vals):
        if freeze_bn:
            # normalize with the fixed statistics used at inference time —
            # train and eval become the same function, eliminating the
            # batch-vs-running-stats gap in the final parity fine-tune
            heatmaps = model.apply(
                {"params": params, "batch_stats": batch_stats},
                images,
                train=False,
            )
            updates = {"batch_stats": batch_stats}
        else:
            heatmaps, updates = model.apply(
                {"params": params, "batch_stats": batch_stats},
                images,
                train=True,
                mutable=["batch_stats"],
            )  # (S, N, H, W, K)
        # peak-weighted MSE: plain MSE under-penalizes stray blobs at wrong
        # limbs (tiny area vs the background) — upweight the target blob.
        # Clamp: self-distillation targets are raw score maps and can be
        # negative; a negative weight would reward error there.
        w = 1.0 + 20.0 * jnp.maximum(targets[None], 0.0)
        mse = jnp.mean(w * (heatmaps - targets[None]) ** 2)

        last = heatmaps[-1]
        N, H, W, K = last.shape
        n_idx = jnp.arange(N)[:, None]
        k_idx = jnp.arange(K)[None, :]
        pred_cell = last[n_idx, peak_cells[..., 0], peak_cells[..., 1], k_idx]
        pred_max = jnp.max(last, axis=(1, 2))          # (N, K)
        # the decode contract is an argmax: (a) the target cell's value must
        # equal the golden confidence, (b) the target cell must BE the
        # global max — (pred_max - pred_cell) >= 0 with equality iff so.
        peak_sq = (pred_cell - peak_vals) ** 2
        peak_err = jnp.mean(peak_sq)
        # the decode contract is on the global max itself — supervise it too
        # (pulls down neighbor pixels that edge past the target cell)
        max_sq = (pred_max - peak_vals) ** 2
        max_err = jnp.mean(max_sq)
        # the acceptance criterion is a MAX over observations, so the mean
        # alone plateaus with a few stubborn cells above tolerance — attack
        # the worst offenders directly
        worst = jnp.max(peak_sq) + jnp.max(max_sq)
        dominance = jnp.mean(pred_max - pred_cell)
        loss = (
            mse_weight * mse
            + peak_loss_weight * (peak_err + max_err + worst)
            + 10.0 * dominance
        )
        return loss, (updates["batch_stats"], mse, peak_err)

    def one_step(carry, rng):
        params, batch_stats, opt_state, images, targets, cells, peaks = carry
        rng_idx, rng_noise, rng_shift, rng_gain = jax.random.split(rng, 4)
        if batch_size >= images.shape[0]:
            # full-batch: deterministic gradient on the true objective —
            # the worst-offender max terms see EVERY observation each step
            # (the endgame tool for the last stubborn cells; minibatch
            # maxima only sample them)
            idx = jnp.arange(images.shape[0])
        else:
            idx = jax.random.randint(
                rng_idx, (batch_size,), 0, images.shape[0]
            )
        batch_images = images[idx]
        batch_targets = targets[idx]
        batch_cells = cells[idx]
        if shift_aug > 0:
            # one fresh horizontal shift per step, input and supervision
            # rolled together: the input moves 4*k pixels (network frame),
            # the heatmap target and its peak cell move k cells.  Because
            # the shift is resampled every step, the only solution that
            # fits all steps is a translation-equivariant one — the
            # mechanism behind the ±px-shift robustness probes
            # (bench.load_probe_frames) that a fixed pool cannot force.
            k = jax.random.randint(rng_shift, (), -shift_aug, shift_aug + 1)
            batch_images = jnp.roll(batch_images, 4 * k, axis=2)
            batch_targets = jnp.roll(batch_targets, k, axis=2)
            W_hm = batch_targets.shape[2]
            batch_cells = batch_cells.at[..., 1].set(
                (batch_cells[..., 1] + k) % W_hm
            )
        if gain_aug > 0:
            # brightness-gain jitter (one gain per step): the bench's
            # ±5% gain probes are points-gated; training under a fresh
            # gain each step makes argmax positions gain-stable
            gain = 1.0 + jax.random.uniform(
                rng_gain, (), minval=-gain_aug, maxval=gain_aug
            )
            batch_images = batch_images * gain
        if noise_scale > 0:
            # pixel jitter for robustness to JPEG re-encoding (the CLI's
            # video-expansion path re-compresses frames)
            batch_images = batch_images + jax.random.uniform(
                rng_noise, batch_images.shape, minval=-noise_scale,
                maxval=noise_scale,
            )
        (loss, (new_stats, mse, peak_err)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, batch_stats, batch_images, batch_targets, batch_cells, peaks[idx])
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (
            params, new_stats, opt_state, images, targets, cells, peaks
        ), (loss, mse, peak_err)

    @jax.jit
    def train_epoch(params, batch_stats, opt_state, rng, images, targets, cells, peaks):
        rngs = jax.random.split(rng, steps_per_call)
        carry, metrics = jax.lax.scan(
            one_step,
            (params, batch_stats, opt_state, images, targets, cells, peaks),
            rngs,
        )
        params, batch_stats, opt_state = carry[:3]
        loss, mse, peak_err = (m[-1] for m in metrics)
        return params, batch_stats, opt_state, loss, mse, peak_err

    return train_epoch


def train_overfit(
    images_f32: np.ndarray,        # (N, h, w, 3) already preprocessed inputs
    target_heatmaps: np.ndarray,   # (N, H, W, K)
    peak_cells: np.ndarray,        # (N, K, 2)
    peak_vals: np.ndarray,         # (N, K)
    spec: HourglassSpec,
    cfg: TrainConfig = TrainConfig(),
    eval_fn=None,
    eval_every: int = 500,
    init_variables=None,
    keep_best: Optional[str] = None,   # eval metric to minimize
):
    """Fit the network to a fixed dataset (resident on device)."""
    rng = jax.random.PRNGKey(cfg.seed)
    resumed = init_variables is not None
    if init_variables is None:
        model = HourglassNet(spec)
        init_variables = model.init(
            rng, jnp.zeros((1,) + images_f32.shape[1:], jnp.float32), train=False
        )
    params, batch_stats = init_variables["params"], init_variables["batch_stats"]

    warmup = min(cfg.warmup, max(cfg.steps // 4, 1))
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, cfg.learning_rate, warmup, cfg.steps
    )
    tx = optax.adam(schedule)
    opt_state = tx.init(params)

    steps_per_call = min(eval_every, cfg.steps)
    train_epoch = make_train_epoch(
        spec, tx, cfg.peak_loss_weight, steps_per_call, cfg.batch_size,
        cfg.noise_scale, cfg.freeze_bn, cfg.mse_weight, cfg.shift_aug,
        cfg.gain_aug,
    )

    images_d = jnp.asarray(images_f32)
    targets_d = jnp.asarray(target_heatmaps)
    cells_d = jnp.asarray(peak_cells)
    peaks_d = jnp.asarray(peak_vals, dtype=jnp.float32)

    key = rng
    history = []
    step = 0
    best = None
    best_vars = None
    if keep_best is not None and eval_fn is not None and resumed:
        # seed with the resumed checkpoint: a fine-tune round whose every
        # eval is worse than its starting point must return the start,
        # not its own least-bad state
        rec0 = eval_fn({"params": params, "batch_stats": batch_stats})
        best = rec0[keep_best]
        best_vars = {"params": params, "batch_stats": batch_stats}
        print({"step": 0, **rec0}, flush=True)
    while step < cfg.steps:
        key, sub = jax.random.split(key)
        params, batch_stats, opt_state, loss, mse, peak_err = train_epoch(
            params, batch_stats, opt_state, sub,
            images_d, targets_d, cells_d, peaks_d,
        )
        step += steps_per_call
        rec = {
            "step": step,
            "loss": float(loss),
            "mse": float(mse),
            "peak_err": float(peak_err),
        }
        if eval_fn is not None:
            rec.update(eval_fn({"params": params, "batch_stats": batch_stats}))
            if keep_best is not None and (
                best is None or rec[keep_best] < best
            ):
                best = rec[keep_best]
                best_vars = {"params": params, "batch_stats": batch_stats}
        history.append(rec)
        print(rec, flush=True)
    if best_vars is not None:
        return best_vars, history
    return {"params": params, "batch_stats": batch_stats}, history
