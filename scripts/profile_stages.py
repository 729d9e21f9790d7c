"""Per-stage TPU profile of the end-to-end inference pipeline.

Times cumulative pipeline prefixes (pre / +net / +decode / +scatter /
+DLT) so each stage's cost is the delta between consecutive rows — the
methodology that located the 58 ms preprocess stage (see
docs/ARCHITECTURE.md perf notes). Cumulative jits are used instead of
stage-isolated ones because `jax.block_until_ready` does not reliably
block for small single-fusion programs on the axon backend (a scalar
readback is forced after the timing loop for the same reason).

Usage:  python scripts/profile_stages.py  [T]
"""

import os
import sys
import time
import pickle

os.environ.setdefault("DF3D_TPU_DISABLE_X64", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from deepfly3d_tpu.models.hourglass import HourglassNet, HourglassSpec, load_weights
from deepfly3d_tpu.ops import geometry
from deepfly3d_tpu.ops import image as image_ops

NUM_CAMERAS = 7
IMAGE_H, IMAGE_W = 480, 960
INPUT_SHAPE = (256, 512)
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    N = T * NUM_CAMERAS

    variables, spec = load_weights(os.path.join(REPO, "weights/hourglass_fly.npz"))
    spec = HourglassSpec(**{**spec.__dict__, "compute_dtype": jnp.bfloat16})
    global INPUT_SHAPE
    if spec.input_shape is not None:
        INPUT_SHAPE = tuple(spec.input_shape)
    model = HourglassNet(spec)

    with open(os.path.join(REPO, "data/calib.pkl"), "rb") as f:
        R, tvec, intr, _ = geometry.calib_to_arrays(
            pickle.load(f), NUM_CAMERAS, dtype=np.float32
        )
    Rj = jnp.asarray(R, jnp.float32)
    tj = jnp.asarray(tvec, jnp.float32)
    ij = jnp.asarray(intr, jnp.float32)

    order = np.arange(NUM_CAMERAS)
    flip_mask = np.zeros(NUM_CAMERAS, bool)
    flip_mask[order[4:]] = True
    flip_d = jnp.asarray(flip_mask)
    left_cams = jnp.asarray(order[:3])
    right_cams = jnp.asarray(order[4:])

    frames = jax.jit(
        lambda k: jax.random.randint(
            k, (T, NUM_CAMERAS, IMAGE_H, IMAGE_W, 3), 0, 255, jnp.uint8
        )
    )(jax.random.PRNGKey(0))
    jax.block_until_ready(frames)

    def stage_pre(frames_u8):
        x = frames_u8.reshape(N, IMAGE_H, IMAGE_W, 3)
        flip = jnp.tile(flip_d, T)
        return image_ops.preprocess_frames(x, flip, INPUT_SHAPE, jnp.float32)

    def stage_net(x):
        return model.apply(variables, x, train=False)[-1]

    def stage_decode(heatmaps):
        _, Hh, Ww, K = heatmaps.shape
        flat = heatmaps.transpose(0, 3, 1, 2).reshape(N, K, Hh * Ww)
        idx = jnp.argmax(flat, axis=-1)
        row = (idx // Ww).astype(jnp.float32) / Hh
        col = (idx % Ww).astype(jnp.float32) / Ww
        pts19 = jnp.stack([row, col], -1).reshape(T, NUM_CAMERAS, K, 2)
        return pts19.transpose(1, 0, 2, 3)

    def stage_scatter(pts19):
        K = pts19.shape[2]
        p38 = jnp.zeros((NUM_CAMERAS, T, 2 * K, 2), jnp.float32)
        p38 = p38.at[left_cams, :, :K].set(pts19[left_cams])
        p38 = p38.at[right_cams, :, K:].set(pts19[right_cams])
        p38 = p38.at[order[2], :, 15:].set(0.0)
        p38 = p38.at[order[4], :, K + 15:].set(0.0)
        flipped = 1.0 - p38[right_cams, ..., 1]
        return p38.at[right_cams, ..., 1].set(flipped)

    def stage_tri(p38):
        return geometry.triangulate(
            p38, Rj, tj, ij, (IMAGE_W, IMAGE_H), method="normal"
        )

    prefixes = [
        ("pre", lambda f: stage_pre(f)),
        ("pre+net", lambda f: stage_net(stage_pre(f))),
        ("+decode", lambda f: stage_decode(stage_net(stage_pre(f)))),
        ("+scatter", lambda f: stage_scatter(
            stage_decode(stage_net(stage_pre(f))))),
        ("+tri=full", lambda f: stage_tri(stage_scatter(
            stage_decode(stage_net(stage_pre(f)))))),
    ]
    prev = 0.0
    for name, fn in prefixes:
        jfn = jax.jit(fn)
        out = jfn(frames)
        # forced scalar readback: block_until_ready alone returns early for
        # small programs on axon (compile would leak into the timed loop),
        # and np.asarray would pull the full tensor through the tunnel —
        # slice ONE element on device, transfer 4 bytes
        _ = float(jax.device_get(out.ravel()[0]))
        iters = 6
        t0 = time.perf_counter()
        for _ in range(iters):
            out = jfn(frames)
        _ = float(jax.device_get(out.ravel()[0]))  # scalar readback
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"{name:12s} {dt:9.2f} ms/dispatch   (+{dt - prev:7.2f} ms)"
              f"   {T / dt * 1e3:8.1f} frames/s")
        prev = dt


if __name__ == "__main__":
    main()
