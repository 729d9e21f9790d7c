"""Benchmark the v4 fused bottleneck kernel vs the XLA path on TPU.

Shapes: the parity net's stem block (the round-2 roofline analysis's
clearest target — 28 of 103 ms, docs/ARCHITECTURE.md) plus the trunk and
half-res blocks.  Timing via in-jit chains of the op (single-op loops are
unreliable through the axon tunnel — see verify skill notes); sync reads
back one device scalar.

Usage (TPU must be free):  python scripts/bench_pallas_v4.py [reps]
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["DF3D_TPU_DISABLE_X64"] = "1"

import jax
import jax.numpy as jnp
import numpy as np

from deepfly3d_tpu.models.hourglass import Bottleneck
from deepfly3d_tpu.ops.pallas.bottleneck import (
    bottleneck_xla, fold_bottleneck, fused_bottleneck,
)

# (label, N, H, W, Cin, features): stem is cin!=features -> proj path
SHAPES = [
    ("stem 128x256 48->96", 56, 128, 256, 48, 96),
    ("trunk 64x128 f96", 56, 64, 128, 96, 96),
    ("half 32x64 f96", 56, 32, 64, 96, 96),
]
CHAIN = 6   # ops per jitted chain


def bench_one(label, n, h, w, cin, feats, dtype, reps):
    block = Bottleneck(feats)
    x = jax.random.normal(jax.random.PRNGKey(0), (n, h, w, cin), jnp.float32)
    variables = block.init(jax.random.PRNGKey(1), x, False)
    folded = fold_bottleneck(
        variables["params"], variables["batch_stats"], dtype=dtype
    )
    x = x.astype(dtype)
    # widths must stay constant along a chain: project output back to cin
    # with a fixed random matrix so the chain is width-stationary
    back = jax.random.normal(
        jax.random.PRNGKey(2), (folded["w3"].shape[1], cin), dtype
    ) * 0.05

    def chain(fn):
        @jax.jit
        def run(x0):
            y = x0
            for _ in range(CHAIN):
                y = fn(y, folded)
                y = jax.lax.dot_general(
                    y, back, (((3,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(dtype)
            return y
        return run

    results = {}
    for name, fn in (
        ("xla", bottleneck_xla),
        ("v4", partial(fused_bottleneck, version=4, interpret=False)),
        ("v3", partial(fused_bottleneck, version=3, interpret=False)),
    ):
        run = chain(fn)
        try:
            out = run(x)
            jax.device_get(out.ravel()[0])          # sync one scalar
            samples = []
            for _ in range(reps):
                t0 = time.perf_counter()
                out = run(x)
                jax.device_get(out.ravel()[0])
                samples.append((time.perf_counter() - t0) * 1e3 / CHAIN)
            results[name] = float(np.median(samples))
        except Exception as e:  # noqa: BLE001 — report, keep going
            results[name] = f"FAIL: {type(e).__name__}: {str(e)[:120]}"
    print(f"{label} [{np.dtype(dtype).name}]: " + "  ".join(
        f"{k}={v:.2f}ms" if isinstance(v, float) else f"{k}={v}"
        for k, v in results.items()
    ), flush=True)
    return results


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    print("devices:", jax.devices(), flush=True)
    for dtype in (jnp.bfloat16, jnp.float32):
        for shape in SHAPES:
            bench_one(*shape, dtype, reps)


if __name__ == "__main__":
    main()
