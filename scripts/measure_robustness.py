"""Measure the deployed pipeline's robustness envelope.

The shipped fly weights are trained on the bundled 105-image recording
against the golden pickle (the reference's own sh8_deepfly.tar is an
external download that is unobtainable here). That makes them a
sample-recording-fit detector, NOT a general fly pose estimator — this
script quantifies exactly how far inputs can drift before the golden
tolerances (points 0.02 normalized / confidence 0.002) break:

* brightness scaling (gain sweep)
* JPEG re-encoding quality (the CLI video-expansion path re-compresses)
* integer pixel translation, horizontal AND vertical
* combined drift (gain x shift x recompression)

Measured through the DEPLOYED pipeline (bench.build_pipeline), i.e.
including rig registration (ops/canonicalize.py) when
weights/rig_template_fly.npz is present — the envelope describes what a
user of the CLI/bench actually gets.  ``--raw`` measures the bare
network instead (rig registration disabled), which is the pre-round-5
envelope shape: it documents how much of the robustness is carried by
registration vs by the trunk itself.

The measured cliffs are documented in README.md ("Weights provenance")
and asserted (at half the cliff) by tests/test_robustness.py.

Usage: python scripts/measure_robustness.py [--write-envelope] [--raw]
       (CPU is fine, ~minutes; weights via DF3D_WEIGHTS env var)
"""

import os
import pickle
import sys

import jax

jax.config.update("jax_platforms", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ["DF3D_TPU_DISABLE_X64"] = "1"

import cv2  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import bench  # noqa: E402
from deepfly3d_tpu.ops import geometry  # noqa: E402
from deepfly3d_tpu.models.hourglass import load_weights  # noqa: E402

GOLDEN = os.path.join(REPO, "tests/data/reference_df3d/df3d_result_2d.pkl")
WEIGHTS = os.environ.get(
    "DF3D_WEIGHTS", os.path.join(REPO, "weights/hourglass_fly.npz")
)
NUM_CAMERAS, T = 7, 15


def load_problem(raw_pipeline: bool):
    with open(GOLDEN, "rb") as f:
        golden = pickle.load(f)
    order = np.asarray(golden["camera_ordering"])
    with open(os.path.join(REPO, "data", "calib.pkl"), "rb") as f:
        calib_dict = pickle.load(f)
    calib = geometry.calib_to_arrays(calib_dict, NUM_CAMERAS,
                                     dtype=np.float32)
    variables, spec = load_weights(WEIGHTS)
    input_shape = tuple(spec.input_shape or (256, 512))
    pipeline = bench.build_pipeline(
        spec, variables, calib, order, input_shape,
        rig=None if raw_pipeline else "auto",
    )
    frames, _ = bench.load_golden_frames()      # (T, C, H, W, 3)
    return golden, pipeline, frames


def jpeg_reencode(frames, q):
    flat = frames.reshape(-1, *frames.shape[2:])
    out = np.stack([
        cv2.imdecode(
            cv2.imencode(".jpg", im[:, :, ::-1],
                         [cv2.IMWRITE_JPEG_QUALITY, q])[1],
            cv2.IMREAD_COLOR,
        )[:, :, ::-1]
        for im in flat
    ])
    return out.reshape(frames.shape)


def gain_scale(frames, gain):
    return np.clip(
        frames.astype(np.float32) * gain, 0, 255
    ).astype(np.uint8)


def main():
    import argparse
    import json

    ap = argparse.ArgumentParser()
    ap.add_argument("--write-envelope", action="store_true",
                    help="write <weights>.envelope.json with the measured "
                         "errors; tests/test_robustness.py asserts the "
                         "shipped checkpoint stays inside it")
    ap.add_argument("--raw", action="store_true",
                    help="measure the bare network (rig registration "
                         "disabled) instead of the deployed pipeline")
    args = ap.parse_args()

    golden, pipeline, frames = load_problem(args.raw)
    ev = lambda f: bench.verify_contract(pipeline, f, golden)[:2]
    envelope = {"pipeline": "raw" if args.raw else "deployed"}

    base = ev(frames)
    envelope["clean"] = {"pts": base[0], "conf": base[1]}
    print(f"clean: pts_maxerr={base[0]:.4f} conf_maxerr={base[1]:.4f}")

    print("\nbrightness gain (uint8 clip):")
    for gain in (0.85, 0.9, 0.95, 0.98, 1.02, 1.05, 1.1, 1.15):
        p, c = ev(gain_scale(frames, gain))
        envelope[f"gain_{gain}"] = {"pts": p, "conf": c}
        print(f"  gain={gain:<5} pts={p:.4f} conf={c:.4f} "
              f"{'OK' if p < 0.02 else 'PTS-FAIL'}")

    print("\njpeg re-encode quality:")
    for q in (95, 90, 80, 70, 60):
        p, c = ev(jpeg_reencode(frames, q))
        envelope[f"jpeg_q{q}"] = {"pts": p, "conf": c}
        print(f"  q={q:<4} pts={p:.4f} conf={c:.4f} "
              f"{'OK' if p < 0.02 else 'PTS-FAIL'}")

    print("\ninteger translation (px, horizontal):")
    for dx in (-8, -4, -2, 2, 4, 8):
        p, c = ev(np.roll(frames, dx, axis=3))
        # a dx shift moves the true col by dx/960 — widen the bound by it
        bound = 0.02 + abs(dx) / 960
        envelope[f"shift_{dx}px"] = {"pts": p, "conf": c, "bound": bound}
        print(f"  dx={dx:<4} pts={p:.4f} (shift-adjusted bound {bound:.4f}) "
              f"{'OK' if p < bound else 'PTS-FAIL'}")

    print("\ninteger translation (px, vertical):")
    for dyv in (-4, 4):
        p, c = ev(np.roll(frames, dyv, axis=2))
        bound = 0.02 + abs(dyv) / 480
        envelope[f"vshift_{dyv}px"] = {"pts": p, "conf": c, "bound": bound}
        print(f"  dy={dyv:<4} pts={p:.4f} (shift-adjusted bound {bound:.4f}) "
              f"{'OK' if p < bound else 'PTS-FAIL'}")

    print("\ncombined drift (gain 0.95 x shift +3px x jpeg q80):")
    comb = jpeg_reencode(np.roll(gain_scale(frames, 0.95), 3, axis=3), 80)
    p, c = ev(comb)
    bound = 0.02 + 3 / 960
    envelope["combined_g0.95_dx3_q80"] = {"pts": p, "conf": c,
                                          "bound": bound}
    print(f"  pts={p:.4f} (bound {bound:.4f}) conf={c:.4f} "
          f"{'OK' if p < bound else 'PTS-FAIL'}")

    if args.write_envelope:
        suffix = ".envelope.raw.json" if args.raw else ".envelope.json"
        out = WEIGHTS + suffix
        with open(out, "w") as f:
            json.dump(envelope, f, indent=1)
        print(f"\nwrote {out}")


if __name__ == "__main__":
    main()
