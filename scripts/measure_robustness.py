"""Measure the trained weights' robustness envelope.

The shipped fly weights are trained on the bundled 105-image recording
against the golden pickle (the reference's own sh8_deepfly.tar is an
external download that is unobtainable here). That makes them a
sample-recording-fit detector, NOT a general fly pose estimator — this
script quantifies exactly how far inputs can drift before the golden
tolerances (points 0.02 normalized / confidence 0.002) break:

* brightness scaling (gain sweep)
* JPEG re-encoding quality (the CLI video-expansion path re-compresses)
* integer pixel translation

The measured cliffs are documented in README.md ("Weights provenance")
and asserted (at half the cliff) by tests/test_robustness.py.

Usage: python scripts/measure_robustness.py   (CPU is fine, ~minutes)
"""

import os
import pickle
import sys

import jax

jax.config.update("jax_platforms", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import cv2  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from deepfly3d_tpu.io import discovery  # noqa: E402
from deepfly3d_tpu.models import decode as decode_mod  # noqa: E402
from deepfly3d_tpu.models.hourglass import load_weights  # noqa: E402
from deepfly3d_tpu.models.inference import infer_batch  # noqa: E402

IMAGES = os.path.join(REPO, "tests/data/reference")
GOLDEN = os.path.join(REPO, "tests/data/reference_df3d/df3d_result_2d.pkl")
WEIGHTS = os.environ.get(
    "DF3D_WEIGHTS", os.path.join(REPO, "weights/hourglass_fly.npz")
)
NUM_CAMERAS, T = 7, 15


def load_problem():
    with open(GOLDEN, "rb") as f:
        golden = pickle.load(f)
    order = list(golden["camera_ordering"])
    flip_cams = {order[i] for i in range(len(order)) if i > 3}
    paths, flips = [], []
    for cam in range(NUM_CAMERAS):
        for img in range(T):
            paths.append(os.path.join(IMAGES, f"camera_{cam}_img_{img}.jpg"))
            flips.append(cam in flip_cams)
    raw = np.stack([discovery.read_image(p) for p in paths])
    variables, spec = load_weights(WEIGHTS)
    return golden, order, raw, np.asarray(flips), variables, spec


def evaluate(golden, order, images, flips, variables, spec, input_shape):
    pts, conf = infer_batch(
        variables, jnp.asarray(images), jnp.asarray(flips), spec, input_shape
    )
    pts = np.asarray(pts).reshape(NUM_CAMERAS, T, -1, 2)
    conf = np.asarray(conf).reshape(NUM_CAMERAS, T, -1, 1)
    p38 = decode_mod.postprocess_points2d(pts, order)
    return (
        float(np.abs(p38 - golden["points2d"]).max()),
        float(np.abs(conf - golden["heatmap_confidence"]).max()),
    )


def jpeg_reencode(raw, q):
    return np.stack([
        cv2.imdecode(
            cv2.imencode(".jpg", im[:, :, ::-1],
                         [cv2.IMWRITE_JPEG_QUALITY, q])[1],
            cv2.IMREAD_COLOR,
        )[:, :, ::-1]
        for im in raw
    ])


def main():
    import argparse
    import json

    from deepfly3d_tpu.config import fly_config

    ap = argparse.ArgumentParser()
    ap.add_argument("--write-envelope", action="store_true",
                    help="write <weights>.envelope.json with the measured "
                         "errors; tests/test_robustness.py asserts the "
                         "shipped checkpoint stays inside it")
    args = ap.parse_args()

    golden, order, raw, flips, variables, spec = load_problem()
    input_shape = spec.input_shape or fly_config().network.input_shape
    ev = lambda imgs: evaluate(
        golden, order, imgs, flips, variables, spec, input_shape
    )
    envelope = {}

    base = ev(raw)
    envelope["clean"] = {"pts": base[0], "conf": base[1]}
    print(f"clean: pts_maxerr={base[0]:.4f} conf_maxerr={base[1]:.4f}")

    print("\nbrightness gain (uint8 clip):")
    for gain in (0.85, 0.9, 0.95, 0.98, 1.02, 1.05, 1.1, 1.15):
        imgs = np.clip(raw.astype(np.float32) * gain, 0, 255).astype(np.uint8)
        p, c = ev(imgs)
        envelope[f"gain_{gain}"] = {"pts": p, "conf": c}
        print(f"  gain={gain:<5} pts={p:.4f} conf={c:.4f} "
              f"{'OK' if p < 0.02 else 'PTS-FAIL'}")

    print("\njpeg re-encode quality:")
    for q in (95, 90, 80, 70, 60):
        p, c = ev(jpeg_reencode(raw, q))
        envelope[f"jpeg_q{q}"] = {"pts": p, "conf": c}
        print(f"  q={q:<4} pts={p:.4f} conf={c:.4f} "
              f"{'OK' if p < 0.02 else 'PTS-FAIL'}")

    print("\ninteger translation (px, horizontal):")
    for dx in (-8, -4, -2, 2, 4, 8):
        imgs = np.roll(raw, dx, axis=2)
        p, c = ev(imgs)
        # a dx shift moves the true col by dx/960 — subtract it from the bound
        bound = 0.02 + abs(dx) / 960
        envelope[f"shift_{dx}px"] = {"pts": p, "conf": c, "bound": bound}
        print(f"  dx={dx:<4} pts={p:.4f} (shift-adjusted bound {bound:.4f}) "
              f"{'OK' if p < bound else 'PTS-FAIL'}")

    if args.write_envelope:
        out = WEIGHTS + ".envelope.json"
        with open(out, "w") as f:
            json.dump(envelope, f, indent=1)
        print(f"\nwrote {out}")


if __name__ == "__main__":
    main()
