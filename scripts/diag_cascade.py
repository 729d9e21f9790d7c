"""Diagnose the fast student's golden-parity residue for the cascade design.

Questions this answers (on the real TPU, golden recording):
1. Which (cam, t, joint) cells fail the 0.02 points contract for the fast
   near-parity student, in bf16 and f32?
2. What is each config's conf max-err vs the 0.002 contract (student bf16 /
   student f32 / parity bf16 / parity f32)?
3. Is a cheap per-image suspect detector (heatmap peak ambiguity: distant
   second peak close in value to the max) able to flag every failing image,
   and at what false-positive rate?
"""

import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["DF3D_TPU_DISABLE_X64"] = "1"

import jax
import jax.numpy as jnp
import numpy as np

from deepfly3d_tpu.models import decode as decode_mod
from deepfly3d_tpu.models.hourglass import HourglassSpec, load_weights
from deepfly3d_tpu.models.inference import PoseEstimator, _read_images_threaded

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLD = os.path.join(ROOT, "tests", "data", "reference_df3d", "df3d_result_2d.pkl")
IMAGES = os.path.join(ROOT, "tests", "data", "reference")


def load_golden():
    with open(GOLD, "rb") as f:
        return pickle.load(f)


def run_config(ckpt, dtype, images, flips, golden, label):
    est = PoseEstimator(ckpt)
    est.spec = HourglassSpec(**{**est.spec.__dict__, "compute_dtype": dtype})
    pts19, conf, hm = est.infer_images(
        images, flips, batch_size=105, return_heatmaps=True
    )
    C, T = 7, 15
    pts19 = pts19.reshape(C, T, 19, 2)
    conf = conf.reshape(C, T, 19, 1)
    order = golden["camera_ordering"]
    p38 = decode_mod.postprocess_points2d(pts19, order)
    pts_err = np.abs(p38 - golden["points2d"])
    conf_err = np.abs(conf - golden["heatmap_confidence"])
    bad = np.argwhere(pts_err > 0.02)
    print(f"\n=== {label} ===")
    print(f"pts maxerr {pts_err.max():.5f}  conf maxerr {conf_err.max():.5f}")
    print(f"failing cells (>0.02): {len(bad)}")
    bad_imgs = sorted({(int(c), int(t)) for c, t, j, d in bad})
    print(f"failing (cam,t) images: {bad_imgs}")
    for c, t, j, d in bad:
        print(
            f"  cam{c} t{t} j{j} dim{d}: ours={p38[c,t,j,d]:.4f} "
            f"gold={golden['points2d'][c][t][j][d]:.4f} err={pts_err[c,t,j,d]:.4f}"
        )
    return pts19, conf, hm.reshape(C, T, *hm.shape[1:]), bad_imgs, p38


def peak_ambiguity(hm, radius=3):
    """Per-image ambiguity score from heatmaps (C,T,H,W,K).

    For each (image, joint): mask a (2r+1)^2 window around the argmax, take
    the max of the remainder (the strongest DISTANT second peak), score =
    second / max. Per-image score = max over joints.
    """
    C, T, H, W, K = hm.shape
    hm_f = jnp.asarray(hm, jnp.float32).reshape(C * T, H, W, K)

    def per_image(m):  # (H, W, K)
        flat = m.transpose(2, 0, 1).reshape(K, H * W)
        idx = jnp.argmax(flat, axis=-1)
        peak = jnp.max(flat, axis=-1)
        r_idx = idx // W
        c_idx = idx % W
        rows = jnp.arange(H)[None, :, None]
        cols = jnp.arange(W)[None, None, :]
        near = (jnp.abs(rows - r_idx[:, None, None]) <= radius) & (
            jnp.abs(cols - c_idx[:, None, None]) <= radius
        )
        masked = jnp.where(near, -jnp.inf, m.transpose(2, 0, 1))
        second = jnp.max(masked.reshape(K, H * W), axis=-1)
        return second / jnp.maximum(peak, 1e-6)

    scores = jax.jit(jax.vmap(per_image))(hm_f)  # (C*T, K)
    return np.asarray(scores).reshape(C, T, K)


def main():
    golden = load_golden()
    order = np.asarray(golden["camera_ordering"])
    flip_mask = np.zeros(7, bool)
    flip_mask[order[4:]] = True

    paths, flips = [], []
    for cam in range(7):
        for t in range(15):
            paths.append(os.path.join(IMAGES, f"camera_{cam}_img_{t}.jpg"))
            flips.append(flip_mask[cam])
    images = _read_images_threaded(paths)
    flips = np.asarray(flips)

    fast = os.path.join(ROOT, "weights", "hourglass_fly_fast_nearparity.npz")
    parity = os.path.join(ROOT, "weights", "hourglass_fly.npz")

    _, _, hm_f32, bad_f32, _ = run_config(
        fast, jnp.float32, images, flips, golden, "student f32"
    )
    _, _, hm_bf16, bad_bf16, _ = run_config(
        fast, jnp.bfloat16, images, flips, golden, "student bf16"
    )
    run_config(parity, jnp.bfloat16, images, flips, golden, "parity bf16")
    run_config(parity, jnp.float32, images, flips, golden, "parity f32")

    for label, hm, bad_imgs in (
        ("student f32", hm_f32, bad_f32),
        ("student bf16", hm_bf16, bad_bf16),
    ):
        scores = peak_ambiguity(hm)  # (C, T, K)
        img_score = scores.max(axis=-1)  # (C, T)
        bad_set = set(bad_imgs)
        bad_scores = [img_score[c, t] for c, t in bad_imgs]
        print(f"\n=== detector: {label} ===")
        print(f"failing-image ambiguity scores: "
              f"{[round(float(s), 4) for s in sorted(bad_scores)]}")
        all_scores = sorted(
            (float(img_score[c, t]), (c, t))
            for c in range(7) for t in range(15)
        )
        if bad_scores:
            thr = min(bad_scores)
            flagged = [(c, t) for c in range(7) for t in range(15)
                       if img_score[c, t] >= thr * 0.95]
            print(f"threshold {thr:.4f}*0.95 flags {len(flagged)}/105 images "
                  f"({100 * len(flagged) / 105:.1f}%), "
                  f"recall {len(bad_set & set(flagged))}/{len(bad_set)}")
        print("score distribution (pct): "
              f"p50={np.percentile(img_score, 50):.3f} "
              f"p80={np.percentile(img_score, 80):.3f} "
              f"p90={np.percentile(img_score, 90):.3f} "
              f"p95={np.percentile(img_score, 95):.3f} "
              f"max={img_score.max():.3f}")


if __name__ == "__main__":
    main()
