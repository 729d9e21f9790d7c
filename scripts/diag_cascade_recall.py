"""Evaluate cascade repair coverage for a student checkpoint.

For the golden recording: which (cam, t) images fail the points contract
under the student, how the cascade's suspicion score (worst per-image
multi-view reprojection residual, models/cascade.py) ranks them, and the
minimal static repair fraction R that achieves full recall — the number
that decides whether the cascade can hold the golden contract.

Usage:  python scripts/diag_cascade_recall.py <student.npz> [bf16]
"""

import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["DF3D_TPU_DISABLE_X64"] = "1"

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from deepfly3d_tpu.models import decode as decode_mod
from deepfly3d_tpu.models.hourglass import HourglassSpec, load_weights
from deepfly3d_tpu.models.inference import PoseEstimator, _read_images_threaded
from deepfly3d_tpu.ops import geometry

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLD = os.path.join(ROOT, "tests", "data", "reference_df3d", "df3d_result_2d.pkl")
IMAGES = os.path.join(ROOT, "tests", "data", "reference")


def main():
    ckpt = sys.argv[1]
    dtype = jnp.bfloat16 if (len(sys.argv) > 2 and sys.argv[2] == "bf16") \
        else jnp.float32
    with open(GOLD, "rb") as f:
        golden = pickle.load(f)
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

    est = PoseEstimator(ckpt)
    est.spec = HourglassSpec(**{**est.spec.__dict__, "compute_dtype": dtype})
    pts19, conf = est.infer_images(images, flips, batch_size=105)
    pts19 = pts19.reshape(7, 15, 19, 2)
    conf = conf.reshape(7, 15, 19, 1)
    p38 = decode_mod.postprocess_points2d(pts19, order)
    pts_err = np.abs(p38 - golden["points2d"])
    conf_err = float(np.abs(conf - golden["heatmap_confidence"]).max())
    bad = np.argwhere(pts_err > 0.02)
    bad_imgs = sorted({(int(c), int(t)) for c, t, j, d in bad})
    print(f"dtype={np.dtype(dtype).name}  pts_maxerr={pts_err.max():.5f}  "
          f"conf_maxerr={conf_err:.5f}")
    print(f"failing cells: {len(bad)}  failing images: {len(bad_imgs)} "
          f"({100 * len(bad_imgs) / 105:.1f}% of 105)")

    # cascade suspicion score: worst reprojection residual per image
    import pickle as _p

    with open(os.path.join(ROOT, "data", "calib.pkl"), "rb") as f:
        calib_dict = _p.load(f)
    R, tvec, intr, _ = geometry.calib_to_arrays(calib_dict, 7,
                                                dtype=np.float32)
    p38_j = jnp.asarray(p38, jnp.float32)
    pts3d = geometry.triangulate(
        p38_j, jnp.asarray(R), jnp.asarray(tvec), jnp.asarray(intr),
        (960, 480), method="normal",
    )
    res, mask = geometry.reprojection_residuals(
        pts3d, p38_j, jnp.asarray(R), jnp.asarray(tvec), jnp.asarray(intr),
        jnp.zeros((7, 5), jnp.float32), (960, 480),
    )
    err = np.asarray(jnp.linalg.norm(res, axis=-1)) * np.asarray(mask)
    score = err.max(axis=-1)            # (C, T)

    ranking = sorted(
        ((float(score[c, t]), (c, t)) for c in range(7) for t in range(15)),
        reverse=True,
    )
    rank_of = {img: i for i, (_, img) in enumerate(ranking)}
    if bad_imgs:
        ranks = sorted(rank_of[img] for img in bad_imgs)
        worst = ranks[-1]
        print(f"failing-image ranks in suspicion order: {ranks}")
        print(f"minimal full-recall repair count: {worst + 1}/105 "
              f"= {100 * (worst + 1) / 105:.1f}%")
    else:
        print("no failing images — student alone holds the pts contract")
    print("score percentiles: "
          + " ".join(f"p{p}={np.percentile(score, p):.1f}px"
                     for p in (50, 80, 90, 95, 99)))


if __name__ == "__main__":
    main()
