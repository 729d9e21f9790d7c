"""Quantify the gap to the reference's SHIPPED golden 3D video.

The reference pins its renderer with per-frame pixel equality against
tests/data/reference_df3d/video_pose3d.mp4 (reference
tests/test_df3d.py:286-327).  This rebuild pins its own regenerated
goldens instead (tests/test_cli_video.py) — legitimate for regression,
but VERDICT r3 asked: how far is the repo's "reference-look" matplotlib
path from the reference's actual artifact?  This script measures it:

1. renders the bundled recording through the repo's matplotlib 3D path
   at the reference test's exact parameters (all 15 frames, fps 5,
   camera_ordering [0..6], golden 3D result as input);
2. decodes both videos and reports per-frame max / mean abs pixel error,
   the fraction of differing pixels, and per-row breakdowns (rows 1-2 =
   pyba-styled 2D overlays, row 3 = matplotlib 3D figures);
3. writes docs/REFVIDEO_DIFF.json — the committed comparison artifact.

The known irreducible component: the 2D overlay rows are drawn by pyba
(external, source not in the mount) — its exact bone thickness/joint
marker rendering can only be approximated.  The 3D row and the global
layout (grid geometry, width-5000 resize, mp4v encode) are measurable
and closable.

Usage: python scripts/compare_reference_video.py
"""

import json
import os
import pickle
import shutil
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REF_VIDEO = "/root/reference/tests/data/reference_df3d/video_pose3d.mp4"
OUT_JSON = os.path.join(REPO, "docs", "REFVIDEO_DIFF.json")
FPS = 5          # reference tests/test_df3d.py:25 TEST_DATA_VIDEO_FRAMERATE
NUM_FRAMES = 15


def render_ours(tmp, num_frames=None):
    from deepfly3d_tpu.core import Core
    from deepfly3d_tpu.io import result_schema
    from deepfly3d_tpu.viz import video

    with open(
        os.path.join(REPO, "tests/data/reference_df3d/df3d_result_3d.pkl"),
        "rb",
    ) as f:
        golden = pickle.load(f)
    work = os.path.join(tmp, "working")
    os.makedirs(work)
    for img in os.listdir(os.path.join(REPO, "tests/data/reference")):
        if img.endswith(".jpg"):
            shutil.copy(
                os.path.join(REPO, "tests/data/reference", img), work
            )
    out_dir = work + "_df3d"
    os.makedirs(out_dir)
    result_schema.save_result(
        result_schema.result_path(out_dir, work),
        points2d=golden["points2d"],
        camera_ordering=golden["camera_ordering"],
        heatmap_confidence=golden["heatmap_confidence"],
        calib=result_schema.extract_calib(golden),
        points3d=golden["points3d"],
        points3d_wo_procrustes=golden["points3d_wo_procrustes"],
    )
    core = Core(
        input_folder=work,
        output_folder=out_dir,
        num_images_max=num_frames or NUM_FRAMES,
        camera_ordering=[0, 1, 2, 3, 4, 5, 6],
    )
    video.make_pose3d_video(
        core.get_points3d(), core.plot_2d, core.num_images,
        core.input_folder, core.output_folder, fps=FPS,
        skeleton=core.config.skeleton, renderer="matplotlib",
    )
    return os.path.join(
        out_dir, "video_pose3d_" + work.replace("/", "_") + ".mp4"
    )


def read_frames(path):
    import cv2

    cap = cv2.VideoCapture(path)
    frames = []
    while True:
        ok, fr = cap.read()
        if not ok:
            break
        frames.append(fr)
    cap.release()
    return frames


def main():
    if not os.path.exists(REF_VIDEO):
        print("reference golden video not present in the mount; aborting")
        return 1
    tmp = tempfile.mkdtemp(prefix="df3d_refvideo_")
    try:
        ours_path = render_ours(tmp)
        ours = read_frames(ours_path)
        ref = read_frames(REF_VIDEO)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    report = {
        "reference_video": REF_VIDEO,
        "reference_frames": len(ref),
        "our_frames": len(ours),
        "reference_shape": list(ref[0].shape) if ref else None,
        "our_shape": list(ours[0].shape) if ours else None,
        "frames": [],
    }
    comparable = (
        len(ref) == len(ours)
        and ref and ours
        and ref[0].shape == ours[0].shape
    )
    report["shapes_match"] = bool(comparable)
    if comparable:
        h = ref[0].shape[0]
        # layout: two 2D rows of 1:2-aspect tiles (h/4 each) on top of a
        # 3D row of square tiles (h/2) — 833+833+1666 at width 5000
        for i, (r, o) in enumerate(zip(ref, ours)):
            d = np.abs(r.astype(np.int16) - o.astype(np.int16))
            rows = {}
            for name, sl in (
                ("2d_rows", slice(0, h // 2)),
                ("3d_row", slice(h // 2, h)),
            ):
                dd = d[sl]
                rows[name] = {
                    "max": int(dd.max()),
                    "mean": round(float(dd.mean()), 3),
                    "frac_gt8": round(float((dd > 8).mean()), 5),
                }
            report["frames"].append({
                "frame": i,
                "max": int(d.max()),
                "mean": round(float(d.mean()), 3),
                "frac_gt8": round(float((d > 8).mean()), 5),
                **rows,
            })
        allmax = max(f["max"] for f in report["frames"])
        report["summary"] = {
            "max_abs_pixel_err": allmax,
            "mean_abs_pixel_err": round(
                float(np.mean([f["mean"] for f in report["frames"]])), 3
            ),
            "mean_frac_pixels_gt8": round(
                float(np.mean([f["frac_gt8"] for f in report["frames"]])), 5
            ),
        }
    else:
        # still record WHY: dimension/frame-count level gap
        report["summary"] = {
            "note": "geometry mismatch — see shapes above; the per-pixel "
                    "comparison requires matching layouts"
        }
    os.makedirs(os.path.dirname(OUT_JSON), exist_ok=True)
    with open(OUT_JSON, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report.get("summary"), indent=1))
    print(f"wrote {OUT_JSON}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
