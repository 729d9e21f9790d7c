"""End-to-end HOST-INCLUSIVE throughput (SURVEY §7 hard-part 5).

``bench.py`` measures the device pipeline with device-generated frames
(correct for the frames/s/chip metric — the axon tunnel would otherwise
dominate).  This script measures the Amdahl tails the production path
actually pays, on the bundled recording:

1. JPEG decode (native libjpeg pool / cv2 fallback) from disk
2. host->device upload + batched inference + decode (the prefetch path)
3. triangulation + procrustes (host-pinned x64 geometry)
4. 2D/3D video rendering (matplotlib + mp4v encode)

Prints one JSON line per stage with frames/s.  Run on the TPU image
(serialize with other TPU work): python scripts/bench_host_pipeline.py
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
IMAGES = os.path.join(REPO, "tests", "data", "reference")
WEIGHTS = os.path.join(REPO, "weights", "hourglass_fly.npz")
NUM_CAMERAS, T = 7, 15
ROUNDS = int(os.environ.get("DF3D_HOSTBENCH_ROUNDS", "6"))


def main():
    from deepfly3d_tpu.core import Core
    from deepfly3d_tpu.models.inference import PoseEstimator, _read_images_threaded
    from deepfly3d_tpu.viz import video

    paths = [
        os.path.join(IMAGES, f"camera_{c}_img_{i}.jpg")
        for c in range(NUM_CAMERAS)
        for i in range(T)
    ]
    flips = np.asarray([c >= 4 for c in range(NUM_CAMERAS) for _ in range(T)])
    frames_per_round = T  # the metric unit is 7-camera frames

    # ---- 1. host JPEG decode
    images = _read_images_threaded(paths)  # warmup (page cache)
    t0 = time.perf_counter()
    for _ in range(ROUNDS):
        images = _read_images_threaded(paths)
    decode_fps = ROUNDS * frames_per_round / (time.perf_counter() - t0)

    # ---- 2. upload + inference + decode (prefetch path)
    estimator = PoseEstimator(WEIGHTS)
    estimator.infer_images(images, flips, batch_size=56)  # warmup/compile
    t0 = time.perf_counter()
    for _ in range(ROUNDS):
        pts, conf = estimator.infer_images(images, flips, batch_size=56)
    infer_fps = ROUNDS * frames_per_round / (time.perf_counter() - t0)

    # ---- 3 + 4. geometry + videos through the Core/CLI path
    import pickle
    import shutil

    from deepfly3d_tpu.io import result_schema

    with open(os.path.join(REPO, "tests/data/reference_df3d/df3d_result_3d.pkl"),
              "rb") as f:
        golden = pickle.load(f)
    tmp = tempfile.mkdtemp(prefix="df3d_hostbench_")
    work = os.path.join(tmp, "working")
    os.makedirs(work)
    for p in paths:
        shutil.copy(p, work)
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
    core = Core(work, out_dir, 0, list(range(NUM_CAMERAS)))

    t0 = time.perf_counter()
    core.triangulate()
    pts3d = core.get_points3d()
    geom_fps = frames_per_round / (time.perf_counter() - t0)

    t0 = time.perf_counter()
    video.make_pose2d_video(core.plot_2d, core.num_images, core.input_folder,
                            core.output_folder, fps=5)
    video2d_fps = frames_per_round / (time.perf_counter() - t0)

    t0 = time.perf_counter()
    video.make_pose3d_video(pts3d, core.plot_2d, core.num_images,
                            core.input_folder, core.output_folder, fps=5,
                            skeleton=core.config.skeleton)
    video3d_fps = frames_per_round / (time.perf_counter() - t0)
    shutil.rmtree(tmp)

    stages = {
        "host jpeg decode": decode_fps,
        "ingest+infer+decode (prefetch path)": infer_fps,
        "triangulate+procrustes+filter": geom_fps,
        "video 2d render+encode": video2d_fps,
        "video 3d render+encode": video3d_fps,
    }
    for metric, fps in stages.items():
        print(json.dumps({
            "metric": f"host-inclusive: {metric}",
            "value": round(fps, 2),
            "unit": "frames/s (7-cam)",
        }))

    # committed per-round artifact (VERDICT r3 item 7): the Amdahl tails
    # stay visible next to the device-only BENCH_r*.json headline
    out_path = None
    if len(sys.argv) > 1 and sys.argv[1] == "--out":
        out_path = sys.argv[2]
    elif os.environ.get("DF3D_HOSTBENCH_OUT"):
        out_path = os.environ["DF3D_HOSTBENCH_OUT"]
    if out_path:
        import jax

        with open(out_path, "w") as f:
            json.dump({
                "workload": "bundled recording, 7 cams x 15 frames",
                "backend": jax.devices()[0].platform,
                "rounds": ROUNDS,
                "stages_fps": {k: round(v, 2) for k, v in stages.items()},
                # the serial end-to-end rate a single-recording CLI run
                # pays (sum of stage times; the fleet/prefetch paths
                # overlap stages, so this is the pessimistic bound)
                "serial_e2e_fps": round(
                    1.0 / sum(1.0 / v for v in stages.values()), 2
                ),
            }, f, indent=1)
        print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
