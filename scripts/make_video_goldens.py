"""Generate THIS framework's golden videos for pixel regression.

The reference pins its renderer with per-frame pixel equality against
committed golden mp4s (/root/reference/tests/test_df3d.py:277-284,321-327).
The rebuild's renderer has its own styling, so it needs its own goldens:
render the bundled recording (first 4 frames — enough for pixel coverage,
small enough to commit) from the golden result pickle and store the mp4s
under tests/data/golden_videos/.

Re-run ONLY on an intentional renderer change; tests/test_cli_video.py::
TestVideoPixelGolden must be regenerated together with it.

Usage: python scripts/make_video_goldens.py
"""

import os
import shutil
import sys
import tempfile

import jax

jax.config.update("jax_platforms", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

NUM_FRAMES = 4
FPS = 5


def render_videos(out_2d: str, out_3d: str) -> None:
    """Render both golden videos from the golden result into given paths.

    Shared by this script and the regression test so the two can never
    drift: seeded Core (golden 2D + calib), first NUM_FRAMES frames.
    """
    import pickle

    from deepfly3d_tpu.core import Core
    from deepfly3d_tpu.io import result_schema
    from deepfly3d_tpu.viz import video

    with open(
        os.path.join(REPO, "tests/data/reference_df3d/df3d_result_3d.pkl"), "rb"
    ) as f:
        golden = pickle.load(f)

    tmp = tempfile.mkdtemp(prefix="df3d_video_golden_")
    work = os.path.join(tmp, "working")
    os.makedirs(work)
    for img in os.listdir(os.path.join(REPO, "tests/data/reference")):
        if img.endswith(".jpg"):
            shutil.copy(os.path.join(REPO, "tests/data/reference", img), work)
    out_dir = work + "_df3d"
    os.makedirs(out_dir)
    path = result_schema.result_path(out_dir, work)
    result_schema.save_result(
        path,
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
        num_images_max=NUM_FRAMES,
        camera_ordering=[0, 1, 2, 3, 4, 5, 6],
    )
    video.make_pose2d_video(
        core.plot_2d, core.num_images, core.input_folder, core.output_folder,
        fps=FPS,
    )
    video.make_pose3d_video(
        core.get_points3d(), core.plot_2d, core.num_images,
        core.input_folder, core.output_folder, fps=FPS,
        skeleton=core.config.skeleton,
    )
    name_2d = "video_pose2d_" + work.replace("/", "_") + ".mp4"
    name_3d = "video_pose3d_" + work.replace("/", "_") + ".mp4"
    shutil.move(os.path.join(out_dir, name_2d), out_2d)
    shutil.move(os.path.join(out_dir, name_3d), out_3d)
    shutil.rmtree(tmp)


def main():
    golden_dir = os.path.join(REPO, "tests/data/golden_videos")
    os.makedirs(golden_dir, exist_ok=True)
    out_2d = os.path.join(golden_dir, "video_pose2d.mp4")
    out_3d = os.path.join(golden_dir, "video_pose3d.mp4")
    render_videos(out_2d, out_3d)
    for p in (out_2d, out_3d):
        print(f"wrote {p} ({os.path.getsize(p) / 1e6:.2f} MB)")


if __name__ == "__main__":
    main()
