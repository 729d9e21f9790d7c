"""Python-API walkthrough — the analog of the reference's
notebook/run_df3d.ipynb flow (reference README.md:245-267):

    Core(...) -> pose2d_estimation() -> calibrate_calc(...) -> save()
    -> make_pose2d_video / make_pose3d_video

Run on the bundled sample recording:

    python examples/run_pipeline.py [input_folder]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deepfly3d_tpu.core import Core
from deepfly3d_tpu.utils.profiling import StageTimer
from deepfly3d_tpu.viz import video


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    input_folder = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        repo, "tests/data/reference"
    )

    timer = StageTimer()
    core = Core(
        input_folder=input_folder,
        output_folder=None,                 # -> <input>_df3d
        num_images_max=0,
        camera_ordering=[0, 1, 2, 3, 4, 5, 6],
    )

    with timer.stage("pose2d"):
        core.pose2d_estimation(batch_size=8)
    core.save()

    with timer.stage("calibrate"):
        core.calibrate_calc(0, core.max_img_id)
    with timer.stage("save"):
        core.save()

    with timer.stage("video2d"):
        video.make_pose2d_video(
            core.plot_2d, core.num_images, core.input_folder,
            core.output_folder, fps=core.fps,
        )
    with timer.stage("video3d"):
        video.make_pose3d_video(
            core.get_points3d(), core.plot_2d, core.num_images,
            core.input_folder, core.output_folder, fps=core.fps,
            skeleton=core.config.skeleton,
        )

    print(timer.report(frames=core.num_images))


if __name__ == "__main__":
    main()
