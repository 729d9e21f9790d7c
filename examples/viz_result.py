"""Visualize a saved df3d_result pickle — the analog of the reference's
notebook/viz_df3d_result.ipynb:

    CameraNetwork(points2d, calib=result_dict, image_path=...) ->
    camNet[cam].plot_2d(img_id) ; plot_drosophila_3d(points3d)

Run after examples/run_pipeline.py (or df3d-cli) on the sample recording:

    python examples/viz_result.py [result_pickle] [image_folder] [out_dir]
"""

import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from deepfly3d_tpu.compat import CameraNetwork, df3d_bones, df3d_colors
from deepfly3d_tpu.viz import plot3d


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    default_folder = os.path.join(repo, "tests/data/reference")
    default_result = os.path.join(
        default_folder + "_df3d",
        "df3d_result_" + default_folder.replace("/", "_") + ".pkl",
    )
    result_path = sys.argv[1] if len(sys.argv) > 1 else default_result
    image_folder = sys.argv[2] if len(sys.argv) > 2 else default_folder
    out_dir = sys.argv[3] if len(sys.argv) > 3 else "/tmp/df3d_viz"
    os.makedirs(out_dir, exist_ok=True)

    with open(result_path, "rb") as f:
        result = pickle.load(f)

    # same construction the reference notebook uses: the whole result dict
    # doubles as the calibration argument (integer keys are harvested)
    camNet = CameraNetwork(
        points2d=result["points2d"] * [480, 960],
        calib=result,
        image_path=os.path.join(image_folder, "camera_{cam_id}_img_{img_id}.jpg"),
        bones=df3d_bones,
        colors=df3d_colors,
    )

    import cv2

    for cam_id in (0, 3, 6):
        img = camNet[cam_id].plot_2d(0)
        path = os.path.join(out_dir, f"cam{cam_id}_img0_overlay.jpg")
        cv2.imwrite(path, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        print("wrote", path)

    from deepfly3d_tpu.skeletons import fly

    fig_img = plot3d.render_frame_3d(
        np.asarray(result["points3d"])[0], fly.skeleton, cam_id=0
    )
    path = os.path.join(out_dir, "pose3d_frame0.png")
    cv2.imwrite(path, cv2.cvtColor(fig_img, cv2.COLOR_RGB2BGR))
    print("wrote", path)


if __name__ == "__main__":
    main()
