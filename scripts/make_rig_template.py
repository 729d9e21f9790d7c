"""Capture the rig registration template from a calibration recording.

Writes ``weights/rig_template_fly.npz`` (per-camera intensity profiles +
means, ops/canonicalize.py) from the bundled calibration recording — the
same 7-cam x 15-frame session the calib prior (data/calib.pkl, reference
df3d/core.py:234-241) and the shipped detector weights are anchored to.

Usage:
  python scripts/make_rig_template.py [recording_dir] [--out PATH]
"""

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from deepfly3d_tpu.io import discovery  # noqa: E402
from deepfly3d_tpu.ops import canonicalize  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("recording", nargs="?",
                    default=os.path.join(REPO, "tests/data/reference"))
    ap.add_argument("--out",
                    default=os.path.join(REPO, "weights/rig_template_fly.npz"))
    ap.add_argument("--num-cameras", type=int, default=7)
    args = ap.parse_args()

    max_id = discovery.get_max_img_id(args.recording)
    frames = []
    for cam in range(args.num_cameras):
        cam_frames = [
            discovery.read_image(
                os.path.join(args.recording, f"camera_{cam}_img_{t}.jpg"))
            for t in range(max_id + 1)
        ]
        frames.append(np.stack(cam_frames))
    frames = np.stack(frames)                       # (C, T, H, W, 3)
    tpl = canonicalize.build_template(frames)
    canonicalize.save_template(args.out, tpl, source=args.recording)
    print(f"wrote {args.out}: {tpl.num_cameras} cameras, "
          f"image {tpl.image_hw}, means {np.round(tpl.mean, 2).tolist()}")


if __name__ == "__main__":
    main()
