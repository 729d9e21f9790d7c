"""Native ingest runtime (libjpeg + libav) tests.

Skipped when native/libdf3d_ingest.so has not been built (make -C native).
"""

import glob
import os

import numpy as np
import pytest

from deepfly3d_tpu.io import discovery, native
from tests.conftest import REFERENCE_IMAGES

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native ingest library not built"
)


def test_jpeg_batch_matches_cv2():
    paths = sorted(glob.glob(str(REFERENCE_IMAGES / "camera_0_img_*.jpg")))[:4]
    batch = native.decode_jpeg_batch(paths, 480, 960)
    assert batch.shape == (len(paths), 480, 960, 3)
    for i, p in enumerate(paths):
        ref = discovery.read_image(p)
        np.testing.assert_array_equal(batch[i], ref)


def test_jpeg_batch_missing_file_raises():
    with pytest.raises(IOError):
        native.decode_jpeg_batch(["/nonexistent/file.jpg"], 480, 960)


def test_video_reader_streams_all_frames():
    with native.VideoReader(str(REFERENCE_IMAGES / "camera_0.mp4")) as vr:
        assert (vr.width, vr.height) == (960, 480)
        frames = list(vr)
    assert len(frames) == 15
    assert frames[0].shape == (480, 960, 3)


def test_video_reader_frames_match_cv2():
    import cv2

    with native.VideoReader(str(REFERENCE_IMAGES / "camera_1.mp4")) as vr:
        native_frames = list(vr)
    cap = cv2.VideoCapture(str(REFERENCE_IMAGES / "camera_1.mp4"))
    i = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        rgb = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
        diff = np.abs(
            native_frames[i].astype(int) - rgb.astype(int)
        )
        # different YUV->RGB implementations may round differently
        assert diff.max() <= 4, f"frame {i} max diff {diff.max()}"
        i += 1
    cap.release()
    assert i == len(native_frames)
