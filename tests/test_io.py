"""IO layer: naming, discovery, result schema, PoseDB, video expansion."""

import os
import pickle

import numpy as np
import pytest

from deepfly3d_tpu.io import (
    PoseDB,
    construct_image_name,
    get_max_img_id,
    parse_img_name,
    parse_vid_name,
)
from deepfly3d_tpu.io import discovery, result_schema


class TestNaming:
    def test_construct(self):
        assert construct_image_name(2, 5, pad=False) == "camera_2_img_5"
        assert construct_image_name(2, 5, pad=True) == "camera_2_img_000005"

    def test_parse_img(self):
        assert parse_img_name("camera_3_img_14.jpg") == (3, 14)
        assert parse_img_name("camera_0_img_000123") == (0, 123)

    def test_parse_vid(self):
        assert parse_vid_name("camera_5.mp4") == 5


class TestDiscovery:
    def test_max_img_id(self, working_images):
        assert get_max_img_id(working_images) == 14

    def test_max_img_id_missing(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            get_max_img_id(str(tmp_path))

    def test_expand_videos(self, working_videos):
        discovery.expand_videos(working_videos)
        assert get_max_img_id(working_videos) == 14
        img = discovery.read_image(
            os.path.join(working_videos, "camera_0_img_0.jpg")
        )
        assert img.shape == (480, 960, 3)
        # idempotent
        discovery.expand_videos(working_videos)
        assert get_max_img_id(working_videos) == 14

    def test_delete_images(self, working_videos):
        discovery.expand_videos(working_videos)
        discovery.delete_images(working_videos)
        import glob

        assert not glob.glob(os.path.join(working_videos, "*.jpg"))
        assert len(glob.glob(os.path.join(working_videos, "*.mp4"))) == 7

    def test_probe_fps(self, working_videos):
        fps = discovery.probe_fps(working_videos)
        assert fps is not None and fps > 0


class TestResultSchema:
    def test_round_trip(self, tmp_path, golden_3d):
        path = str(tmp_path / "df3d_result_x.pkl")
        calib = result_schema.extract_calib(golden_3d)
        result_schema.save_result(
            path,
            points2d=golden_3d["points2d"],
            camera_ordering=golden_3d["camera_ordering"],
            heatmap_confidence=golden_3d["heatmap_confidence"],
            calib=calib,
            points3d=golden_3d["points3d"],
            points3d_wo_procrustes=golden_3d["points3d_wo_procrustes"],
        )
        loaded = result_schema.load_result(path)
        assert set(loaded.keys()) == set(golden_3d.keys())
        for k in ("points2d", "points3d", "points3d_wo_procrustes"):
            np.testing.assert_array_equal(loaded[k], golden_3d[k])
        for c in range(7):
            for key in ("R", "tvec", "intr", "distort"):
                np.testing.assert_array_equal(loaded[c][key], golden_3d[c][key])

    def test_filename_mangling(self):
        assert (
            result_schema.result_filename("/a/b/c")
            == "df3d_result__a_b_c.pkl"
        )


class TestPoseDB:
    def test_create_write_reload(self, tmp_path):
        folder = str(tmp_path)
        db = PoseDB(folder)
        pts = np.random.default_rng(0).random((38, 2))
        db.write(pts, cam_id=1, img_id=3, train=True, modified_joints=[5])
        db.dump()

        db2 = PoseDB(folder)
        np.testing.assert_array_equal(db2.read(1, 3), pts)
        assert db2.read_modified_joints(1, 3) == [5]
        assert db2.read(0, 0) is None

        scaled = db2.manual_corrections(image_shape=(960, 480))
        np.testing.assert_allclose(scaled[1][3], pts * np.array([960, 480]))

    def test_remove(self, tmp_path):
        db = PoseDB(str(tmp_path))
        pts = np.zeros((38, 2))
        db.write(pts, 0, 0, True, [1])
        db.remove_corrections(0, 0)
        assert db.read(0, 0) is None
        assert db.read_modified_joints(0, 0) == []


class TestStageTimer:
    """utils/profiling.StageTimer — the CLI's -v stage metrics source."""

    def test_accumulates_and_summarizes(self):
        import json
        from deepfly3d_tpu.utils import StageTimer

        t = StageTimer()
        for _ in range(3):
            with t.stage("decode"):
                pass
        with t.stage("triangulate"):
            pass
        m = t.metrics(frames=15)
        assert m["decode"]["calls"] == 3
        assert m["triangulate"]["calls"] == 1
        assert m["_summary"]["frames"] == 15
        assert m["_summary"]["total_seconds"] >= 0.0
        json.loads(t.report(frames=15))       # report is valid JSON

    def test_exception_inside_stage_still_recorded(self):
        from deepfly3d_tpu.utils import StageTimer

        t = StageTimer()
        try:
            with t.stage("boom"):
                raise RuntimeError("x")
        except RuntimeError:
            pass
        assert t.counts["boom"] == 1

    def test_no_frames_no_summary(self):
        from deepfly3d_tpu.utils import StageTimer

        t = StageTimer()
        with t.stage("s"):
            pass
        assert "_summary" not in t.metrics()
