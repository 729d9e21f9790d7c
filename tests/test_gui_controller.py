"""Headless tests of the GUI state machine (VERDICT r2 #8).

The reference GUI's interaction flow (df3d/gui.py:269-322, 437-463) is all
inside a Qt class and untestable without a display; here the same logic
lives in the Qt-free ``GuiController`` and is exercised end-to-end against
a seeded Core — navigation clamping, mode gating, the click-drag
correction flow, error jumps, save, and the keyboard map.
"""

import numpy as np
import pytest

from deepfly3d_tpu.core import Core
from deepfly3d_tpu.gui_controller import GuiController
from deepfly3d_tpu.io import result_schema


@pytest.fixture()
def ctl(working_images, golden_2d, golden_3d):
    core = Core(
        input_folder=working_images,
        output_folder=working_images + "_df3d",
        num_images_max=0,
        camera_ordering=[0, 1, 2, 3, 4, 5, 6],
    )
    core.points2d = golden_2d["points2d"].copy()
    core.conf = golden_2d["heatmap_confidence"]
    core.calib = result_schema.extract_calib(golden_3d)
    return GuiController(core)


class TestNavigation:
    def test_clamping(self, ctl):
        assert ctl.img_id == 0
        ctl.prev_image()
        assert ctl.img_id == 0          # clamped at the start
        ctl.next_image()
        assert ctl.img_id == 1
        ctl.last_image()
        assert ctl.img_id == ctl.core.max_img_id
        ctl.next_image()
        assert ctl.img_id == ctl.core.max_img_id   # clamped at the end
        ctl.first_image()
        assert ctl.img_id == 0

    def test_goto(self, ctl):
        ok, msg = ctl.goto("3")
        assert ok and msg is None and ctl.img_id == 3
        ok, msg = ctl.goto("not-a-number")
        assert not ok and "image id" in msg and ctl.img_id == 3
        ok, msg = ctl.goto("99999")
        assert not ok and ctl.img_id == 3


class TestModes:
    def test_mode_gating_without_pose(self, working_images):
        core = Core(working_images, working_images + "_df3d", 0,
                    [0, 1, 2, 3, 4, 5, 6])
        # fresh output dir -> no resume, no pose
        ctl = GuiController(core)
        if core.has_pose:
            pytest.skip("resumed a previous result; gating untestable here")
        assert not ctl.set_mode("pose")
        assert not ctl.set_mode("correction")
        assert ctl.mode == "image"
        assert not ctl.joint_filter_enabled

    def test_modes_with_pose(self, ctl):
        assert ctl.set_mode("pose")
        assert ctl.joint_filter_enabled
        assert ctl.set_mode("correction")
        assert ctl.set_mode("image")
        assert not ctl.joint_filter_enabled

    def test_render_each_mode(self, ctl):
        for mode in ("image", "pose", "correction"):
            ctl.set_mode(mode)
            img = ctl.render(0)
            assert img.shape == (480, 960, 3)
        # joint filter restricts the overlay
        ctl.set_mode("pose")
        ctl.set_joint_filter([0])
        img_one = ctl.render(0)
        ctl.set_joint_filter([])
        img_all = ctl.render(0)
        assert (img_one != img_all).any()


class TestCorrectionFlow:
    def test_press_outside_correction_mode(self, ctl):
        ctl.set_mode("pose")
        assert not ctl.press(0, 10, 10, 960, 480)
        assert ctl.joint_being_dragged is None

    def test_press_drag_release(self, ctl):
        ctl.set_mode("correction")
        # press on joint 2's predicted location (view == image scale);
        # joint 2 is correctable (not in the skeleton's ignore list,
        # which excludes body-coxa/coxa-femur/stripe joints from the
        # >30 px persistence check, reference core.py:522)
        pts = ctl.core.points2d_pixels_xy(0, 0)
        x, y = pts[2]
        assert ctl.press(0, x, y, 960, 480)
        assert ctl.joint_being_dragged == 2
        # drag far away (>30 px threshold): persists a correction
        assert ctl.drag(0, x + 120, y + 60, 960, 480)
        assert ctl.core.db.read(0, 0) is not None
        after = ctl.core.corrected_points2d(0, 0)
        assert abs(after[2, 0] - (x + 120)) < 2
        assert ctl.release()
        assert not ctl.release()   # idempotent
        # dragging back under threshold erases the correction
        assert ctl.press(0, x + 120, y + 60, 960, 480)
        assert ctl.joint_being_dragged == 2
        ctl.drag(0, x, y, 960, 480)
        assert ctl.core.db.read(0, 0) is None
        ctl.release()

    def test_view_scaling(self, ctl):
        """Widget coords map through the view size (reference
        gui.py:449-450): half-size view -> doubled pixel coords."""
        px, py = ctl.view_to_pixels(100, 50, 480, 240)
        assert (px, py) == (200.0, 100.0)


class TestActionsAndKeys:
    def test_error_navigation(self, ctl):
        ok, msg = ctl.next_error()
        # golden data: whether an error frame exists is data-dependent —
        # both branches must behave (jump or message)
        if ok:
            assert ctl.img_id > 0 and msg is None
        else:
            assert "next images" in msg
        ctl.last_image()
        ok2, msg2 = ctl.next_error()
        assert not ok2 and "next images" in msg2

    def test_auto_correct_requires_calibration(self, ctl):
        ctl.core.calib = None
        ok, msg = ctl.auto_correct()
        assert not ok and "calibration" in msg

    def test_save_writes_result_and_corrections(self, ctl):
        import os

        ctl.save()
        assert os.path.exists(ctl.core.save_path)

    def test_key_map(self, ctl):
        ctl.goto("2")
        assert ctl.handle_key("a") and ctl.img_id == 1
        assert ctl.handle_key("D") and ctl.img_id == 2
        assert ctl.handle_key("X") and ctl.mode == "pose"
        assert ctl.handle_key("C") and ctl.mode == "correction"
        assert ctl.handle_key("I") and ctl.mode == "image"
        assert ctl.handle_key("T")   # save
        assert not ctl.handle_key("Q")
