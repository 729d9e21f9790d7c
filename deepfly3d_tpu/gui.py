"""``df3d`` — PyQt5 correction GUI.

Feature parity with the reference GUI (reference df3d/gui.py): a 2x3 camera
grid with Image / Pose / Correction modes, click-drag manual joint
correction, keyboard navigation (A/D/I/X/C/T), jump-to-error buttons.
Differences are deliberate fixes of the reference's dead code (SURVEY §5
known-bugs): the Save key calls working methods, error navigation uses the
reprojection-error API that this Core actually implements, and the CLI
args are parsed positionally without clobbering the output folder.

PyQt5 is optional at import time — the module raises a clear error only
when the GUI is actually launched without PyQt5 installed.
"""

from __future__ import annotations

import glob
import os
import re
import sys

import numpy as np

try:
    from PyQt5 import QtWidgets as QW
    from PyQt5.QtCore import QEvent, Qt
    from PyQt5.QtGui import QImage, QPixmap

    HAS_PYQT = True
except ImportError:  # headless environments
    HAS_PYQT = False
    QW = None


def parse_cli_args(argv):
    """df3d [input_folder] [num_images_max]"""
    args = {"input_folder": None, "num_images_max": None}
    if len(argv) > 1:
        args["input_folder"] = argv[1]
    if len(argv) > 2:
        try:
            args["num_images_max"] = int(argv[2])
        except ValueError:
            pass
    return args


def main():
    if not HAS_PYQT:
        raise SystemExit(
            "The df3d GUI requires PyQt5 (pip install PyQt5). "
            "The processing pipeline itself is available via df3d-cli."
        )
    cli_args = parse_cli_args(sys.argv)
    input_folder = cli_args["input_folder"]
    assert input_folder, "Usage: df3d <input_folder> [num_images_max]"
    assert glob.glob(
        os.path.join(input_folder + "_df3d", "df3d_result*.pkl")
    ) or glob.glob(os.path.join(input_folder, "df3d_result*.pkl")), (
        f"Before running the GUI, run df3d-cli on folder {input_folder} "
        "first and generate a df3d_result file"
    )
    app = QW.QApplication([])
    window = DeepflyGUI()
    window.setup(**cli_args)
    window.set_width(app.desktop().size().width())
    window.show()
    app.exec_()


if HAS_PYQT:

    class DeepflyGUI(QW.QWidget):
        def __init__(self):
            super().__init__()
            self.img_id = 0
            self.core = None
            self.joint_being_dragged = None

        # ------------------------------------------------------------ setup

        def setup(self, input_folder=None, num_images_max=None):
            from deepfly3d_tpu.core import Core

            if not input_folder:
                input_folder = self.prompt_for_directory()
            self.core = Core(input_folder, None, num_images_max, None)
            self.setup_layout()
            self.onclick_image_mode()

        def set_width(self, width):
            hw_ratio = self.core.image_shape[0] * 1.2 / self.core.image_shape[1]
            self.resize(width, int(width / hw_ratio))

        def setup_layout(self):
            def mb(text, on_click, checkable=False):
                b = QW.QPushButton(text, self)
                b.setMaximumWidth(
                    b.fontMetrics().boundingRect(text).width() + 27
                )
                b.clicked.connect(on_click)
                b.setCheckable(checkable)
                return b

            self.button_first = mb("<<", self.onclick_first_image)
            self.button_prev = mb("<", self.onclick_prev_image)
            self.button_next = mb(">", self.onclick_next_image)
            self.button_last = mb(">>", self.onclick_last_image)
            self.button_prev_err = mb("< previous error", self.onclick_prev_error)
            self.button_next_err = mb("next error >", self.onclick_next_error)
            self.button_save = mb("Save", self.onclick_save)
            # the auto-correct hook the reference left commented out
            # (reference gui.py:83-85, 300-301), backed by the working
            # pictorial-structures MAP (Core.solve_pictorial)
            self.button_auto_correct = mb(
                "Auto-correct", self.onclick_auto_correct
            )
            self.button_image_mode = mb("Image", self.onclick_image_mode, True)
            self.button_pose_mode = mb("Pose", self.onclick_pose_mode, True)
            self.button_correction_mode = mb(
                "Correction", self.onclick_correction_mode, True
            )
            button_go = mb("Go", self.onclick_goto_img)

            self.textbox_img_id = QW.QLineEdit(str(self.img_id), self)
            self.textbox_img_id.setFixedWidth(100)

            self.combo_joint_id = QW.QComboBox(self)
            self.combo_joint_id.addItem("View all joints", [])
            for i in range(self.core.number_of_joints):
                self.combo_joint_id.addItem(f"View joint {i}", [i])
            self.combo_joint_id.activated.connect(self.update_frame)

            def image_view(cam_id):
                iv = QW.QLabel()
                iv.setScaledContents(True)
                iv.cam_id = cam_id
                iv.installEventFilter(self)
                return iv

            top = [image_view(c) for c in (0, 1, 2)]
            bottom = [image_view(c) for c in (4, 5, 6)]
            self.image_views = top + bottom

            row_top = QW.QHBoxLayout()
            row_bottom = QW.QHBoxLayout()
            for iv in top:
                row_top.addWidget(iv)
            for iv in bottom:
                row_bottom.addWidget(iv)

            modes = QW.QHBoxLayout()
            modes.setAlignment(Qt.AlignRight)
            modes.addWidget(self.button_save)
            modes.addWidget(self.button_auto_correct)
            modes.addStretch()
            modes.addWidget(self.button_image_mode)
            modes.addWidget(self.button_pose_mode)
            modes.addWidget(self.button_correction_mode)

            nav = QW.QHBoxLayout()
            for w in (
                self.button_first, self.button_prev, self.button_next,
                self.button_last, self.textbox_img_id, button_go,
            ):
                nav.addWidget(w)
            nav.addStretch()
            nav.addWidget(self.button_prev_err)
            nav.addWidget(self.button_next_err)
            nav.addStretch()
            nav.addWidget(self.combo_joint_id)

            layout = QW.QVBoxLayout()
            layout.addLayout(modes)
            layout.addLayout(row_top)
            layout.addLayout(row_bottom)
            layout.addLayout(nav)
            self.setLayout(layout)
            self.setWindowTitle(self.core.input_folder)

        # ------------------------------------------------------- navigation

        def onclick_first_image(self):
            self.display_img(0)

        def onclick_last_image(self):
            self.display_img(self.core.max_img_id)

        def onclick_prev_image(self):
            self.display_img(max(self.img_id - 1, 0))

        def onclick_next_image(self):
            self.display_img(min(self.core.max_img_id, self.img_id + 1))

        def onclick_prev_error(self):
            prev_img = self.core.prev_error(self.img_id)
            if prev_img is not None:
                self.display_img(prev_img)
            else:
                self.display_error_message("No error remaining among previous images")

        def onclick_next_error(self):
            next_img = self.core.next_error(self.img_id)
            if next_img is not None:
                self.display_img(next_img)
            else:
                self.display_error_message("No error remaining among next images")

        def onclick_goto_img(self):
            try:
                self.display_img(int(self.textbox_img_id.text()))
                self.setFocus()
            except (ValueError, AssertionError):
                self.display_error_message("Textbox content should be an image id")
                self.textbox_img_id.setText(str(self.img_id))

        def onclick_save(self):
            self.core.save()
            self.core.save_corrections()

        def onclick_auto_correct(self):
            """Pictorial-structures MAP over the camera graph; corrected
            leg keypoints are written into the session's points2d."""
            if not self.core.has_calibration:
                self.display_error_message(
                    "Auto-correct needs calibration — run df3d-cli first."
                )
                return
            self.core.solve_pictorial()
            self.update_frame()

        # ------------------------------------------------------------ modes

        def uncheck_mode_buttons(self):
            for b in (
                self.button_image_mode,
                self.button_pose_mode,
                self.button_correction_mode,
            ):
                b.setChecked(False)

        def onclick_image_mode(self):
            self.uncheck_mode_buttons()
            self.button_image_mode.setChecked(True)
            self.combo_joint_id.setEnabled(False)
            self.display_method = lambda c, i, j: self.core.get_image(c, i)
            self.update_frame()

        def onclick_pose_mode(self):
            if not self.core.has_pose:
                return
            self.uncheck_mode_buttons()
            self.button_pose_mode.setChecked(True)
            self.combo_joint_id.setEnabled(True)
            self.display_method = lambda c, i, j: self.core.plot_2d(c, i, joints=j)
            self.update_frame()

        def onclick_correction_mode(self):
            if not self.core.has_pose:
                return
            self.uncheck_mode_buttons()
            self.button_correction_mode.setChecked(True)
            self.combo_joint_id.setEnabled(True)
            self.display_method = lambda c, i, j: self.core.plot_2d(
                c, i, with_corrections=True, joints=j
            )
            self.update_frame()

        # ---------------------------------------------------------- display

        def display_img(self, img_id):
            assert 0 <= img_id <= self.core.max_img_id
            self.img_id = img_id
            self.textbox_img_id.setText(str(img_id))
            self.update_frame()

        def update_frame(self, *_):
            joints = self.combo_joint_id.currentData() or []
            for iv in self.image_views:
                image = self.display_method(iv.cam_id, self.img_id, joints)
                self._set_image(iv, image)

        def _set_image(self, image_view, image: np.ndarray):
            image = np.ascontiguousarray(image)
            h, w, _ = image.shape
            qimg = QImage(image.data, w, h, 3 * w, QImage.Format_RGB888)
            image_view.setPixmap(QPixmap.fromImage(qimg))

        def display_error_message(self, message):
            QW.QMessageBox.warning(self, "Error", message)

        def prompt_for_directory(self):
            return str(
                QW.QFileDialog.getExistingDirectory(
                    self,
                    directory="./",
                    caption="Select Directory",
                    options=QW.QFileDialog.DontUseNativeDialog,
                )
            )

        # ---------------------------------------------------- interactions

        def keyPressEvent(self, event):
            key = event.key()
            if key == Qt.Key_A:
                self.onclick_prev_image()
            elif key == Qt.Key_D:
                self.onclick_next_image()
            elif key == Qt.Key_I:
                self.onclick_image_mode()
            elif key == Qt.Key_X:
                self.onclick_pose_mode()
            elif key == Qt.Key_C:
                self.onclick_correction_mode()
            elif key == Qt.Key_T:
                self.onclick_save()

        def eventFilter(self, source, event):
            """Click-drag joint correction (reference gui.py:437-463)."""
            if not self.button_correction_mode.isChecked():
                return super().eventFilter(source, event)
            cam_id = getattr(source, "cam_id", None)
            if cam_id is None:
                return super().eventFilter(source, event)
            w, h = self.core.image_shape
            if event.type() == QEvent.MouseButtonPress:
                x = event.pos().x() * w / source.width()
                y = event.pos().y() * h / source.height()
                self.joint_being_dragged = self.core.nearest_joint(
                    cam_id, self.img_id, x, y
                )
                return True
            if (
                event.type() == QEvent.MouseMove
                and self.joint_being_dragged is not None
            ):
                x = event.pos().x() * w / source.width()
                y = event.pos().y() * h / source.height()
                self.core.move_joint(
                    cam_id, self.img_id, self.joint_being_dragged, x, y
                )
                self.update_frame()
                return True
            if event.type() == QEvent.MouseButtonRelease:
                self.joint_being_dragged = None
                return True
            return super().eventFilter(source, event)

else:

    class DeepflyGUI:  # pragma: no cover - placeholder for headless installs
        def __init__(self, *a, **k):
            raise ImportError("PyQt5 is required for the DeepFly GUI")
