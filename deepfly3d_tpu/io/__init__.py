"""Persistence, file discovery and media ingest."""

from deepfly3d_tpu.io.discovery import (
    construct_image_name,
    get_max_img_id,
    parse_img_name,
    parse_vid_name,
)
from deepfly3d_tpu.io.result_schema import load_result, result_filename, save_result
from deepfly3d_tpu.io.posedb import PoseDB

__all__ = [
    "construct_image_name",
    "get_max_img_id",
    "parse_img_name",
    "parse_vid_name",
    "load_result",
    "save_result",
    "result_filename",
    "PoseDB",
]
