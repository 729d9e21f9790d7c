"""Inference plumbing tests with a tiny random model (CPU).

Covers folder enumeration, batching/padding, flip handling, and the
streaming-video path — independent of trained weights.
"""

import numpy as np
import pytest

import jax

from deepfly3d_tpu.models.hourglass import HourglassSpec, init_params, save_weights
from deepfly3d_tpu.models.inference import PoseEstimator

TINY = HourglassSpec(num_stacks=1, features=16, depth=2, num_blocks=1, num_classes=19)


@pytest.fixture(scope="module")
def tiny_checkpoint(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("w") / "tiny.npz")
    variables = init_params(TINY, (64, 128), jax.random.PRNGKey(0))
    save_weights(path, variables, TINY)
    return path


def test_infer_folder_shapes(tiny_checkpoint, working_images):
    est = PoseEstimator(tiny_checkpoint, input_shape=(64, 128))
    pts, conf = est.infer_folder(
        working_images, camera_ids_to_flip=[4, 5, 6], max_img_id=2, batch_size=4
    )
    assert pts.shape == (7, 3, 19, 2)
    assert conf.shape == (7, 3, 19, 1)
    assert pts.dtype == np.float64
    assert (pts >= 0).all() and (pts <= 1).all()


def test_batch_padding_consistency(tiny_checkpoint, working_images):
    """Results must not depend on the batch size (incl. ragged last batch)."""
    est = PoseEstimator(tiny_checkpoint, input_shape=(64, 128))
    a = est.infer_folder(working_images, [4, 5, 6], max_img_id=1, batch_size=3)
    b = est.infer_folder(working_images, [4, 5, 6], max_img_id=1, batch_size=14)
    np.testing.assert_allclose(a[0], b[0], atol=1e-6)
    np.testing.assert_allclose(a[1], b[1], atol=1e-5)


def test_flip_changes_result(tiny_checkpoint, working_images):
    est = PoseEstimator(tiny_checkpoint, input_shape=(64, 128))
    no_flip, _ = est.infer_folder(working_images, [], max_img_id=0, batch_size=7)
    flipped, _ = est.infer_folder(
        working_images, [0, 1, 2, 3, 4, 5, 6], max_img_id=0, batch_size=7
    )
    assert not np.allclose(no_flip, flipped)


def test_infer_videos_streaming(tiny_checkpoint, working_videos):
    est = PoseEstimator(tiny_checkpoint, input_shape=(64, 128))
    pts, conf = est.infer_videos(
        working_videos, camera_ids_to_flip=[4, 5, 6], batch_size=8, max_frames=3
    )
    assert pts.shape == (7, 3, 19, 2)
    assert conf.shape == (7, 3, 19, 1)


def test_fused_estimator_matches_unfused(tiny_checkpoint, working_images):
    """fused=True (folded-BN production path) must reproduce the keypoints
    of the reference Flax path on real sample images."""
    plain = PoseEstimator(tiny_checkpoint, input_shape=(64, 128))
    fused = PoseEstimator(tiny_checkpoint, input_shape=(64, 128), fused=True)
    pts_a, conf_a = plain.infer_folder(working_images, [4, 5, 6], max_img_id=1)
    pts_b, conf_b = fused.infer_folder(working_images, [4, 5, 6], max_img_id=1)
    np.testing.assert_allclose(pts_b, pts_a, atol=1e-6)
    np.testing.assert_allclose(conf_b, conf_a, atol=1e-3)


def test_infer_videos_chunked_matches_unchunked(tiny_checkpoint, working_videos):
    """Chunked streaming (bounded host memory) must give identical results
    to processing each video in one piece."""
    est = PoseEstimator(tiny_checkpoint, input_shape=(64, 128))
    whole = est.infer_videos(working_videos, [4, 5, 6], max_frames=6,
                             chunk_frames=512)
    chunked = est.infer_videos(working_videos, [4, 5, 6], max_frames=6,
                               chunk_frames=2)
    np.testing.assert_allclose(chunked[0], whole[0], atol=1e-6)
    np.testing.assert_allclose(chunked[1], whole[1], atol=1e-5)


def test_infer_folder_chunked_matches_unchunked(tiny_checkpoint, working_images):
    """The bounded-memory folder ingest (chunk_images) is bit-identical to
    the single-shot path — long JPEG recordings no longer materialize
    every decoded frame at once (the video path got the same bound in
    round 3 via chunk_frames)."""
    est = PoseEstimator(tiny_checkpoint, input_shape=(64, 128))
    full = est.infer_folder(
        working_images, [4, 5, 6], max_img_id=2, batch_size=4,
        chunk_images=10_000,
    )
    chunked = est.infer_folder(
        working_images, [4, 5, 6], max_img_id=2, batch_size=4,
        chunk_images=5,   # forces several chunks over the 21 images,
                          # incl. a ragged final chunk (rounds to 4)
    )
    np.testing.assert_array_equal(full[0], chunked[0])
    np.testing.assert_array_equal(full[1], chunked[1])


def test_infer_folder_chunked_heatmaps(tiny_checkpoint, working_images):
    est = PoseEstimator(tiny_checkpoint, input_shape=(64, 128))
    full = est.infer_folder(
        working_images, [4, 5, 6], max_img_id=1, batch_size=4,
        return_heatmap=True, chunk_images=10_000,
    )
    chunked = est.infer_folder(
        working_images, [4, 5, 6], max_img_id=1, batch_size=4,
        return_heatmap=True, chunk_images=4,
    )
    np.testing.assert_array_equal(full[2], chunked[2])
