"""Batched multi-recording eval: per-recording equivalence with the
sequential tracker.

The BatchedTracker advances R recordings in one jitted step (the TPU
analog of the reference's Pool(8) over sequences,
run_eval_known_skeleton.py:116-119). These tests prove the batching is
semantically invisible: each recording's results match running it alone
through the sequential ``track_recording`` path, including ragged lengths
and per-recording camera extrinsics / temporal memory.
"""

import dataclasses

import jax
import numpy as np
import pytest

from absolutetrack_tpu.apps import eval_lib
from absolutetrack_tpu.models import ModelConfig, UmeTrackModel, init_umetrack_params
from absolutetrack_tpu.tracker.video_data import SyntheticFrameSource, load_labels

LABELS = "/root/reference/sample_data/user05/recording_00.json"


@pytest.fixture(scope="module")
def model():
    cfg = ModelConfig()
    return UmeTrackModel(init_umetrack_params(jax.random.PRNGKey(0), cfg), cfg)


@pytest.fixture(scope="module")
def recordings():
    """Three pseudo-recordings sliced from the sample labels at different
    offsets and ragged lengths (so their cameras/poses/frames differ)."""
    labels = load_labels(LABELS)
    lm = eval_lib.gt_landmark_sequence(labels)

    def rec(start, length):
        sl = slice(start, start + length)
        lab = dataclasses.replace(
            labels,
            camera_to_world=labels.camera_to_world[sl],
            joint_angles=labels.joint_angles[sl],
            wrist_transforms=labels.wrist_transforms[sl],
            hand_confidences=labels.hand_confidences[sl],
        )
        frames = list(SyntheticFrameSource(lab, lm[sl]))
        return lab, frames

    return [rec(100, 4), rec(140, 5), rec(60, 3)]


class TestBatchedEquivalence:
    def test_matches_sequential_per_recording(self, model, recordings):
        # pipelined=False: this guards the lockstep BatchedTracker scan path
        # bit-tightly; the pipelined dataflow's equivalence (conv batch
        # changes reorder reductions) is pinned in tests/test_pipelined.py
        batched = eval_lib.track_recordings_batched(
            model, recordings, pipelined=False
        )
        assert len(batched) == 3
        for (lab, frames), bres in zip(recordings, batched):
            sres = eval_lib.track_recording(
                model, lab, iter(frames), pipelined=False
            )
            assert bres.tracked_keypoints.shape == sres.tracked_keypoints.shape
            np.testing.assert_array_equal(bres.valid_tracking, sres.valid_tracking)
            m = sres.valid_tracking
            np.testing.assert_allclose(
                bres.tracked_keypoints[m],
                sres.tracked_keypoints[m],
                rtol=1e-4,
                atol=5e-3,  # mm; conv batch-size change reorders reductions
            )
            np.testing.assert_allclose(
                bres.joint_angles[m], sres.joint_angles[m], rtol=1e-4, atol=1e-4
            )
            np.testing.assert_array_equal(bres.gt_keypoints, sres.gt_keypoints)

    def test_memory_carries_across_chunks(self, model, recordings):
        """Chunk-size invariance for the batched path: the temporal memory
        must carry across dispatch boundaries."""
        a = eval_lib.track_recordings_batched(
            model, recordings, chunk_size=2, pipelined=False
        )
        b = eval_lib.track_recordings_batched(
            model, [(lab, iter(fr)) for lab, fr in recordings], chunk_size=8,
            pipelined=False,
        )
        for ra, rb in zip(a, b):
            np.testing.assert_allclose(
                ra.tracked_keypoints, rb.tracked_keypoints, rtol=1e-5, atol=1e-4
            )
            np.testing.assert_array_equal(ra.valid_tracking, rb.valid_tracking)

    def test_calibrate_scale_branch(self, model, recordings):
        res = eval_lib.track_recordings_batched(
            model, [(lab, iter(fr)) for lab, fr in recordings], calibrate_scale=True
        )
        for (lab, _), r in zip(recordings, res):
            assert r.predicted_scales is not None
            assert r.predicted_scales.shape == (2, len(lab))
            assert np.isfinite(r.predicted_scales[r.valid_tracking]).all()
