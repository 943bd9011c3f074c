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


class TestBatchedUnknownSkeletonTwoPass:
    """The full unknown-skeleton protocol (pass-1 scale calibration on the
    generic skeleton, then pass-2 retracking with the calibrated skeleton)
    run in LOCKSTEP must match running it sequentially per recording —
    the path run_eval_unknown_skeleton's --batch-recordings takes
    (reference parallelizes this protocol with Pool(8),
    run_eval_unknown_skeleton.py:160-168)."""

    def test_batched_two_pass_matches_sequential(self, model, recordings):
        from absolutetrack_tpu.apps.run_eval_unknown_skeleton import (
            calibrated_scale_from,
        )
        from absolutetrack_tpu.kinematics.hand_model import (
            load_hand_model_json,
            scaled_hand_model,
        )

        generic = load_hand_model_json(
            "/root/reference/dataset/generic_hand_model.json"
        )
        calib_frames = 3

        # --- sequential two-pass per recording
        seq_scales, seq_results = [], []
        for lab, frames in recordings:
            calib = eval_lib.track_recording(
                model, lab, iter(frames), hand_model_mm=generic,
                calibrate_scale=True, max_frames=calib_frames,
                pipelined=False,
            )
            s = calibrated_scale_from(calib, generic, "mean")
            seq_scales.append(s)
            seq_results.append(
                eval_lib.track_recording(
                    model, lab, iter(frames),
                    hand_model_mm=scaled_hand_model(generic, s),
                    min_num_crops=1, pipelined=False,
                )
            )

        # --- lockstep two-pass (the --batch-recordings dataflow)
        calibs = eval_lib.track_recordings_batched(
            model, [(lab, iter(fr)) for lab, fr in recordings],
            hand_models_mm=[generic] * len(recordings),
            calibrate_scale=True, max_frames=calib_frames, pipelined=False,
        )
        bat_scales = [
            calibrated_scale_from(c, generic, "mean") for c in calibs
        ]
        results = eval_lib.track_recordings_batched(
            model, [(lab, iter(fr)) for lab, fr in recordings],
            hand_models_mm=[
                scaled_hand_model(generic, s) for s in bat_scales
            ],
            min_num_crops=1, pipelined=False,
        )

        np.testing.assert_allclose(bat_scales, seq_scales, rtol=1e-4)
        for sres, bres in zip(seq_results, results):
            np.testing.assert_array_equal(
                bres.valid_tracking, sres.valid_tracking
            )
            m = sres.valid_tracking
            # rtol 1e-3 (vs 1e-4 in the single-pass test): the random-init
            # model's pass-2 feedback loop diverges to ~2e7 mm keypoints,
            # where batch-shape-dependent XLA fusion order (the planar
            # coord chain compiles differently at R=1 vs R=3) amplifies
            # fp noise chaotically. A real dataflow bug (wrong scale
            # pairing, crossed recordings) shows up at O(1) relative.
            np.testing.assert_allclose(
                bres.tracked_keypoints[m], sres.tracked_keypoints[m],
                rtol=1e-3, atol=5e-3,
            )
            np.testing.assert_array_equal(bres.gt_keypoints, sres.gt_keypoints)
