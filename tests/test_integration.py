"""End-to-end integration: full tracker + eval apps on real sample labels.

Uses the bundled recording labels with synthetic rendered frames (the mp4s
are absent from the mount). With random weights the *accuracy* is
meaningless; these tests assert the machinery: shapes, masks, memory
carry-over, determinism, and app-level plumbing.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from absolutetrack_tpu.apps import eval_lib
from absolutetrack_tpu.models import ModelConfig, UmeTrackModel, init_umetrack_params
from absolutetrack_tpu.tracker import HandTracker, TrackerConfig
from absolutetrack_tpu.tracker.video_data import SyntheticFrameSource, load_labels

LABELS = "/root/reference/sample_data/user05/recording_00.json"


@pytest.fixture(scope="module")
def labels():
    return load_labels(LABELS)


@pytest.fixture(scope="module")
def model():
    cfg = ModelConfig()
    return UmeTrackModel(init_umetrack_params(jax.random.PRNGKey(0), cfg), cfg)


@pytest.fixture(scope="module")
def frames(labels):
    lm = eval_lib.gt_landmark_sequence(labels)
    return SyntheticFrameSource(labels, lm)


class TestTrackRecording:
    def test_tracks_frames_and_shapes(self, model, labels, frames):
        res = eval_lib.track_recording(model, labels, frames, max_frames=3)
        assert res.tracked_keypoints.shape == (2, 3, 21, 3)
        assert res.valid_tracking.any()
        assert np.isfinite(res.tracked_keypoints[res.valid_tracking]).all()
        # GT landmarks must be sane (within ~1m of origin, in mm)
        assert np.abs(res.gt_keypoints[res.valid_tracking]).max() < 2000

    def test_memory_warms_up(self, model, labels, frames):
        """Frame 2 must consume memory from frame 1: outputs with memory
        enabled vs disabled diverge after the first frame."""
        res_mem = eval_lib.track_recording(
            model, labels, frames, opts=TrackerConfig(enable_memory=True), max_frames=2
        )
        res_nomem = eval_lib.track_recording(
            model, labels, frames, opts=TrackerConfig(enable_memory=False), max_frames=2
        )
        # first frame identical (cold start either way)
        np.testing.assert_allclose(
            res_mem.tracked_keypoints[:, 0], res_nomem.tracked_keypoints[:, 0], atol=2e-2
        )
        assert not np.allclose(
            res_mem.tracked_keypoints[:, 1], res_nomem.tracked_keypoints[:, 1], atol=1e-3
        )

    def test_deterministic(self, model, labels, frames):
        r1 = eval_lib.track_recording(model, labels, frames, max_frames=2)
        r2 = eval_lib.track_recording(model, labels, frames, max_frames=2)
        np.testing.assert_array_equal(r1.tracked_keypoints, r2.tracked_keypoints)

    def test_calibrate_scale_branch(self, model, labels, frames):
        res = eval_lib.track_recording(
            model, labels, frames, calibrate_scale=True, max_frames=2
        )
        assert res.predicted_scales is not None
        s = res.predicted_scales[res.valid_tracking]
        assert (s > 0).all() and np.isfinite(s).all()


class TestPackedPath:
    def test_pack_and_infer(self, tmp_path, model):
        from absolutetrack_tpu.apps import pack_sample_data, run_inference_torch_data
        from absolutetrack_tpu.data import PackedDataset, find_dataset_folders
        from absolutetrack_tpu.data.transform import preprocess_packed

        out = str(tmp_path / "torch_data")
        pack_sample_data.main(
            [
                "--input-dir", os.path.dirname(LABELS),
                "--output-dir", out,
                "--window", "2",
                "--max-frames", "4",
            ]
        )
        folders = find_dataset_folders(out, ["mono", "labels"])
        assert folders, "packing produced no folders"
        ds = PackedDataset(folders, ["mono", "labels"])
        assert len(ds) > 0
        s = ds[0]
        seq = preprocess_packed(np.asarray(s["mono"]), s["labels"])
        assert seq.left_images.shape[1:] == (2, 96, 96)
        assert float(seq.left_images.max()) <= 1.0
        # crop contract: enclosing points project inside the crop
        from absolutetrack_tpu.geometry import camera as cam

        enc = jnp.asarray(s["labels"]["enclosing_points"], jnp.float32) * 0.001
        K = seq.intrinsics  # (T, V, 3, 3)
        w2e = seq.extrinsics
        eye = jnp.einsum("tvij,tpj->tvpi", w2e[..., :3, :3], enc) + w2e[..., None, :3, 3]
        ndc = eye[..., :2] / eye[..., 2:3]
        win = ndc * jnp.stack(
            [K[..., 0, 0], K[..., 1, 1]], -1
        )[..., None, :] + jnp.stack([K[..., 0, 2], K[..., 1, 2]], -1)[..., None, :]
        w = np.asarray(win)
        assert (w >= -0.5).all() and (w <= 95.5).all()

        err = np.asarray(run_inference_torch_data.eval_window(model, seq))
        assert err.shape == (2,)
        assert np.isfinite(err).all()

    def test_batched_windows_match_b1(self, tmp_path, model):
        """W windows per dispatch (the reference's bs=160 lockstep,
        run_inference_torch_data.py:164-185) must reproduce the B=1 loop's
        per-window errors exactly -- per-window compute is independent."""
        from absolutetrack_tpu.apps import pack_sample_data, run_inference_torch_data
        from absolutetrack_tpu.data import PackedDataset, find_dataset_folders
        from absolutetrack_tpu.data.transform import preprocess_packed

        out = str(tmp_path / "torch_data")
        pack_sample_data.main(
            ["--input-dir", os.path.dirname(LABELS), "--output-dir", out,
             "--window", "2", "--max-frames", "6"]
        )
        ds = PackedDataset(find_dataset_folders(out, ["mono", "labels"]),
                           ["mono", "labels"])
        n = min(len(ds), 3)
        seqs = [
            preprocess_packed(np.asarray(ds[i]["mono"]), ds[i]["labels"])
            for i in range(n)
        ]
        single = np.stack([
            np.asarray(run_inference_torch_data.eval_window(model, s))
            for s in seqs
        ])
        stacked = run_inference_torch_data.stack_windows(seqs + [seqs[-1]])
        batched = np.asarray(
            run_inference_torch_data.eval_windows_batched(model, stacked)
        )
        assert batched.shape == (n + 1, single.shape[1])
        np.testing.assert_allclose(batched[:n], single, rtol=1e-6, atol=1e-4)
        # the pad row repeats the last real window
        np.testing.assert_allclose(batched[n], single[-1], rtol=1e-6, atol=1e-4)


class TestEvalApps:
    def test_known_skeleton_app_and_aggregation(self, tmp_path):
        from absolutetrack_tpu.apps import load_eval, run_eval_known_skeleton

        out = str(tmp_path / "eval_results_known_skeleton")
        run_eval_known_skeleton.main(
            [
                "--input-dir", os.path.dirname(LABELS),
                "--output-dir", out,
                "--max-frames", "3",
                "--override",
            ]
        )
        m = load_eval.aggregate_metrics(out)
        assert m is not None
        assert m["n_total"] == 2 * 3 * 3  # 3 recordings x 3 frames x 2 hands
        assert 0 < m["success_rate"] <= 1
        assert np.isfinite(m["mean_keypoint_error_mm"])


class TestSingleViewPackedPath:
    def test_single_view_differs_from_stereo(self, tmp_path, model):
        """--views 1 must exercise the single-view FTL path (different
        output than the fused stereo path on the same window)."""
        from absolutetrack_tpu.apps import pack_sample_data, run_inference_torch_data
        from absolutetrack_tpu.data import PackedDataset, find_dataset_folders
        from absolutetrack_tpu.data.transform import preprocess_packed

        out = str(tmp_path / "torch_data")
        pack_sample_data.main(
            ["--input-dir", os.path.dirname(LABELS), "--output-dir", out,
             "--window", "2", "--max-frames", "2"]
        )
        ds = PackedDataset(find_dataset_folders(out, ["mono", "labels"]), ["mono", "labels"])
        s = ds[0]
        seq = preprocess_packed(np.asarray(s["mono"]), s["labels"])
        err2 = np.asarray(run_inference_torch_data.eval_window(model, seq))
        err1 = np.asarray(
            run_inference_torch_data.eval_window(model, seq, n_views=1)
        )
        assert np.isfinite(err1).all() and np.isfinite(err2).all()
        assert not np.allclose(err1, err2)


class TestChunkInvariance:
    def test_chunk_size_does_not_change_results(self, model, labels, frames):
        """Chunked scan must be bit-equivalent to per-frame stepping.

        pipelined=False: the pipelined dataflow's chunk invariance (conv
        batch grows with the chunk, reordering reductions) is pinned with
        well-conditioned heads in tests/test_pipelined.py."""
        r1 = eval_lib.track_recording(
            model, labels, frames, max_frames=5, chunk_size=1, pipelined=False
        )
        r4 = eval_lib.track_recording(
            model, labels, frames, max_frames=5, chunk_size=4, pipelined=False
        )
        np.testing.assert_array_equal(r1.valid_tracking, r4.valid_tracking)
        np.testing.assert_allclose(
            r1.tracked_keypoints, r4.tracked_keypoints, atol=2e-2
        )


class TestReplayVisualizer:
    def test_headless_dump_with_crop_panels(self, tmp_path):
        """Drive the replay visualizer app headless with --crops: annotated
        view frames AND per-(hand,view) warped crop panels must be written
        (the reference's track_frame_analysis debug windows,
        lib/tracker/tracker.py:416-604)."""
        from absolutetrack_tpu.apps import run_replay_visualize as app

        out = str(tmp_path / "frames")
        app.main([
            "--labels", LABELS,
            "--max-frames", "2",
            "--dump-dir", out,
            "--no-udp",
            "--crops",
        ])
        files = sorted(os.listdir(out))
        assert "frame_0000.png" in files and "frame_0001.png" in files
        assert "crops_0000.png" in files and "crops_0001.png" in files
        import cv2

        panel = cv2.imread(os.path.join(out, "crops_0000.png"))
        # 2 hands x 2 views of 96x96 at scale 2
        assert panel.shape == (2 * 96 * 2, 2 * 96 * 2, 3)
        assert panel.max() > 30  # crops actually contain image content
