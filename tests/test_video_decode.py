"""Video-decode path: VideoFrameSource on synthesized width-stacked videos.

The real UmeTrack_data mp4s are absent from the mount, so this synthesizes
them: width-stacked mono multi-view frames encoded with cv2.VideoWriter,
decoded back through ``VideoFrameSource`` (the path real data hits first —
reference lib/tracker/video_pose_data.py:37-55 decode + :123-125 split),
asserting per-view split, shape, dtype, frame count, and content round
trip. A final test runs a real ``track_recording`` end-to-end off decoded
frames.

Codec notes (probed in this environment): PyAV is not installed, so the
cv2.VideoCapture fallback is the live decoder here. cv2 writes/reads
mp4v-in-mp4 (lossy, like the real data's container) and FFV1-in-avi
(lossless, for exact round-trip assertions).
"""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from absolutetrack_tpu.tracker.video_data import (
    VideoFrameSource,
    load_labels,
    split_stacked_frame,
)

LABELS_JSON = "/root/reference/sample_data/user05/recording_00.json"


def _write_video(path, frames, fourcc_name):
    h, w = frames[0].shape
    wr = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*fourcc_name), 30, (w, h), isColor=False
    )
    assert wr.isOpened(), f"{fourcc_name} encoder unavailable"
    for f in frames:
        wr.write(f)
    wr.release()
    assert os.path.getsize(path) > 0


def _stacked_frames(rng, t, v, h, w):
    """Smooth per-view content with a distinct per-view DC level, so a
    wrong split (off-by-one view, transposed axes) shows up as a gross
    content mismatch, not a subtle one."""
    frames = []
    for ti in range(t):
        views = []
        for vi in range(v):
            coarse = rng.uniform(0, 80, (h // 8, w // 8)).astype(np.float32)
            img = cv2.resize(coarse, (w, h), interpolation=cv2.INTER_LINEAR)
            views.append(np.clip(img + 40 * vi + 2 * ti, 0, 255))
        frames.append(np.concatenate(views, axis=1).astype(np.uint8))
    return frames


class TestSplitStackedFrame:
    def test_split_matches_reference_reshape(self):
        """split == the reference's reshape recipe
        (video_pose_data.py:123-125) == plain width slicing."""
        rng = np.random.default_rng(0)
        v, h, w = 4, 6, 10
        raw = rng.integers(0, 256, (h, v * w), dtype=np.uint8)
        out = split_stacked_frame(raw, v)
        assert out.shape == (v, h, w)
        for vi in range(v):
            np.testing.assert_array_equal(out[vi], raw[:, vi * w : (vi + 1) * w])


class TestVideoFrameSource:
    T, V, H, W = 7, 4, 48, 64

    def _roundtrip(self, tmp_path, fourcc, ext):
        rng = np.random.default_rng(1)
        frames = _stacked_frames(rng, self.T, self.V, self.H, self.W)
        path = str(tmp_path / f"views{ext}")
        _write_video(path, frames, fourcc)

        decoded = list(VideoFrameSource(path, self.V))
        assert len(decoded) == self.T
        for d in decoded:
            assert d.shape == (self.V, self.H, self.W)
            assert d.dtype == np.uint8
        return frames, decoded

    def test_ffv1_lossless_roundtrip(self, tmp_path):
        """FFV1 is lossless: decoded frames must equal the encoded split
        exactly (up to the encoder's mono->YUV->BGR colorspace identity,
        which is exact for FFV1 grayscale)."""
        frames, decoded = self._roundtrip(tmp_path, "FFV1", ".avi")
        for ti in range(self.T):
            expect = split_stacked_frame(frames[ti], self.V)
            delta = np.abs(
                decoded[ti].astype(np.int32) - expect.astype(np.int32)
            )
            # exact for true lossless; allow 1 LSB in case the pipeline
            # routes through a YUV identity with rounding
            assert delta.max() <= 1, delta.max()

    def test_mp4v_lossy_roundtrip(self, tmp_path):
        """mp4v-in-mp4 (the real data's container family): content must
        survive within lossy-codec tolerance and split per view."""
        frames, decoded = self._roundtrip(tmp_path, "mp4v", ".mp4")
        for ti in range(self.T):
            expect = split_stacked_frame(frames[ti], self.V).astype(np.float32)
            got = decoded[ti].astype(np.float32)
            assert np.abs(got - expect).mean() < 3.0
            # per-view DC levels differ by 40: a mis-split would show a
            # mean error ~40 on at least one view
            for vi in range(self.V):
                assert np.abs(got[vi] - expect[vi]).mean() < 10.0

    def test_missing_file_raises(self):
        with pytest.raises(Exception):
            list(VideoFrameSource("/nonexistent/path.mp4", 4))


class TestTrackFromDecodedVideo:
    def test_track_recording_end_to_end(self, tmp_path):
        """One real track_recording run off decoded video frames: the
        mp4 -> VideoFrameSource -> tracker chain the real UmeTrack_data
        will exercise (reference SyncedImagePoseStream,
        video_pose_data.py:96-153)."""
        import jax.numpy as jnp

        from absolutetrack_tpu.apps import eval_lib
        from absolutetrack_tpu.models import ModelConfig
        from absolutetrack_tpu.tracker import TrackerConfig

        labels = load_labels(LABELS_JSON)
        t, v = 4, labels.num_views
        h = int(np.asarray(labels.cameras.height).reshape(-1)[0])
        w = int(np.asarray(labels.cameras.width).reshape(-1)[0])

        # render the first frames from GT landmarks, stack, encode, decode
        lm = eval_lib.gt_landmark_sequence(labels)
        from absolutetrack_tpu.tracker.video_data import SyntheticFrameSource

        src = SyntheticFrameSource(labels, lm)
        rendered = [src.render_frame(ti) for ti in range(t)]  # (V, H, W) f32
        stacked = [
            np.concatenate(list(r.astype(np.uint8)), axis=1) for r in rendered
        ]
        path = str(tmp_path / "rec.avi")
        _write_video(path, stacked, "FFV1")

        model = eval_lib.build_model(None, cfg=ModelConfig(input_size=(32, 32)))
        res = eval_lib.track_recording(
            model,
            labels,
            VideoFrameSource(path, v),
            opts=TrackerConfig(crop_size=(32, 32)),
            max_frames=t,
            chunk_size=2,
        )
        assert res.tracked_keypoints.shape == (2, t, 21, 3)
        assert res.valid_tracking.all()  # both hands confident in frames 0-3
        assert np.isfinite(res.tracked_keypoints).all()
