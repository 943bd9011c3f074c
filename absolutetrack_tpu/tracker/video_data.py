"""Recording label loading + frame streams.

Replaces the reference ``lib/tracker/video_pose_data.py``: the label JSON
(cameras, camera_angles, per-frame hand poses + camera_to_world transforms,
inline hand model) loads into dense NumPy arrays; video frames come from an
mp4 (width-stacked mono views, split per video_pose_data.py:123-125) when a
decoder is available, or from a synthetic renderer for hermetic tests.

Host-side code: this is the data boundary; everything device-side is jnp.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Iterator, List, Optional, Tuple

import numpy as np

from ..geometry import camera as cam
from ..kinematics.hand_model import HandModel, hand_model_from_dict


@dataclasses.dataclass
class HandPoseLabels:
    """Parsed recording labels (reference video_pose_data.py:23-93)."""

    cameras: cam.Camera  # batch (V,) intrinsics only (identity extrinsics)
    camera_kind: str
    camera_angles: np.ndarray  # (V,)
    camera_to_world: np.ndarray  # (T, V, 4, 4)
    hand_model: HandModel  # millimeters
    joint_angles: np.ndarray  # (T, 2, 22)
    wrist_transforms: np.ndarray  # (T, 2, 4, 4)
    hand_confidences: np.ndarray  # (T, 2)

    def __len__(self) -> int:
        return len(self.joint_angles)

    @property
    def num_views(self) -> int:
        return len(self.camera_angles)

    def cameras_at(self, frame_idx: int) -> cam.Camera:
        """Source cameras with this frame's extrinsics attached."""
        import jax.numpy as jnp

        return self.cameras._replace(
            T_world_from_eye=jnp.asarray(
                self.camera_to_world[frame_idx], jnp.float32
            )
        )


def load_labels(path: str) -> HandPoseLabels:
    with open(path) as f:
        labels = json.load(f)
    cams, kinds = [], []
    for js in labels["cameras"]:
        c, kind = cam.camera_from_json(js)
        cams.append(c)
        kinds.append(kind)
    assert len(set(kinds)) == 1, "mixed camera kinds unsupported"
    return HandPoseLabels(
        cameras=cam.stack_cameras(cams),
        camera_kind=kinds[0],
        camera_angles=np.asarray(labels["camera_angles"], np.float32),
        camera_to_world=np.asarray(labels["camera_to_world_transforms"], np.float32),
        hand_model=hand_model_from_dict(labels["hand_model"]),
        joint_angles=np.asarray(labels["joint_angles"], np.float32),
        wrist_transforms=np.asarray(labels["wrist_transforms"], np.float32),
        hand_confidences=np.asarray(labels["hand_confidences"], np.float32),
    )


def split_stacked_frame(raw_mono: np.ndarray, num_views: int) -> np.ndarray:
    """(H, V*W) width-stacked frame -> (V, H, W) per-view images.

    The raw mp4 stores the 4 views side by side; the reference splits via
    reshape (video_pose_data.py:123-125).
    """
    h = raw_mono.shape[0]
    per_view = raw_mono.reshape(h, num_views, -1)
    return np.moveaxis(per_view, 1, 0)


class VideoFrameSource:
    """Decode a width-stacked mono mp4 into (V, H, W) frames.

    Tries PyAV, then imageio-ffmpeg. Raises ImportError if no decoder
    exists in the environment (tests use SyntheticFrameSource instead).
    """

    def __init__(self, path: str, num_views: int):
        import os

        if not os.path.exists(path):
            # fail loudly here: cv2.VideoCapture on a missing path yields an
            # empty stream, which would silently produce empty eval results
            raise FileNotFoundError(path)
        self.path = path
        self.num_views = num_views

    def __iter__(self) -> Iterator[np.ndarray]:
        try:
            import av  # type: ignore

            container = av.open(self.path)
            stream = container.streams.video[0]
            for frame in container.decode(stream):
                raw = np.asarray(frame.to_image())[..., 0]
                yield split_stacked_frame(raw, self.num_views)
            return
        except ImportError:
            pass
        import cv2  # type: ignore

        cap = cv2.VideoCapture(self.path)
        if not cap.isOpened():
            cap.release()
            raise IOError(f"cv2 cannot decode {self.path}")
        try:
            while True:
                ok, raw = cap.read()
                if not ok:
                    break
                if raw.ndim == 3:
                    raw = raw[..., 0]
                yield split_stacked_frame(raw, self.num_views)
        finally:
            cap.release()


class SyntheticFrameSource:
    """Render simple synthetic views from the GT landmarks: bright gaussian
    blobs at each landmark's projection. Hermetic stand-in for the missing
    mp4s (reference .MISSING_LARGE_BLOBS) -- lets integration tests exercise
    the full crop/warp/network path with structured images."""

    def __init__(
        self,
        labels: HandPoseLabels,
        landmarks_world: np.ndarray,  # (T, 2, 21, 3) mm
        image_size: Optional[Tuple[int, int]] = None,
        blob_sigma: float = 3.0,
    ):
        self.labels = labels
        self.landmarks = landmarks_world
        if image_size is None:
            image_size = (
                int(np.asarray(labels.cameras.width)[0]),
                int(np.asarray(labels.cameras.height)[0]),
            )
        self.image_size = image_size
        self.blob_sigma = blob_sigma
        self._win: Optional[np.ndarray] = None  # (T, V, 2, 21, 2) projections
        self._z: Optional[np.ndarray] = None  # (T, V, 2, 21) eye depths

    def _project_all(self) -> None:
        """Project every frame's landmarks into every view in ONE batched
        call (per-frame jax dispatch made rendering ~25x slower)."""
        import jax
        import jax.numpy as jnp

        from ..utils.runtime import on_cpu

        labels = self.labels
        t, v = len(labels), labels.num_views
        with on_cpu():
            cams_b = jax.tree.map(
                lambda x: jnp.broadcast_to(x, (t,) + x.shape), labels.cameras
            )._replace(
                T_world_from_eye=jnp.asarray(labels.camera_to_world, jnp.float32)
            )
            lm = jnp.asarray(
                self.landmarks.reshape(t, 1, 2 * 21, 3), jnp.float32
            )
            lm = jnp.broadcast_to(lm, (t, v, 2 * 21, 3))
            eye = cam.world_to_eye(cams_b, lm)  # (T, V, 42, 3)
            win = cam.eye_to_window(cams_b, eye, labels.camera_kind)
            self._win = np.asarray(win).reshape(t, v, 2, 21, 2)
            self._z = np.asarray(eye[..., 2]).reshape(t, v, 2, 21)

    def render_frame(self, frame_idx: int) -> np.ndarray:
        if self._win is None:
            self._project_all()

        labels = self.labels
        w, h = self.image_size
        v = labels.num_views
        out = np.zeros((v, h, w), np.float32)
        r = int(4 * self.blob_sigma) + 1  # local support; beyond 4 sigma ~ 0
        span = np.arange(-r, r + 1, dtype=np.float32)
        for hand in range(2):
            if labels.hand_confidences[frame_idx, hand] <= 0:
                continue
            win = self._win[frame_idx, :, hand]  # (V, 21, 2)
            z = self._z[frame_idx, :, hand]  # (V, 21)
            for vi in range(v):
                # scatter-add every landmark's local gaussian patch at once
                keep = (
                    (z[vi] > 0)
                    & (win[vi, :, 0] >= 0) & (win[vi, :, 0] < w)
                    & (win[vi, :, 1] >= 0) & (win[vi, :, 1] < h)
                )
                if not np.any(keep):
                    continue
                x0 = win[vi, keep, 0]  # (K,)
                y0 = win[vi, keep, 1]
                xi = np.round(x0).astype(np.int64)
                yi = np.round(y0).astype(np.int64)
                xs_l = np.clip(xi[:, None] + np.arange(-r, r + 1), 0, w - 1)
                ys_l = np.clip(yi[:, None] + np.arange(-r, r + 1), 0, h - 1)
                dx2 = (xi[:, None] + span - x0[:, None]) ** 2  # (K, P)
                dy2 = (yi[:, None] + span - y0[:, None]) ** 2
                blob = 255.0 * np.exp(
                    -(dy2[:, :, None] + dx2[:, None, :])
                    / (2 * self.blob_sigma**2)
                )  # (K, P, P)
                np.add.at(out[vi], (ys_l[:, :, None], xs_l[:, None, :]), blob)
        return np.clip(out, 0, 255)

    def __iter__(self) -> Iterator[np.ndarray]:
        for t in range(len(self.labels)):
            yield self.render_frame(t)
