"""Shared evaluation driver: track a recording, produce keypoint results.

TPU-first equivalent of the reference's per-sequence eval loop
(run_eval_known_skeleton.py:48-106): a jitted per-frame step (crop + warp +
network + FK) scanned over the recording, with GT-pose-driven crops,
producing the same {tracked, gt, valid} result dict the reference pickles.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..kinematics.hand_model import HandModel, scaled_hand_model
from ..kinematics.skinning import landmarks_from_hand_pose
from ..models import ModelConfig, UmeTrackModel, init_umetrack_params
from ..models.weights import load_torch_checkpoint
from ..tracker import HandTracker, TrackerConfig
from ..tracker.video_data import (
    HandPoseLabels,
    SyntheticFrameSource,
    VideoFrameSource,
    load_labels,
)

NUM_HANDS = 2
NUM_LANDMARKS = 21


def build_model(
    checkpoint: Optional[str] = None, cfg: ModelConfig = ModelConfig(), seed: int = 0
) -> UmeTrackModel:
    if checkpoint:
        params = jax.tree.map(jnp.asarray, load_torch_checkpoint(checkpoint, cfg))
    else:
        params = init_umetrack_params(jax.random.PRNGKey(seed), cfg)
    return UmeTrackModel(params, cfg)


def gt_landmark_sequence(labels: HandPoseLabels) -> np.ndarray:
    """(T, 2, 21, 3) FK landmarks of the GT poses (world, mm)."""
    t = len(labels)
    hand_b = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (t, NUM_HANDS) + x.shape), labels.hand_model
    )
    hand_idx = jnp.broadcast_to(jnp.arange(NUM_HANDS), (t, NUM_HANDS))
    lm = landmarks_from_hand_pose(
        hand_b,
        jnp.asarray(labels.joint_angles),
        jnp.asarray(labels.wrist_transforms),
        hand_idx,
    )
    return np.asarray(lm)


@dataclasses.dataclass
class SequenceResult:
    """Same payload as the reference's per-sequence pickle
    (run_eval_known_skeleton.py:96-104), hands-major."""

    tracked_keypoints: np.ndarray  # (2, T, 21, 3)
    gt_keypoints: np.ndarray  # (2, T, 21, 3)
    valid_tracking: np.ndarray  # (2, T)
    predicted_scales: Optional[np.ndarray] = None  # (2, T)
    joint_angles: Optional[np.ndarray] = None  # (2, T, 22) raw predictions
    wrist_xfs: Optional[np.ndarray] = None  # (2, T, 4, 4) world, mm


def track_recording(
    model: UmeTrackModel,
    labels: HandPoseLabels,
    frames: Iterable[np.ndarray],
    hand_model_mm: Optional[HandModel] = None,
    opts: TrackerConfig = TrackerConfig(),
    min_num_crops: int = 1,
    calibrate_scale: bool = False,
    max_frames: Optional[int] = None,
) -> SequenceResult:
    """Track a full recording with GT-pose-driven crops.

    The per-frame step is jitted once; camera extrinsics, poses, and images
    change per frame as device arrays. Produces FK landmarks for tracked and
    GT poses plus validity, matching the reference protocol.
    """
    tracker = HandTracker(model, opts)
    hand_mm = hand_model_mm if hand_model_mm is not None else labels.hand_model

    camera_angles = jnp.asarray(labels.camera_angles)

    if calibrate_scale:
        def step(state, images, cams, ja, wr, conf):
            return tracker.track_frame_and_calibrate_scale(
                state, images, cams, camera_angles, hand_mm, ja, wr, conf,
                src_kind=labels.camera_kind,
            )
    else:
        def step(state, images, cams, ja, wr, conf):
            return tracker.track_frame(
                state, images, cams, camera_angles, hand_mm, ja, wr, conf,
                min_num_crops=min_num_crops, src_kind=labels.camera_kind,
            )

    step = jax.jit(step)

    t_total = len(labels) if max_frames is None else min(max_frames, len(labels))
    tracked = np.zeros((NUM_HANDS, t_total, NUM_LANDMARKS, 3), np.float32)
    gt = np.zeros_like(tracked)
    valid = np.zeros((NUM_HANDS, t_total), bool)
    scales = np.zeros((NUM_HANDS, t_total), np.float32)
    raw_angles = np.zeros((NUM_HANDS, t_total, 22), np.float32)
    raw_wrists = np.zeros((NUM_HANDS, t_total, 4, 4), np.float32)

    # tracked landmarks FK with the tracking hand model (possibly the
    # calibrated generic skeleton); GT landmarks always FK with the
    # recording's own GT hand model.
    hand_b = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (NUM_HANDS,) + x.shape), hand_mm
    )
    gt_hand_b = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (NUM_HANDS,) + x.shape), labels.hand_model
    )
    hand_idx = jnp.arange(NUM_HANDS)
    fk = jax.jit(
        lambda ja, wr: landmarks_from_hand_pose(hand_b, ja, wr, hand_idx)
    )
    fk_gt = jax.jit(
        lambda ja, wr: landmarks_from_hand_pose(gt_hand_b, ja, wr, hand_idx)
    )

    state = tracker.init_state()
    for t, frame in enumerate(frames):
        if t >= t_total:
            break
        cams = labels.cameras_at(t)
        ja = jnp.asarray(labels.joint_angles[t])
        wr = jnp.asarray(labels.wrist_transforms[t])
        conf = jnp.asarray(labels.hand_confidences[t])
        state, res = step(state, jnp.asarray(frame, jnp.float32), cams, ja, wr, conf)

        hv = np.asarray(res.hand_valid)
        valid[:, t] = hv
        if hv.any():
            tracked[:, t] = np.asarray(fk(res.joint_angles, res.wrist_xfs))
            gt[:, t] = np.asarray(fk_gt(ja, wr))
        if res.predicted_scales is not None:
            scales[:, t] = np.asarray(res.predicted_scales)
        raw_angles[:, t] = np.asarray(res.joint_angles)
        raw_wrists[:, t] = np.asarray(res.wrist_xfs)

    return SequenceResult(
        tracked_keypoints=tracked,
        gt_keypoints=gt,
        valid_tracking=valid,
        predicted_scales=scales if calibrate_scale else None,
        joint_angles=raw_angles,
        wrist_xfs=raw_wrists,
    )


def frames_for(labels: HandPoseLabels, video_path: Optional[str]):
    """Real decoded frames when the mp4 exists, synthetic blobs otherwise."""
    import os

    if video_path and os.path.exists(video_path):
        return VideoFrameSource(video_path, labels.num_views)
    return SyntheticFrameSource(labels, gt_landmark_sequence(labels))
