"""The per-frame hand tracker: one fused jit step.

Replaces the reference ``HandTracker`` (lib/tracker/tracker.py:92-412) with
a functional, static-shape design:

  * ``TrackerState`` is an explicit pytree (temporal memory + validity
    history) instead of mutable module attributes; sequences run under
    ``lax.scan``;
  * ``track_frame`` fuses crop-camera synthesis, the fisheye->pinhole warp,
    the network forward pass, and unit conversions into a single jitted
    function -- the reference's Python dict/loop orchestration
    (tracker.py:315-368) becomes dense masked arrays;
  * millimeter/meter conversions are centralized here: world/geometry is in
    mm; network extrinsics and skeletons are in meters
    (MM_TO_M at tracker.py:33-34, 336, 363; M_TO_MM at 379).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..geometry import camera as cam, crop as crop_mod
from ..kinematics.hand_model import HandModel, scaled_hand_model
from ..models.config import ModelConfig
from ..models.temporal import TemporalState
from ..models.umetrack import FrameInputs, SkeletonInputs, UmeTrackModel
from ..ops.resample import warp_perspective_crop
from .crop_gen import CropSlots, gen_crop_slots, gen_crop_slots_from_2d

MM_TO_M = 0.001
M_TO_MM = 1000.0
NUM_HANDS = 2
MAX_VIEWS = 2


@dataclasses.dataclass(frozen=True)
class TrackerConfig:
    """Runtime options (reference HandTrackerOpts, tracker.py:50-58)."""

    num_crop_points: int = 63
    enable_memory: bool = True
    hand_ratio_in_crop: float = 0.8
    min_required_vis_landmarks: int = 19
    crop_size: Tuple[int, int] = (96, 96)
    # true sensor (H, W) when the caller uploads frames PRE-PADDED to the
    # warp kernel's window-aligned dims (256k rows, 128k cols): skips the
    # per-dispatch device-side pad of the whole image batch (~0.8 ms per
    # 128-frame serving dispatch) at identical sampling semantics.
    src_valid_hw: Optional[Tuple[int, int]] = None


class TrackerState(NamedTuple):
    """All cross-frame state, carried functionally."""

    temporal: TemporalState  # batch = NUM_HANDS slots
    valid_history: jnp.ndarray  # (NUM_HANDS,) bool


class TrackFrameResult(NamedTuple):
    """Per-frame outputs for both hand slots (masked by ``hand_valid``).

    joint_angles : (NUM_HANDS, 22)
    wrist_xfs    : (NUM_HANDS, 4, 4) world, translation in mm
    hand_valid   : (NUM_HANDS,) bool
    num_views    : (NUM_HANDS,) int
    predicted_scales : (NUM_HANDS,) or None
    """

    joint_angles: jnp.ndarray
    wrist_xfs: jnp.ndarray
    hand_valid: jnp.ndarray
    num_views: jnp.ndarray
    predicted_scales: Optional[jnp.ndarray] = None


class HandTracker:
    """Functional tracker around a UmeTrackModel.

    Usage:
        tracker = HandTracker(model, TrackerConfig())
        state = tracker.init_state()
        state, result = jax.jit(tracker.track_frame)(state, images, cameras,
                                                     angles, gt_pose..., skel)
    """

    def __init__(self, model: UmeTrackModel, opts: TrackerConfig = TrackerConfig()):
        self.model = model
        self.opts = opts

    def init_state(self) -> TrackerState:
        return TrackerState(
            temporal=self.model.init_state(NUM_HANDS),
            valid_history=jnp.zeros(NUM_HANDS, bool),
        )

    # -- input assembly ---------------------------------------------------

    def make_inputs(
        self,
        state: TrackerState,
        images: jnp.ndarray,  # (V, H, W) raw mono views, 0..255
        cameras: cam.Camera,  # batch (V,) with per-frame extrinsics (mm)
        slots: CropSlots,
        src_kind: str = cam.FISHEYE62,
    ) -> FrameInputs:
        """Warp crops and build the dense network inputs.

        Equivalent of reference ``_make_inputs`` (tracker.py:315-368), with
        the dict/loop batching replaced by (NUM_HANDS*MAX_VIEWS) slots.
        """
        n_slots = NUM_HANDS * MAX_VIEWS
        crop_cams_flat = jax.tree.map(
            lambda x: x.reshape((n_slots,) + x.shape[2:]), slots.cameras
        )
        crop_cam = crop_mod.crop_camera_to_camera(crop_cams_flat, self.opts.crop_size)
        src_idx = slots.view_idx.reshape(-1)
        src_cams = jax.tree.map(lambda x: x[src_idx], cameras)

        crops = warp_perspective_crop(
            images,
            src_cams,
            src_idx,
            crop_cam,
            self.opts.crop_size,
            src_kind=src_kind,
            src_valid_hw=self.opts.src_valid_hw,
        )
        crops = crops.reshape(
            NUM_HANDS, MAX_VIEWS, self.opts.crop_size[1], self.opts.crop_size[0]
        )
        crops = crops / 255.0
        crops = jnp.where(slots.view_valid[..., None, None], crops, 0.0)

        intrinsics = crop_mod.intrinsics_matrix_from_crop(slots.cameras)
        extrinsics = slots.cameras.T_world_to_eye
        extrinsics = extrinsics.at[..., :3, 3].multiply(MM_TO_M)

        use_memory = (
            state.valid_history & slots.hand_valid
            if self.opts.enable_memory
            else jnp.zeros(NUM_HANDS, bool)
        )
        return FrameInputs(
            left_images=crops,
            intrinsics=intrinsics,
            extrinsics=extrinsics,
            view_mask=slots.view_valid,
            hand_idx=jnp.arange(NUM_HANDS),
            use_memory=use_memory,
            sample_mask=slots.hand_valid,
        )

    def _finish(
        self,
        state: TrackerState,
        new_temporal: TemporalState,
        slots: CropSlots,
        out,
    ) -> Tuple[TrackerState, TrackFrameResult]:
        wrist_mm = out.wrist_xfs.at[..., :3, 3].multiply(M_TO_MM)
        # memory slots of invalid hands keep their previous content; the
        # reference leaves them untouched and relies on the use_memory=False
        # zeroing on revival (temporal.py:59-63 + tracker.py:399-406)
        keep = slots.hand_valid[:, None, None, None]
        mem = jnp.where(keep, new_temporal.mem_features, state.temporal.mem_features)
        prev_ext = jnp.where(
            slots.hand_valid[:, None, None],
            new_temporal.prev_extrinsics,
            state.temporal.prev_extrinsics,
        )
        new_state = TrackerState(
            temporal=TemporalState(mem_features=mem, prev_extrinsics=prev_ext),
            valid_history=slots.hand_valid,
        )
        result = TrackFrameResult(
            joint_angles=out.joint_angles,
            wrist_xfs=wrist_mm,
            hand_valid=slots.hand_valid,
            num_views=jnp.sum(slots.view_valid, axis=-1),
            predicted_scales=out.skel_scales,
        )
        return new_state, result

    # -- public steps -----------------------------------------------------

    def track_frame(
        self,
        state: TrackerState,
        images: jnp.ndarray,
        cameras: cam.Camera,
        camera_angles: jnp.ndarray,
        hand_model_mm: HandModel,
        prev_joint_angles: jnp.ndarray,  # (NUM_HANDS, 22) pose used for crops
        prev_wrist_mm: jnp.ndarray,  # (NUM_HANDS, 4, 4)
        hand_confidences: jnp.ndarray,  # (NUM_HANDS,)
        min_num_crops: int = 1,
        src_kind: str = cam.FISHEYE62,
    ) -> Tuple[TrackerState, TrackFrameResult]:
        """Known-skeleton tracking step (reference track_frame,
        tracker.py:262-289, crops from a given pose per tracker.py:222-260)."""
        slots = gen_crop_slots(
            cameras,
            camera_angles,
            hand_model_mm,
            prev_joint_angles,
            prev_wrist_mm,
            hand_confidences,
            self.opts.crop_size,
            num_crop_points=self.opts.num_crop_points,
            min_num_crops=min_num_crops,
            min_required_vis_landmarks=self.opts.min_required_vis_landmarks,
            focal_multiplier=self.opts.hand_ratio_in_crop,
            src_kind=src_kind,
        )
        frame = self.make_inputs(state, images, cameras, slots, src_kind)

        hand_model_m = scaled_hand_model(hand_model_mm, MM_TO_M)
        skel = SkeletonInputs(
            joint_rotation_axes=jnp.broadcast_to(
                hand_model_m.joint_rotation_axes, (1, 22, 3)
            ),
            joint_rest_positions=jnp.broadcast_to(
                hand_model_m.joint_rest_positions, (1, 22, 3)
            ),
        )
        new_temporal, out = self.model.regress_pose_use_skeleton(
            state.temporal, frame, skel
        )
        return self._finish(state, new_temporal, slots, out)

    def track_frame_and_calibrate_scale(
        self,
        state: TrackerState,
        images: jnp.ndarray,
        cameras: cam.Camera,
        camera_angles: jnp.ndarray,
        hand_model_mm: HandModel,
        prev_joint_angles: jnp.ndarray,
        prev_wrist_mm: jnp.ndarray,
        hand_confidences: jnp.ndarray,
        src_kind: str = cam.FISHEYE62,
    ) -> Tuple[TrackerState, TrackFrameResult]:
        """Unknown-skeleton step: predicts a per-hand skeleton scale.

        Crop generation still needs *a* hand model (the generic one);
        min_num_crops=2 because scale calibration requires stereo
        (reference run_eval_unknown_skeleton.py:58-64 +
        umetrack_model.py:224-229)."""
        slots = gen_crop_slots(
            cameras,
            camera_angles,
            hand_model_mm,
            prev_joint_angles,
            prev_wrist_mm,
            hand_confidences,
            self.opts.crop_size,
            num_crop_points=self.opts.num_crop_points,
            min_num_crops=2,
            min_required_vis_landmarks=self.opts.min_required_vis_landmarks,
            focal_multiplier=self.opts.hand_ratio_in_crop,
            src_kind=src_kind,
        )
        frame = self.make_inputs(state, images, cameras, slots, src_kind)
        new_temporal, out = self.model.regress_pose_pred_skel_scale(
            state.temporal, frame
        )
        return self._finish(state, new_temporal, slots, out)

    def track_frame_from_2d(
        self,
        state: TrackerState,
        images: jnp.ndarray,  # (V, H, W) stereo views
        cameras: cam.Camera,  # batch (V,) == MAX_VIEWS
        hand_model_mm: HandModel,
        keypoints_2d: jnp.ndarray,  # (NUM_HANDS, V, 21, 2) window coords
        keypoints_valid: jnp.ndarray,  # (NUM_HANDS, V) bool
        src_kind: str = cam.FISHEYE62,
    ) -> Tuple[TrackerState, TrackFrameResult]:
        """Live-demo step: crops come from per-view 2D detections
        (MediaPipe), not a previous 3D pose (reference demo/ume_tracker.py
        via tracker.py:111-219)."""
        slots = gen_crop_slots_from_2d(
            cameras,
            keypoints_2d,
            keypoints_valid,
            self.opts.crop_size,
            focal_multiplier=self.opts.hand_ratio_in_crop,
            src_kind=src_kind,
        )
        frame = self.make_inputs(state, images, cameras, slots, src_kind)
        hand_model_m = scaled_hand_model(hand_model_mm, MM_TO_M)
        skel = SkeletonInputs(
            joint_rotation_axes=jnp.broadcast_to(
                hand_model_m.joint_rotation_axes, (1, 22, 3)
            ),
            joint_rest_positions=jnp.broadcast_to(
                hand_model_m.joint_rest_positions, (1, 22, 3)
            ),
        )
        new_temporal, out = self.model.regress_pose_use_skeleton(
            state.temporal, frame, skel
        )
        return self._finish(state, new_temporal, slots, out)
