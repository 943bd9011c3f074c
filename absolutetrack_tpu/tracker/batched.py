"""Batched multi-recording tracker: R recordings advance in lockstep.

The TPU-native analog of the reference's ``Pool(8).map_async`` over
recording sequences (run_eval_known_skeleton.py:116-119): instead of one
OS process per sequence each running a private model copy, ALL sequences
share one jitted step whose batch axis is (R recordings x NUM_HANDS hand
slots). The sequential 2-hand step leaves the chip mostly idle; batching
recordings multiplies arithmetic intensity on the same weights (the convs
see batch R*2*V crops) without changing per-recording semantics -- each
recording carries its own cameras, hand model, temporal memory, and
validity history, and the results are numerically the per-recording
sequential results.

Per-recording source views are flattened into the warp's slot axis
(R*V source images, R*NUM_HANDS*MAX_VIEWS crop slots), which the banded
Pallas kernel streams without any VMEM scaling in R.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..geometry import camera as cam, crop as crop_mod
from ..kinematics.hand_model import HandModel, scaled_hand_model
from ..models.temporal import TemporalState
from ..models.umetrack import FrameInputs, SkeletonInputs, UmeTrackModel
from ..ops.resample import warp_perspective_crop
from .crop_gen import CropSlots, gen_crop_slots
from .tracker import (
    MAX_VIEWS,
    MM_TO_M,
    M_TO_MM,
    NUM_HANDS,
    TrackFrameResult,
    TrackerConfig,
    TrackerState,
)


class BatchedTracker:
    """Functional tracker over R recordings x NUM_HANDS hand slots.

    State layout: ``temporal`` batches R*NUM_HANDS memory slots;
    ``valid_history`` is (R, NUM_HANDS). All public outputs carry leading
    (R, NUM_HANDS) axes. Semantics per recording match ``HandTracker``
    exactly (tested in tests/test_batched_eval.py).
    """

    def __init__(self, model: UmeTrackModel, opts: TrackerConfig = TrackerConfig()):
        self.model = model
        self.opts = opts

    def init_state(self, num_recordings: int) -> TrackerState:
        return TrackerState(
            temporal=self.model.init_state(num_recordings * NUM_HANDS),
            valid_history=jnp.zeros((num_recordings, NUM_HANDS), bool),
        )

    # -- input assembly ---------------------------------------------------

    def _gen_slots(
        self,
        cameras: cam.Camera,  # batch (R, V), millimeters
        camera_angles: jnp.ndarray,  # (R, V)
        hand_models: HandModel,  # leaves batched (R, ...)
        joint_angles: jnp.ndarray,  # (R, NUM_HANDS, 22)
        wrist_mm: jnp.ndarray,  # (R, NUM_HANDS, 4, 4)
        confidences: jnp.ndarray,  # (R, NUM_HANDS)
        min_num_crops: int,
        src_kind: str,
    ) -> CropSlots:
        gen = functools.partial(
            gen_crop_slots,
            crop_size=self.opts.crop_size,
            num_crop_points=self.opts.num_crop_points,
            min_num_crops=min_num_crops,
            min_required_vis_landmarks=self.opts.min_required_vis_landmarks,
            focal_multiplier=self.opts.hand_ratio_in_crop,
            src_kind=src_kind,
        )
        return jax.vmap(gen)(
            cameras, camera_angles, hand_models, joint_angles, wrist_mm, confidences
        )

    def make_inputs(
        self,
        state: TrackerState,
        images: jnp.ndarray,  # (R, V, H, W) raw mono views, 0..255
        cameras: cam.Camera,  # batch (R, V) with per-frame extrinsics (mm)
        slots: CropSlots,  # batch (R, NUM_HANDS, MAX_VIEWS)
        src_kind: str = cam.FISHEYE62,
    ) -> FrameInputs:
        """Warp all R*NUM_HANDS*MAX_VIEWS crops in one kernel call and build
        the dense (B = R*NUM_HANDS)-sample network inputs."""
        r, v = images.shape[0], images.shape[1]
        n_slots = r * NUM_HANDS * MAX_VIEWS
        crop_cams_flat = jax.tree.map(
            lambda x: x.reshape((n_slots,) + x.shape[3:]), slots.cameras
        )
        crop_cam = crop_mod.crop_camera_to_camera(crop_cams_flat, self.opts.crop_size)
        # flatten (recording, view) into one source-image axis for the warp
        src_idx = (slots.view_idx + (jnp.arange(r) * v)[:, None, None]).reshape(-1)
        cams_flat = jax.tree.map(lambda x: x.reshape((r * v,) + x.shape[2:]), cameras)
        src_cams = jax.tree.map(lambda x: x[src_idx], cams_flat)

        crops = warp_perspective_crop(
            images.reshape((r * v,) + images.shape[2:]),
            src_cams,
            src_idx,
            crop_cam,
            self.opts.crop_size,
            src_kind=src_kind,
            src_valid_hw=self.opts.src_valid_hw,
        )
        crops = crops.reshape(
            r * NUM_HANDS, MAX_VIEWS, self.opts.crop_size[1], self.opts.crop_size[0]
        )
        crops = crops / 255.0
        view_valid = slots.view_valid.reshape(r * NUM_HANDS, MAX_VIEWS)
        crops = jnp.where(view_valid[..., None, None], crops, 0.0)

        intrinsics = crop_mod.intrinsics_matrix_from_crop(slots.cameras).reshape(
            r * NUM_HANDS, MAX_VIEWS, 3, 3
        )
        extrinsics = slots.cameras.T_world_to_eye.reshape(
            r * NUM_HANDS, MAX_VIEWS, 4, 4
        )
        extrinsics = extrinsics.at[..., :3, 3].multiply(MM_TO_M)

        hand_valid = slots.hand_valid.reshape(-1)
        use_memory = (
            (state.valid_history.reshape(-1) & hand_valid)
            if self.opts.enable_memory
            else jnp.zeros(r * NUM_HANDS, bool)
        )
        return FrameInputs(
            left_images=crops,
            intrinsics=intrinsics,
            extrinsics=extrinsics,
            view_mask=view_valid,
            hand_idx=jnp.tile(jnp.arange(NUM_HANDS), r),
            use_memory=use_memory,
            sample_mask=hand_valid,
        )

    def _skeleton_inputs(self, hand_models_mm: HandModel) -> SkeletonInputs:
        hand_m = scaled_hand_model(hand_models_mm, MM_TO_M)
        return SkeletonInputs(
            joint_rotation_axes=jnp.repeat(
                hand_m.joint_rotation_axes, NUM_HANDS, axis=0
            ),
            joint_rest_positions=jnp.repeat(
                hand_m.joint_rest_positions, NUM_HANDS, axis=0
            ),
        )

    def _finish(
        self,
        state: TrackerState,
        new_temporal: TemporalState,
        slots: CropSlots,
        out,
    ) -> Tuple[TrackerState, TrackFrameResult]:
        r = slots.hand_valid.shape[0]
        hand_valid = slots.hand_valid.reshape(-1)
        wrist_mm = out.wrist_xfs.at[..., :3, 3].multiply(M_TO_MM)
        # memory slots of invalid hands keep their previous content
        # (reference temporal.py:59-63 + tracker.py:399-406)
        keep = hand_valid[:, None, None, None]
        mem = jnp.where(keep, new_temporal.mem_features, state.temporal.mem_features)
        prev_ext = jnp.where(
            hand_valid[:, None, None],
            new_temporal.prev_extrinsics,
            state.temporal.prev_extrinsics,
        )
        new_state = TrackerState(
            temporal=TemporalState(mem_features=mem, prev_extrinsics=prev_ext),
            valid_history=slots.hand_valid,
        )

        def split(x, trailing):
            return x.reshape((r, NUM_HANDS) + trailing)

        result = TrackFrameResult(
            joint_angles=split(out.joint_angles, (22,)),
            wrist_xfs=split(wrist_mm, (4, 4)),
            hand_valid=slots.hand_valid,
            num_views=jnp.sum(slots.view_valid, axis=-1),
            predicted_scales=None
            if out.skel_scales is None
            else split(out.skel_scales, ()),
        )
        return new_state, result

    # -- public steps -----------------------------------------------------

    def track_frames(
        self,
        state: TrackerState,
        images: jnp.ndarray,  # (R, V, H, W)
        cameras: cam.Camera,  # batch (R, V)
        camera_angles: jnp.ndarray,  # (R, V)
        hand_models_mm: HandModel,  # leaves batched (R, ...)
        prev_joint_angles: jnp.ndarray,  # (R, NUM_HANDS, 22)
        prev_wrist_mm: jnp.ndarray,  # (R, NUM_HANDS, 4, 4)
        hand_confidences: jnp.ndarray,  # (R, NUM_HANDS)
        min_num_crops: int = 1,
        src_kind: str = cam.FISHEYE62,
    ) -> Tuple[TrackerState, TrackFrameResult]:
        """Known-skeleton step over all recordings at once."""
        slots = self._gen_slots(
            cameras,
            camera_angles,
            hand_models_mm,
            prev_joint_angles,
            prev_wrist_mm,
            hand_confidences,
            min_num_crops,
            src_kind,
        )
        frame = self.make_inputs(state, images, cameras, slots, src_kind)
        skel = self._skeleton_inputs(hand_models_mm)
        new_temporal, out = self.model.regress_pose_use_skeleton(
            state.temporal, frame, skel
        )
        return self._finish(state, new_temporal, slots, out)

    def track_frames_and_calibrate_scale(
        self,
        state: TrackerState,
        images: jnp.ndarray,
        cameras: cam.Camera,
        camera_angles: jnp.ndarray,
        hand_models_mm: HandModel,
        prev_joint_angles: jnp.ndarray,
        prev_wrist_mm: jnp.ndarray,
        hand_confidences: jnp.ndarray,
        src_kind: str = cam.FISHEYE62,
    ) -> Tuple[TrackerState, TrackFrameResult]:
        """Unknown-skeleton step: predicts per-hand skeleton scales.
        min_num_crops=2 (scale calibration requires stereo, reference
        run_eval_unknown_skeleton.py:58-64)."""
        slots = self._gen_slots(
            cameras,
            camera_angles,
            hand_models_mm,
            prev_joint_angles,
            prev_wrist_mm,
            hand_confidences,
            2,
            src_kind,
        )
        frame = self.make_inputs(state, images, cameras, slots, src_kind)
        new_temporal, out = self.model.regress_pose_pred_skel_scale(
            state.temporal, frame
        )
        return self._finish(state, new_temporal, slots, out)
