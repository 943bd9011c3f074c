"""Pipelined eval tracking: batch the trunk over time, scan only the tail.

In the eval protocols the crop cameras come from a pose that is known per
frame in advance (GT pose -- reference run_eval_known_skeleton.py:69-75,
run_eval_unknown_skeleton.py:58-64), NOT from the tracked result. Crop
synthesis, the fisheye warp, the CNN backbone, and the multi-view FTL
fusion are therefore independent across frames; only the ConvRNN memory
and the regression head downstream of it are sequential.

``track_chunk_eval`` exploits that: phase A runs crop-gen + warp + trunk
for ALL F frames of a chunk in one batch (the convs see batch F*NUM_HANDS
crops instead of NUM_HANDS -- much better MXU utilization at the
sequential-eval batch of 2), and phase B ``lax.scan``s the cheap temporal
step + regressor over the F frames with the memory as carry. Semantics
match the frame-by-frame ``HandTracker`` path (asserted in
tests/test_pipelined.py); the live-demo path cannot use this because its
crops depend on the previous frame's *tracked* pose.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..geometry import camera as cam
from ..kinematics.hand_model import HandModel, scaled_hand_model
from ..models.temporal import TemporalState
from ..models.umetrack import FrameInputs, SkeletonInputs, UmeTrackModel
from .batched import BatchedTracker
from .tracker import (
    MAX_VIEWS,
    MM_TO_M,
    M_TO_MM,
    NUM_HANDS,
    TrackerConfig,
    TrackFrameResult,
    TrackerState,
)


def track_chunk_eval(
    model: UmeTrackModel,
    opts: TrackerConfig,
    state: TrackerState,  # sequential tracker state (2 hand slots)
    images_seq: jnp.ndarray,  # (F, V, H, W) raw mono views
    cameras: cam.Camera,  # batch (V,), extrinsics overridden per frame
    camera_to_world_seq: jnp.ndarray,  # (F, V, 4, 4)
    camera_angles: jnp.ndarray,  # (V,)
    hand_model_mm: HandModel,  # unbatched, millimeters
    joint_angles_seq: jnp.ndarray,  # (F, NUM_HANDS, 22) crop-driving poses
    wrist_mm_seq: jnp.ndarray,  # (F, NUM_HANDS, 4, 4)
    confidences_seq: jnp.ndarray,  # (F, NUM_HANDS)
    min_num_crops: int = 1,
    src_kind: str = cam.FISHEYE62,
    calibrate_scale: bool = False,
) -> Tuple[TrackerState, TrackFrameResult]:
    """Track F frames with known crop-driving poses -> results stacked on F.

    Equivalent to scanning ``HandTracker.track_frame`` over the chunk
    (reference per-frame loop, run_eval_known_skeleton.py:68-90) but with
    the frame-independent work batched over F.
    """
    f, v = images_seq.shape[0], images_seq.shape[1]

    # ---- phase A: frames as a batch (reuse the multi-recording machinery:
    # F frames here play the role of its R recordings) -------------------
    bt = BatchedTracker(model, opts)
    cams_f = jax.tree.map(lambda x: jnp.broadcast_to(x, (f,) + x.shape), cameras)
    cams_f = cams_f._replace(T_world_from_eye=camera_to_world_seq)
    angles_f = jnp.broadcast_to(camera_angles, (f, v))
    hand_f = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (f,) + x.shape), hand_model_mm
    )
    slots = bt._gen_slots(
        cams_f,
        angles_f,
        hand_f,
        joint_angles_seq,
        wrist_mm_seq,
        confidences_seq,
        2 if calibrate_scale else min_num_crops,
        src_kind,
    )
    # use_memory in frame_all is a placeholder; the real per-frame value
    # depends on the scan carry and is substituted in phase B
    dummy = TrackerState(
        temporal=model.init_state(f * NUM_HANDS),
        valid_history=jnp.zeros((f, NUM_HANDS), bool),
    )
    frame_all = bt.make_inputs(dummy, images_seq, cams_f, slots, src_kind)
    feats_all = model.extract_features(frame_all)  # (F*2, h, w, C)

    skel_all: Optional[jnp.ndarray] = None
    if not calibrate_scale:
        hand_m = scaled_hand_model(hand_model_mm, MM_TO_M)
        skel = SkeletonInputs(
            joint_rotation_axes=hand_m.joint_rotation_axes[None],
            joint_rest_positions=hand_m.joint_rest_positions[None],
        )
        skel_all = model.encode_skeleton(skel, NUM_HANDS)  # shared by frames

    def per_frame(x):
        return x.reshape((f, NUM_HANDS) + x.shape[1:])

    frame_seq = jax.tree.map(per_frame, frame_all)
    # the scan tail never touches the crops or intrinsics; drop them from
    # the carry stream so the scan doesn't re-slice them every step
    frame_seq = frame_seq._replace(
        left_images=jnp.zeros((f, NUM_HANDS, 0), feats_all.dtype),
        intrinsics=jnp.zeros((f, NUM_HANDS, 0), feats_all.dtype),
    )
    feats_seq = per_frame(feats_all)
    hand_valid_seq = slots.hand_valid  # (F, 2)

    # ---- phase B: scan the sequential tail over frames ------------------
    def body(carry, xs):
        tstate, valid_history = carry
        frame_t, feats_t, hand_valid = xs
        use_memory = (
            (valid_history & hand_valid)
            if opts.enable_memory
            else jnp.zeros(NUM_HANDS, bool)
        )
        frame_t = frame_t._replace(use_memory=use_memory)
        new_t, out = model.regress_from_features(tstate, frame_t, feats_t, skel_all)
        wrist_mm = out.wrist_xfs.at[..., :3, 3].multiply(M_TO_MM)
        # memory slots of invalid hands keep their previous content
        # (reference temporal.py:59-63 + tracker.py:399-406)
        keep = hand_valid[:, None, None, None]
        mem = jnp.where(keep, new_t.mem_features, tstate.mem_features)
        prev_ext = jnp.where(
            hand_valid[:, None, None], new_t.prev_extrinsics, tstate.prev_extrinsics
        )
        res = TrackFrameResult(
            joint_angles=out.joint_angles,
            wrist_xfs=wrist_mm,
            hand_valid=hand_valid,
            num_views=jnp.sum(frame_t.view_mask, axis=-1),
            predicted_scales=out.skel_scales,
        )
        new_carry = (
            TemporalState(mem_features=mem, prev_extrinsics=prev_ext),
            hand_valid,
        )
        return new_carry, res

    (tstate, valid_history), results = lax.scan(
        body,
        (state.temporal, state.valid_history),
        (frame_seq, feats_seq, hand_valid_seq),
    )
    return TrackerState(temporal=tstate, valid_history=valid_history), results


def track_chunk_eval_batched(
    model: UmeTrackModel,
    opts: TrackerConfig,
    state: TrackerState,  # BatchedTracker state: valid_history (R, 2)
    images_seq: jnp.ndarray,  # (F, R, V, H, W); (R, F, V, H, W) when
    #                           images_rec_major=True
    cameras: cam.Camera,  # batch (R, V), extrinsics overridden per frame
    camera_to_world_seq: jnp.ndarray,  # (F, R, V, 4, 4)
    camera_angles: jnp.ndarray,  # (R, V)
    hand_models_mm: HandModel,  # leaves batched (R, ...)
    joint_angles_seq: jnp.ndarray,  # (F, R, NUM_HANDS, 22)
    wrist_mm_seq: jnp.ndarray,  # (F, R, NUM_HANDS, 4, 4)
    confidences_seq: jnp.ndarray,  # (F, R, NUM_HANDS)
    min_num_crops: int = 1,
    src_kind: str = cam.FISHEYE62,
    calibrate_scale: bool = False,
    images_rec_major: bool = False,
) -> Tuple[TrackerState, TrackFrameResult]:
    """R recordings x F frames, trunk batched over BOTH axes.

    Combines the lockstep multi-recording layout (tracker/batched.py) with
    the eval-time pipelining: phase A treats the F*R (frame, recording)
    pairs as one flat batch (convs see F*R*NUM_HANDS crops), phase B scans
    frames with the R*NUM_HANDS memory slots as carry. Results are stacked
    (F, R, NUM_HANDS, ...), matching BatchedTracker.track_frames under a
    scan.
    """
    if images_rec_major:
        # (R, F, ...) host-supplied layout: the phase-A flatten below is a
        # free reshape instead of a device transpose (measured 0.73 ms of
        # u8 copy per 192-frame dispatch when the transpose materializes)
        r, f, v = images_seq.shape[0], images_seq.shape[1], images_seq.shape[2]
    else:
        f, r, v = images_seq.shape[0], images_seq.shape[1], images_seq.shape[2]
    bt = BatchedTracker(model, opts)

    # RECORDING-major flattening: flat index = rec * F + frame. Under a
    # ('data',) mesh with recordings sharded on R, each device's shard is
    # then a contiguous block of the flat phase-A batch, so the whole
    # chunk partitions with no cross-device communication (the scan tail
    # is per-sample too; only the caller's metric reductions communicate).
    def flat(x):  # (F, R, ...) -> (R*F, ...), recording-major
        return jnp.moveaxis(x, 0, 1).reshape((r * f,) + x.shape[2:])

    def rep(x):  # (R, ...) -> (R*F, ...), recording-major repeat
        return jnp.broadcast_to(x[:, None], (r, f) + x.shape[1:]).reshape(
            (r * f,) + x.shape[1:]
        )

    cams_fr = jax.tree.map(rep, cameras)
    cams_fr = cams_fr._replace(T_world_from_eye=flat(camera_to_world_seq))
    angles_fr = rep(camera_angles)
    hand_fr = jax.tree.map(rep, hand_models_mm)
    slots = bt._gen_slots(
        cams_fr,
        angles_fr,
        hand_fr,
        flat(joint_angles_seq),
        flat(wrist_mm_seq),
        flat(confidences_seq),
        2 if calibrate_scale else min_num_crops,
        src_kind,
    )
    dummy = TrackerState(
        temporal=model.init_state(r * f * NUM_HANDS),
        valid_history=jnp.zeros((r * f, NUM_HANDS), bool),
    )
    images_flat = (
        images_seq.reshape((r * f,) + images_seq.shape[2:])
        if images_rec_major
        else flat(images_seq)
    )
    frame_all = bt.make_inputs(dummy, images_flat, cams_fr, slots, src_kind)
    feats_all = model.extract_features(frame_all)  # (R*F*2, h, w, C)

    skel_all: Optional[jnp.ndarray] = None
    if not calibrate_scale:
        skel_in = bt._skeleton_inputs(hand_models_mm)  # (R*2, ...)
        skel_all = model.encode_skeleton(skel_in, r * NUM_HANDS)

    def per_frame(x):  # (R*F*2, ...) -> (F, R*2, ...), time-major for scan
        x = x.reshape((r, f, NUM_HANDS) + x.shape[1:])
        return jnp.moveaxis(x, 1, 0).reshape(
            (f, r * NUM_HANDS) + x.shape[3:]
        )

    frame_seq = jax.tree.map(per_frame, frame_all)
    frame_seq = frame_seq._replace(
        left_images=jnp.zeros((f, r * NUM_HANDS, 0), feats_all.dtype),
        intrinsics=jnp.zeros((f, r * NUM_HANDS, 0), feats_all.dtype),
    )
    feats_seq = per_frame(feats_all)
    hand_valid_seq = per_frame(slots.hand_valid.reshape(-1))

    def body(carry, xs):
        tstate, valid_history = carry
        frame_t, feats_t, hand_valid = xs
        use_memory = (
            (valid_history & hand_valid)
            if opts.enable_memory
            else jnp.zeros(r * NUM_HANDS, bool)
        )
        frame_t = frame_t._replace(use_memory=use_memory)
        new_t, out = model.regress_from_features(tstate, frame_t, feats_t, skel_all)
        wrist_mm = out.wrist_xfs.at[..., :3, 3].multiply(M_TO_MM)
        keep = hand_valid[:, None, None, None]
        mem = jnp.where(keep, new_t.mem_features, tstate.mem_features)
        prev_ext = jnp.where(
            hand_valid[:, None, None], new_t.prev_extrinsics, tstate.prev_extrinsics
        )
        res = TrackFrameResult(
            joint_angles=out.joint_angles.reshape(r, NUM_HANDS, 22),
            wrist_xfs=wrist_mm.reshape(r, NUM_HANDS, 4, 4),
            hand_valid=hand_valid.reshape(r, NUM_HANDS),
            num_views=jnp.sum(frame_t.view_mask, axis=-1).reshape(r, NUM_HANDS),
            predicted_scales=None
            if out.skel_scales is None
            else out.skel_scales.reshape(r, NUM_HANDS),
        )
        return (
            TemporalState(mem_features=mem, prev_extrinsics=prev_ext),
            hand_valid,
        ), res

    (tstate, valid_history), results = lax.scan(
        body,
        (state.temporal, state.valid_history.reshape(-1)),
        (frame_seq, feats_seq, hand_valid_seq),
    )
    return (
        TrackerState(
            temporal=tstate, valid_history=valid_history.reshape(r, NUM_HANDS)
        ),
        results,
    )
