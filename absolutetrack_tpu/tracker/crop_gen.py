"""Crop-camera generation from hand poses, fully vectorized.

Replaces the reference's per-hand/per-camera Python loops
(lib/tracker/perspective_crop.py:136-180, lib/tracker/tracker.py:222-260)
with one jittable function over fixed (NUM_HANDS x MAX_VIEWS) slots:

  1. FK landmarks for up to three poses per hand (actual / neutral /
     open) form the 21/42/63 crop bounding points
     (perspective_crop.py:89-133);
  2. per-camera visibility counting ranks the cameras; the top-2 cameras
     with >= min_required_vis_landmarks visible are selected via top_k
     (ties resolve to the lower camera index, matching the reference's
     stable sort), then sorted ascending by camera index
     (perspective_crop.py:54-86 + tracker.py:245-249 sort_camera_index);
  3. a crop camera is synthesized per selected (hand, view) slot with the
     right-hand mirror and the per-camera roll angle.

Hands below the confidence gate or with fewer than ``min_num_crops``
eligible cameras are masked invalid (tracker.py:234-258).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..geometry import affine, camera as cam, crop
from ..kinematics import hand_model as hm
from ..kinematics.hand_model import HandModel, neutral_joint_angles
from ..kinematics.skinning import landmarks_from_hand_pose

CONFIDENCE_THRESHOLD = 0.5  # reference tracker.py:36
MAX_VIEWS = 2  # reference tracker.py:37


class CropSlots(NamedTuple):
    """Fixed-capacity crop assignment for one frame.

    view_idx   : (NUM_HANDS, MAX_VIEWS) int source-camera index per slot
                 (valid slots compacted to the front, ascending cam index).
    view_valid : (NUM_HANDS, MAX_VIEWS) bool.
    hand_valid : (NUM_HANDS,) bool.
    cameras    : CropCamera with batch shape (NUM_HANDS, MAX_VIEWS).
    """

    view_idx: jnp.ndarray
    view_valid: jnp.ndarray
    hand_valid: jnp.ndarray
    cameras: crop.CropCamera


def _crop_points(
    hand: HandModel,
    joint_angles: jnp.ndarray,  # (H, 22)
    wrist: jnp.ndarray,  # (H, 4, 4)
    num_crop_points: int,
) -> jnp.ndarray:
    """(H, num_crop_points, 3) world-space bounding points per hand.

    The up-to-three poses (actual / neutral / open,
    perspective_crop.py:89-133) run through ONE batched FK call of
    (n_poses * H) hands instead of three sequential FK chains -- same
    FLOPs, a third of the small-op dispatch tail.
    """
    assert num_crop_points in (21, 42, 63)
    h = joint_angles.shape[0]
    n_poses = num_crop_points // 21

    poses = [joint_angles]
    if n_poses > 1:
        poses.append(jnp.broadcast_to(neutral_joint_angles(hand), (h, 22)))
    if n_poses > 2:
        poses.append(jnp.zeros((h, 22)))

    angles_b = jnp.concatenate(poses, axis=0)  # (n_poses*H, 22)
    wrist_b = jnp.tile(wrist, (n_poses, 1, 1))
    hand_idx_b = jnp.tile(jnp.arange(h), n_poses)
    hand_b = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (n_poses * h,) + x.shape), hand
    )
    pts = landmarks_from_hand_pose(hand_b, angles_b, wrist_b, hand_idx_b)
    # (n_poses*H, 21, 3) -> (H, n_poses*21, 3), pose-major per hand
    return jnp.moveaxis(pts.reshape(n_poses, h, 21, 3), 0, 1).reshape(h, -1, 3)


def _visibility_counts(
    cameras: cam.Camera,  # batch (V,)
    landmarks_world: jnp.ndarray,  # (H, 21, 3)
    src_kind: str,
) -> jnp.ndarray:
    """(H, V) count of landmarks visible in each camera.

    Matches reference rank_hand_visibility_in_cameras
    (perspective_crop.py:54-86): in-bounds in window coords AND z > 0.
    """
    # broadcast: cameras (V,), landmarks (H, 21, 3) -> (H, V, 21, ...)
    lm = landmarks_world[:, None]  # (H, 1, 21, 3)
    eye = cam.world_to_eye(cameras, lm)  # (H, V, 21, 3)
    win = cam.eye_to_window(cameras, eye, src_kind)
    w = cameras.width[:, None]
    h = cameras.height[:, None]
    vis = (
        (win[..., 0] >= 0)
        & (win[..., 0] <= w - 1)
        & (win[..., 1] >= 0)
        & (win[..., 1] <= h - 1)
        & (eye[..., 2] > 0)
    )
    return jnp.sum(vis, axis=-1)


def gen_crop_slots(
    cameras: cam.Camera,  # batch (V,) source cameras with frame extrinsics
    camera_angles: jnp.ndarray,  # (V,)
    hand: HandModel,  # unbatched, millimeters
    joint_angles: jnp.ndarray,  # (NUM_HANDS, 22)
    wrist_transforms: jnp.ndarray,  # (NUM_HANDS, 4, 4) world, millimeters
    hand_confidences: jnp.ndarray,  # (NUM_HANDS,)
    crop_size: Tuple[int, int],
    num_crop_points: int = 63,
    min_num_crops: int = 1,
    min_required_vis_landmarks: int = 19,
    focal_multiplier: float = 0.8,
    src_kind: str = cam.FISHEYE62,
    mirror_right_hand: bool = True,
    sort_camera_index: bool = True,
) -> CropSlots:
    """Vectorized equivalent of HandTracker.gen_crop_cameras."""
    n_hands = joint_angles.shape[0]
    hand_idx = jnp.arange(n_hands)

    pts = _crop_points(hand, joint_angles, wrist_transforms, num_crop_points)
    lm_actual = pts[:, :21]

    counts = _visibility_counts(cameras, lm_actual, src_kind)  # (H, V)
    eligible = counts >= min_required_vis_landmarks

    n_cams = counts.shape[-1]
    if sort_camera_index:
        # The reference sorts ALL eligible cameras ascending by index and
        # takes the first MAX_VIEWS (perspective_crop.py:165-178 with
        # sort_camera_index=True, which the tracker always sets,
        # tracker.py:248): selection = the two lowest-indexed eligible
        # cameras, NOT the two most visible.
        score = jnp.where(eligible, -jnp.arange(n_cams), -jnp.inf)
    else:
        # visibility ranking with ties to the lower index (stable sort)
        score = jnp.where(eligible, counts.astype(jnp.float32), -jnp.inf)
    top_vals, top_idx = lax.top_k(score, MAX_VIEWS)  # (H, 2)
    slot_valid = jnp.isfinite(top_vals)
    view_idx = top_idx

    confident = hand_confidences >= CONFIDENCE_THRESHOLD
    n_eligible = jnp.sum(slot_valid, axis=-1)
    hand_valid = confident & (n_eligible >= min_num_crops)
    view_valid = slot_valid & confident[:, None] & hand_valid[:, None]

    # gather per-slot source camera world->eye + roll angle
    flat_idx = view_idx.reshape(-1)
    w2e = affine.rigid_inverse(cameras.T_world_from_eye)[flat_idx].reshape(
        n_hands, MAX_VIEWS, 4, 4
    )
    angles = camera_angles[flat_idx].reshape(n_hands, MAX_VIEWS)

    mirror = (
        jnp.broadcast_to((hand_idx == hm.RIGHT_HAND_INDEX)[:, None], (n_hands, MAX_VIEWS))
        if mirror_right_hand
        else jnp.zeros((n_hands, MAX_VIEWS), bool)
    )
    crop_cams = crop.gen_crop_camera(
        w2e,
        jnp.broadcast_to(pts[:, None], (n_hands, MAX_VIEWS) + pts.shape[1:]),
        crop_size,
        mirror,
        camera_angle_deg=angles,
        focal_multiplier=focal_multiplier,
    )
    view_valid = view_valid & crop_cams.valid
    # Slot 0 must stay the anchor view (cam0 of the sample). If crop
    # synthesis failed for slot 0 the hand is dropped this frame (the
    # reference would raise ValueError from gen_intrinsics there).
    hand_valid = (
        hand_valid
        & view_valid[:, 0]
        & (jnp.sum(view_valid, axis=-1) >= min_num_crops)
    )
    view_valid = view_valid & hand_valid[:, None]

    return CropSlots(
        view_idx=view_idx,
        view_valid=view_valid,
        hand_valid=hand_valid,
        cameras=crop_cams,
    )


def gen_crop_slots_from_2d(
    cameras: cam.Camera,  # batch (V,) source cameras (V == MAX_VIEWS)
    keypoints_2d: jnp.ndarray,  # (NUM_HANDS, V, 21, 2) window coords
    keypoints_valid: jnp.ndarray,  # (NUM_HANDS, V) bool
    crop_size: Tuple[int, int],
    focal_multiplier: float = 0.8,
    src_kind: str = cam.FISHEYE62,
    mirror_right_hand: bool = True,
) -> CropSlots:
    """Crop cameras from per-view 2D keypoints (the live-demo path).

    Vectorized equivalent of the fork's
    ``gen_crop_cameras_from_stereo_camera_with_window_hand_pose``
    (lib/tracker/tracker.py:111-219): unproject each view's 2D keypoints to
    unit-depth pseudo-3D points in world space, then synthesize a look-at
    crop camera per (hand, view) bounding those points; right hands mirror.

    View slot v uses source camera v directly (stereo rig -> MAX_VIEWS=2).
    """
    n_hands = keypoints_2d.shape[0]
    v = keypoints_2d.shape[1]
    assert v == MAX_VIEWS

    rays = cam.window_to_eye(cameras, keypoints_2d, src_kind)  # (H, V, 21, 3)
    pts_world = cam.eye_to_world(cameras, rays)

    w2e = affine.rigid_inverse(cameras.T_world_from_eye)  # (V, 4, 4)
    w2e = jnp.broadcast_to(w2e, (n_hands, v, 4, 4))

    hand_idx = jnp.arange(n_hands)
    mirror = (
        jnp.broadcast_to((hand_idx == hm.RIGHT_HAND_INDEX)[:, None], (n_hands, v))
        if mirror_right_hand
        else jnp.zeros((n_hands, v), bool)
    )
    crop_cams = crop.gen_crop_camera(
        w2e,
        pts_world,
        crop_size,
        mirror,
        camera_angle_deg=0.0,
        focal_multiplier=focal_multiplier,
    )
    view_valid = keypoints_valid & crop_cams.valid
    hand_valid = view_valid[:, 0]  # slot 0 anchors the sample
    view_valid = view_valid & hand_valid[:, None]
    return CropSlots(
        view_idx=jnp.broadcast_to(jnp.arange(v), (n_hands, v)),
        view_valid=view_valid,
        hand_valid=hand_valid,
        cameras=crop_cams,
    )
