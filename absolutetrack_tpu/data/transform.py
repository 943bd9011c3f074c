"""Batched preprocessing for packed (torch_data-style) sequences.

Reference equivalent: lib/batched_dataset/data_transform.py. A packed
sample is a sequence of already-pinhole-resampled stereo views plus labels
(GT skeleton + generic-skeleton solved pose + enclosing points). The
transform generates per-frame crop cameras from the stored enclosing
points, warps through a single pixel homography per view
(data_transform.py:57-144), converts mm -> m, and mirrors right hands into
the left-hand canonical space.

Unlike the reference (per-frame Python loops + NumPy warp on the host),
the whole transform here is one jittable batched function -- it can run on
device, overlapped with compute via the prefetcher.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import affine, crop as crop_mod
from ..kinematics.hand_model import HandModel, hand_model_from_dict, mirrored_hand_model, scaled_hand_model
from ..ops.resample import compute_resample_matrix, warp_homography

MM_TO_M = 0.001


class PackedSequence(NamedTuple):
    """Preprocessed model inputs + targets for one packed sequence.

    All tensors time-major-less (T leading), units in meters.
    """

    left_images: jnp.ndarray  # (T, V, h, w) in [0, 1]
    intrinsics: jnp.ndarray  # (T, V, 3, 3)
    extrinsics: jnp.ndarray  # (T, V, 4, 4)
    hand_idx: jnp.ndarray  # () int
    gt_joint_angles: jnp.ndarray  # (T, 22)
    gt_wrist: jnp.ndarray  # (T, 4, 4) left-canonical, meters
    solved_joint_angles: jnp.ndarray  # (T, 22)
    solved_wrist: jnp.ndarray  # (T, 4, 4)
    gt_hand_model: HandModel  # left-canonical, meters
    generic_hand_model: HandModel
    pinch: jnp.ndarray


def _mirror_wrist_to_left(wrist: jnp.ndarray, is_right) -> jnp.ndarray:
    sign = jnp.where(is_right, -1.0, 1.0)
    return wrist.at[..., :, 0].multiply(sign)


def preprocess_packed(
    mono: np.ndarray,  # (T, V, H, W) uint8
    labels: Dict,
    crop_size: Tuple[int, int] = (96, 96),
    focal_multiplier: float = 0.95,
) -> PackedSequence:
    """Parse one packed sample and produce cropped model inputs.

    ``labels`` follows the reference RawSample schema
    (lib/batched_dataset/sample.py:16-53).
    """
    t, v = mono.shape[:2]
    extrinsics = jnp.asarray(labels["extrinsics"], jnp.float32)  # (T, V, 4, 4)
    intrinsics = jnp.asarray(labels["intrinsics"], jnp.float32)  # (T, V, 3, 3)
    enclosing = jnp.asarray(labels["enclosing_points"], jnp.float32)  # (T, P, 3)
    hand = jnp.asarray(labels["hand"], jnp.float32).reshape(-1)[0]
    wrist = jnp.asarray(labels["wrist"], jnp.float32)
    joint_angles = jnp.asarray(labels["joint_angles"], jnp.float32)
    solved_wrist = jnp.asarray(labels["solved_wrist_xfs"], jnp.float32)
    solved_angles = jnp.asarray(labels["solved_joint_angles"], jnp.float32)
    pinch = jnp.asarray(labels.get("pinch", np.zeros(t)), jnp.float32)

    gt_hand = hand_model_from_dict(labels["hand_model"])
    generic = hand_model_from_dict(labels["generic_hand_model"])

    # mm -> m (reference sample.py:33-39)
    extrinsics = extrinsics.at[..., :3, 3].multiply(MM_TO_M)
    enclosing = enclosing * MM_TO_M
    wrist = wrist.at[..., :3, 3].multiply(MM_TO_M)
    solved_wrist = solved_wrist.at[..., :3, 3].multiply(MM_TO_M)
    gt_hand = scaled_hand_model(gt_hand, MM_TO_M)
    generic = scaled_hand_model(generic, MM_TO_M)

    is_right = hand == 1
    gt_hand = mirrored_hand_model(gt_hand, is_right)
    generic = mirrored_hand_model(generic, is_right)
    wrist = _mirror_wrist_to_left(wrist, is_right)
    solved_wrist = _mirror_wrist_to_left(solved_wrist, is_right)

    # per (frame, view) crop cameras from enclosing points
    pts = jnp.broadcast_to(enclosing[:, None], (t, v) + enclosing.shape[1:])
    mirror = jnp.broadcast_to(is_right, (t, v))
    cc = crop_mod.gen_crop_camera(
        extrinsics, pts, crop_size, mirror, 0.0, focal_multiplier
    )
    new_K = crop_mod.intrinsics_matrix_from_crop(cc)
    new_w2e = cc.T_world_to_eye

    resample = compute_resample_matrix(
        intrinsics, extrinsics, new_K, affine.rigid_inverse(new_w2e)
    )
    imgs = jnp.asarray(mono, jnp.float32).reshape(t * v, *mono.shape[2:])
    warped = warp_homography(imgs, resample.reshape(t * v, 4, 4), crop_size)
    warped = warped.reshape(t, v, crop_size[1], crop_size[0]) / 255.0

    return PackedSequence(
        left_images=warped,
        intrinsics=new_K,
        extrinsics=new_w2e,
        hand_idx=jnp.asarray(hand, jnp.int32),
        gt_joint_angles=joint_angles,
        gt_wrist=wrist,
        solved_joint_angles=solved_angles,
        solved_wrist=solved_wrist,
        gt_hand_model=gt_hand,
        generic_hand_model=generic,
        pinch=pinch,
    )
