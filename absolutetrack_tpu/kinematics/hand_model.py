"""The 22-joint / 21-landmark UmeTrack hand model as a frozen JAX pytree.

Schema matches the reference's ``HandModel`` NamedTuple
(lib/common/hand.py:48-76) and ``dataset/generic_hand_model.json``:

  joint_rotation_axes        (..., 22, 3)
  joint_rest_positions       (..., 22, 3)
  joint_frame_index          (..., 22)      int
  joint_parent               (..., 22)      int
  joint_first_child          (..., 22)      int
  joint_next_sibling         (..., 22)      int
  landmark_rest_positions    (..., 21, 3)
  landmark_rest_bone_weights (..., 21, 3)
  landmark_rest_bone_indices (..., 21, 3)   int
  hand_scale                 (...,)         optional scalar
  mesh_vertices              (..., 788, 3)  optional
  mesh_triangles             (..., 1544, 3) optional
  dense_bone_weights         (..., 788, 17) optional
  joint_limits               (..., 22, 2)   optional

Joint layout (per reference lib/common/hand.py:12-21 and hand_skinning.py):
20 finger DoFs (5 fingers x 4) followed by 2 wrist DoFs; the wrist pose comes
from the separate rigid wrist transform, and skinning uses 17 frames
(root + wrist + 3 frames per finger).
"""

from __future__ import annotations

import json
from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

NUM_HANDS = 2
NUM_LANDMARKS_PER_HAND = 21
NUM_JOINTS_PER_HAND = 22
NUM_DIGITS = 5
NUM_JOINT_FRAMES = 1 + 1 + 3 * 5  # root + wrist + 3 frames per finger
DOF_PER_FINGER = 4
LEFT_HAND_INDEX = 0
RIGHT_HAND_INDEX = 1


class HandModel(NamedTuple):
    joint_rotation_axes: jnp.ndarray
    joint_rest_positions: jnp.ndarray
    joint_frame_index: jnp.ndarray
    joint_parent: jnp.ndarray
    joint_first_child: jnp.ndarray
    joint_next_sibling: jnp.ndarray
    landmark_rest_positions: jnp.ndarray
    landmark_rest_bone_weights: jnp.ndarray
    landmark_rest_bone_indices: jnp.ndarray
    hand_scale: Optional[jnp.ndarray] = None
    mesh_vertices: Optional[jnp.ndarray] = None
    mesh_triangles: Optional[jnp.ndarray] = None
    dense_bone_weights: Optional[jnp.ndarray] = None
    joint_limits: Optional[jnp.ndarray] = None


def hand_model_from_dict(d: dict) -> HandModel:
    """Build a HandModel from a parsed JSON dict (reference hand.py:64-69)."""
    kwargs = {}
    for field in HandModel._fields:
        v = d.get(field)
        if v is None:
            kwargs[field] = None
        else:
            arr = np.asarray(v)
            if field in (
                "joint_frame_index",
                "joint_parent",
                "joint_first_child",
                "joint_next_sibling",
                "landmark_rest_bone_indices",
                "mesh_triangles",
            ):
                kwargs[field] = jnp.asarray(arr, jnp.int32)
            else:
                kwargs[field] = jnp.asarray(arr, jnp.float32)
    return HandModel(**kwargs)


def load_hand_model_json(path: str) -> HandModel:
    with open(path) as f:
        return hand_model_from_dict(json.load(f))


def scaled_hand_model(hand: HandModel, multiplier) -> HandModel:
    """Uniformly scale rest positions / landmarks / mesh (reference hand.py:78-111).

    ``multiplier`` may be a scalar or an array broadcastable to the model's
    leading batch dims.
    """
    m = jnp.asarray(multiplier, hand.joint_rest_positions.dtype)
    mm = m[..., None, None]
    return hand._replace(
        joint_rest_positions=hand.joint_rest_positions * mm,
        landmark_rest_positions=hand.landmark_rest_positions * mm,
        mesh_vertices=None
        if hand.mesh_vertices is None
        else hand.mesh_vertices * mm,
    )


def mirrored_hand_model(hand: HandModel, to_mirror: jnp.ndarray) -> HandModel:
    """Mirror the model about x where ``to_mirror`` is True (batched).

    Matches reference ``mirrored_hand_model`` (hand.py:114-147): rotation-axis
    y,z components and rest-position x components flip sign. ``to_mirror``
    broadcasts over the model's leading batch dims.
    """
    mask = jnp.asarray(to_mirror)[..., None, None]
    axes_mirrored = hand.joint_rotation_axes * jnp.asarray([1.0, -1.0, -1.0])
    jp_mirrored = hand.joint_rest_positions * jnp.asarray([-1.0, 1.0, 1.0])
    lm_mirrored = hand.landmark_rest_positions * jnp.asarray([-1.0, 1.0, 1.0])
    return hand._replace(
        joint_rotation_axes=jnp.where(mask, axes_mirrored, hand.joint_rotation_axes),
        joint_rest_positions=jnp.where(mask, jp_mirrored, hand.joint_rest_positions),
        landmark_rest_positions=jnp.where(
            mask, lm_mirrored, hand.landmark_rest_positions
        ),
    )


def neutral_joint_angles(hand: HandModel, lower_factor: float = 0.5) -> jnp.ndarray:
    """Mid-range joint angles (reference lib/tracker/perspective_crop.py:19-24)."""
    jl = hand.joint_limits
    assert jl is not None
    return jl[..., 0] * lower_factor + jl[..., 1] * (1.0 - lower_factor)


def landmark_skinning_matrix(hand: HandModel) -> jnp.ndarray:
    """Dense (..., 21, 17) skinning matrix from sparse <=3-bone weights.

    TPU-first replacement for the reference's flat scatter
    (hand_skinning.py:70-97): a one-hot matmul keeps everything dense and
    static-shape. Zero weights contribute nothing regardless of index.
    """
    idx = hand.landmark_rest_bone_indices  # (..., 21, K) int
    w = hand.landmark_rest_bone_weights  # (..., 21, K)
    one_hot = jnp.asarray(idx[..., None] == jnp.arange(NUM_JOINT_FRAMES), w.dtype)
    return jnp.sum(w[..., None] * one_hot, axis=-2)
