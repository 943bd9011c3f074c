"""Hand model, forward kinematics / linear-blend skinning, and metrics."""

from .hand_model import (
    HandModel,
    NUM_HANDS,
    NUM_JOINTS_PER_HAND,
    NUM_JOINT_FRAMES,
    NUM_LANDMARKS_PER_HAND,
    load_hand_model_json,
    mirrored_hand_model,
    scaled_hand_model,
)
from .skinning import skin_landmarks, skin_points, skinning_transforms
from .metrics import (
    PCK_THRESHOLDS,
    keypoint_acceleration,
    mpjpe,
    normalized_auc,
    pck_curve,
)

__all__ = [
    "HandModel",
    "NUM_HANDS",
    "NUM_JOINTS_PER_HAND",
    "NUM_JOINT_FRAMES",
    "NUM_LANDMARKS_PER_HAND",
    "PCK_THRESHOLDS",
    "keypoint_acceleration",
    "load_hand_model_json",
    "mirrored_hand_model",
    "mpjpe",
    "normalized_auc",
    "pck_curve",
    "scaled_hand_model",
    "skin_landmarks",
    "skin_points",
    "skinning_transforms",
]
