"""Loss functions for UmeTrack training / fine-tuning.

Supervision follows the UmeTrack paper's heads (as exposed by the
reference's RegressorOutput, lib/models/regressor.py:124-129):
  * landmark NLL: FK the predicted pose, penalize distance to GT landmarks
    under the predicted per-landmark sigma (heteroscedastic Gaussian);
  * joint angle L2 on the 20 finger DoFs;
  * wrist rigid-point L2: compare the 7 canonical template points mapped
    through predicted vs GT wrist transforms (rotation+translation-aware
    without angle parametrization headaches);
  * log skeleton-scale L2 for the unknown-skeleton branch.

All terms are masked by sample validity and expressed in meters.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp

from ..kinematics.hand_model import HandModel
from ..kinematics.skinning import skin_landmarks
from ..models.regressor import RegressorOutput, wrist_rigid_template


@dataclasses.dataclass(frozen=True)
class LossWeights:
    landmark: float = 1.0
    landmark_nll: float = 0.1
    joint_angle: float = 0.1
    wrist_points: float = 1.0
    skel_scale: float = 1.0


def pose_loss(
    out: RegressorOutput,
    hand_model_m: HandModel,  # batched to (B,) leading dim, meters
    gt_joint_angles: jnp.ndarray,  # (B, 22)
    gt_wrist_m: jnp.ndarray,  # (B, 4, 4), meters, LEFT-hand space
    sample_mask: jnp.ndarray,  # (B,)
    weights: LossWeights = LossWeights(),
    gt_log_scale: Optional[jnp.ndarray] = None,  # (B,)
    pred_wrist_left_m: Optional[jnp.ndarray] = None,
) -> tuple[jnp.ndarray, dict]:
    """Scalar masked loss + metric dict. All wrist transforms left-handed."""
    m = sample_mask.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(m), 1.0)

    pred_wrist = out.wrist_xfs if pred_wrist_left_m is None else pred_wrist_left_m

    gt_lm = skin_landmarks(hand_model_m, gt_joint_angles, gt_wrist_m)
    pred_lm = skin_landmarks(hand_model_m, out.joint_angles, pred_wrist)
    lm_err = jnp.linalg.norm(pred_lm - gt_lm, axis=-1)  # (B, 21)
    lm_l2 = jnp.sum(jnp.mean(lm_err, axis=-1) * m) / denom

    sigma = out.landmark_uncertainty_sigmas
    nll = jnp.log(sigma) + 0.5 * (lm_err / sigma) ** 2
    lm_nll = jnp.sum(jnp.mean(nll, axis=-1) * m) / denom

    ang = jnp.sum(
        jnp.mean((out.joint_angles[:, :20] - gt_joint_angles[:, :20]) ** 2, axis=-1) * m
    ) / denom

    tmpl = jnp.asarray(wrist_rigid_template())  # (7, 3)
    def map_pts(xf):
        return jnp.einsum("bij,pj->bpi", xf[:, :3, :3], tmpl) + xf[:, None, :3, 3]

    wrist_l2 = jnp.sum(
        jnp.mean(
            jnp.linalg.norm(map_pts(pred_wrist) - map_pts(gt_wrist_m), axis=-1), axis=-1
        )
        * m
    ) / denom

    total = (
        weights.landmark * lm_l2
        + weights.landmark_nll * lm_nll
        + weights.joint_angle * ang
        + weights.wrist_points * wrist_l2
    )
    metrics = {
        "landmark_l2_m": lm_l2,
        "landmark_nll": lm_nll,
        "joint_angle_mse": ang,
        "wrist_points_m": wrist_l2,
    }
    if gt_log_scale is not None and out.skel_scales is not None:
        scale_l2 = jnp.sum((jnp.log(out.skel_scales) - gt_log_scale) ** 2 * m) / denom
        total = total + weights.skel_scale * scale_l2
        metrics["skel_scale_logmse"] = scale_l2
    metrics["total"] = total
    return total, metrics


def sequence_loss(
    outs: RegressorOutput,  # leaves stacked over time: (T, B, ...)
    hand_model_m: HandModel,  # (B,) leading dims
    gt_joint_angles: jnp.ndarray,  # (T, B, 22)
    gt_wrist_m: jnp.ndarray,  # (T, B, 4, 4)
    sample_mask: jnp.ndarray,  # (T, B)
    weights: LossWeights = LossWeights(),
    gt_log_scale: Optional[jnp.ndarray] = None,  # (B,)
) -> tuple[jnp.ndarray, dict]:
    """Average pose_loss over an unrolled sequence (time-major)."""
    t = gt_joint_angles.shape[0]
    b = gt_joint_angles.shape[1]

    flat = lambda x: x.reshape((t * b,) + x.shape[2:])
    import jax

    outs_flat = jax.tree.map(flat, outs)
    hand_flat = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (t,) + x.shape).reshape((t * b,) + x.shape[1:]),
        hand_model_m,
    )
    scale_flat = (
        None
        if gt_log_scale is None
        else jnp.broadcast_to(gt_log_scale, (t, b)).reshape(-1)
    )
    return pose_loss(
        outs_flat,
        hand_flat,
        flat(gt_joint_angles),
        flat(gt_wrist_m),
        flat(sample_mask),
        weights,
        scale_flat,
    )
