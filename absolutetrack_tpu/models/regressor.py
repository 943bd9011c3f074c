"""Pose regressor: feature maps -> joint angles, wrist transform, scale, sigmas.

Reference ``PoseRegressor`` (lib/models/regressor.py) +
``create_pose_regression_layers`` (model_utils.py:195-208):
  head = n_pose_regression_blocks x BasicBlock(C, C) -> 1x1 conv(C, n_out)
         -> global average pool -> flat (B, n_out)
  outputs split in insertion order:
     joint_angles (20) | wrist_xfs (7*3) | [skel_scales (1)] | sigmas (21)
  decoders:
     joint angles: append 2 zero wrist DoFs -> 22 (regressor.py:76-85)
     wrist: predicted 7 rigid points Procrustes-aligned to a fixed template
            of canonical points with norm 0.1 (regressor.py:19-47, 88-104)
     scales: exp(log_scale) (regressor.py:107-114)
     sigmas: clamp(softplus, 1e-5) (regressor.py:117-121)
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.procrustes import procrustes_align
from .config import ModelConfig
from .layers import basic_block, conv2d, init_basic_block, init_conv


def wrist_rigid_template(n_pts: int = 7, expected_norm: float = 0.1) -> np.ndarray:
    """The 7 canonical wrist sample points, rescaled to norm 0.1.

    Reference ``_gen_rigid_features`` (regressor.py:19-47).
    """
    pts = np.array(
        [
            [0, 0, 0],
            [1, 0, 0],
            [0, 1, 0],
            [0, 0, 1],
            [-1, -1, 0],
            [-1, 0, -1],
            [0, -1, -1],
        ],
        np.float64,
    )
    norms = np.linalg.norm(pts, axis=-1, keepdims=True)
    scaled = np.where(norms == 0, pts, pts / np.where(norms == 0, 1, norms) * expected_norm)
    return scaled[:n_pts].astype(np.float32)


class RegressorOutput(NamedTuple):
    joint_angles: jnp.ndarray  # (B, 22)
    wrist_xfs: jnp.ndarray  # (B, 4, 4)
    skel_scales: Optional[jnp.ndarray] = None  # (B,)
    landmark_uncertainty_sigmas: Optional[jnp.ndarray] = None  # (B, 21)


def output_dims(predict_skel_scale: bool, n_wrist_rigid_pts: int = 7):
    dims = {
        "joint_angles": 20,
        "wrist_xfs": n_wrist_rigid_pts * 3,
        "skel_scales": 1 if predict_skel_scale else 0,
        "landmark_uncertainty_sigmas": 21,
    }
    ranges, n = {}, 0
    for k, v in dims.items():
        if v:
            ranges[k] = (n, n + v)
            n += v
    return ranges, n


def init_regressor(rng, cfg: ModelConfig, use_skel: bool, predict_skel_scale: bool) -> dict:
    c_in = cfg.n_image_feature_channels + (
        cfg.n_skeleton_feature_channels if use_skel else 0
    )
    _, n_out = output_dims(predict_skel_scale, cfg.n_wrist_rigid_pts)
    keys = jax.random.split(rng, cfg.n_pose_regression_blocks + 1)
    return {
        "blocks": [
            init_basic_block(keys[i], c_in, c_in)
            for i in range(cfg.n_pose_regression_blocks)
        ],
        "out": init_conv(keys[-1], 1, 1, c_in, n_out),
    }


def regress_poses(
    params: dict,
    features: jnp.ndarray,  # (B, h, w, C)
    cfg: ModelConfig,
    predict_skel_scale: bool,
) -> RegressorOutput:
    x = features
    for p in params["blocks"]:
        x = basic_block(p, x)
    x = conv2d(params["out"], x)
    # pool + decode in f32 regardless of the trunk's compute dtype: the
    # Procrustes/exp/softplus decoders are geometry, not MXU work
    pose = jnp.mean(x.astype(jnp.float32), axis=(1, 2))  # (B, n_out)

    ranges, _ = output_dims(predict_skel_scale, cfg.n_wrist_rigid_pts)
    b = pose.shape[0]

    r = ranges["joint_angles"]
    joint_angles = jnp.concatenate(
        [pose[:, r[0] : r[1]], jnp.zeros((b, 2), pose.dtype)], axis=-1
    )

    r = ranges["wrist_xfs"]
    pred_pts = pose[:, r[0] : r[1]].reshape(b, -1, 3)
    template = jnp.asarray(wrist_rigid_template(cfg.n_wrist_rigid_pts))
    from_pts = jnp.broadcast_to(template, (b,) + template.shape)
    wrist_xfs = procrustes_align(from_pts, pred_pts)

    skel_scales = None
    if predict_skel_scale:
        r = ranges["skel_scales"]
        skel_scales = jnp.exp(pose[:, r[0]])

    r = ranges["landmark_uncertainty_sigmas"]
    sigmas = jnp.maximum(jax.nn.softplus(pose[:, r[0] : r[1]]), 1e-5)

    return RegressorOutput(
        joint_angles=joint_angles,
        wrist_xfs=wrist_xfs,
        skel_scales=skel_scales,
        landmark_uncertainty_sigmas=sigmas,
    )
