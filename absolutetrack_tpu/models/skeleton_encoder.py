"""Skeleton encoder: 22 joint (axis, rest position) pairs -> feature maps.

Reference ``SkeletonEncoder`` (lib/models/skeleton_encoder.py:28-53):
concat(axes, rest_positions) -> (B, 132) -> Linear(132, 4*6*6) ->
view(B, 4, 6, 6) -> BN + ReLU. BN folds into the linear layer.

The torch view produces NCHW (C=4); we emit NHWC, so the reshape is
followed by a transpose (fused by XLA).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .config import ModelConfig
from .layers import init_linear, linear


def init_skeleton_encoder(rng, cfg: ModelConfig) -> dict:
    h, w = cfg.feature_size
    n_in = 22 * 6
    n_out = cfg.n_skeleton_feature_channels * h * w
    return {"fc": init_linear(rng, n_in, n_out)}


def skeleton_encoder_apply(
    params: dict,
    joint_rotation_axes: jnp.ndarray,  # (B, 22, 3)
    joint_rest_positions: jnp.ndarray,  # (B, 22, 3)
    cfg: ModelConfig,
) -> jnp.ndarray:
    """-> (B, h, w, n_skeleton_feature_channels)."""
    h, w = cfg.feature_size
    c = cfg.n_skeleton_feature_channels
    b = joint_rotation_axes.shape[0]
    feats = jnp.concatenate([joint_rotation_axes, joint_rest_positions], axis=-1)
    x = linear(params["fc"], feats.reshape(b, -1))
    x = jax.nn.relu(x)  # BN folded into fc; ReLU stays
    return jnp.moveaxis(x.reshape(b, c, h, w), 1, -1)
