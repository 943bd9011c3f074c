"""Temporal ConvRNN with explicit, functional state.

The reference ``SimpleConvRNN`` (lib/models/temporal.py) keeps per-hand
memory tensors as mutable module attributes, lazily grown and updated in
place. Here the memory is an explicit pytree carried by the caller (through
``lax.scan`` for sequences), with dense masked updates:

  * state: mem_features (B, h, w, M), prev_extrinsics (B, 4, 4);
  * re-anchoring: memory is FTL-transformed by cur_cam0 @ inv(prev_cam0)
    where use_memory, zeroed where not (temporal.py:51-78);
  * cell: concat(mem, img) -> n_temporal_blocks x 1x1 conv (ReLU between,
    none after the last) -> split back into (new_mem, fused)
    (temporal.py:80-91). Channel order [mem | img] matches torch cat(dim=1).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..geometry.affine import matmul, rigid_inverse
from .config import ModelConfig
from .ftl import apply_ftl
from .layers import conv2d, init_conv


class TemporalState(NamedTuple):
    """Recurrent memory for a batch of tracked-hand slots."""

    mem_features: jnp.ndarray  # (B, h, w, M)
    prev_extrinsics: jnp.ndarray  # (B, 4, 4) cam0 world->eye at previous step


def init_temporal_state(batch: int, cfg: ModelConfig) -> TemporalState:
    h, w = cfg.feature_size
    return TemporalState(
        mem_features=jnp.zeros((batch, h, w, cfg.n_temporal_memory_channels)),
        prev_extrinsics=jnp.zeros((batch, 4, 4)),
    )


def init_temporal(rng, cfg: ModelConfig) -> dict:
    nc = cfg.n_image_feature_channels + cfg.n_temporal_memory_channels
    keys = jax.random.split(rng, cfg.n_temporal_blocks)
    return {"blocks": [init_conv(k, 1, 1, nc, nc) for k in keys]}


def temporal_step(
    params: dict,
    state: TemporalState,
    img_features: jnp.ndarray,  # (B, h, w, C)
    cur_extrinsics: jnp.ndarray,  # (B, 4, 4) cam0 world->eye
    use_memory: jnp.ndarray,  # (B,) bool
    cfg: ModelConfig,
) -> Tuple[TemporalState, jnp.ndarray]:
    """One recurrent step -> (new_state, fused_features (B, h, w, C))."""
    m = cfg.n_temporal_memory_channels

    # Re-anchor memory into the current cam0 frame. Where memory is unused
    # the transform input is zeroed first (matching the reference, which
    # zeroes non-use slots *before* transforming -- temporal.py:59-63).
    mem = jnp.where(use_memory[:, None, None, None], state.mem_features, 0.0)
    mem = mem.astype(img_features.dtype)  # serving: bf16 through the cell
    prev_ext = jnp.where(use_memory[:, None, None], state.prev_extrinsics, 0.0)
    # For unused slots prev_ext is singular; feed identity to keep the math
    # finite, then mask the result.
    safe_prev = jnp.where(
        use_memory[:, None, None], prev_ext, jnp.eye(4, dtype=prev_ext.dtype)
    )
    rel = matmul(cur_extrinsics, rigid_inverse(safe_prev))
    mem_xfed = apply_ftl(rel, mem, cfg.temporal_ftl_ratio)
    mem_xfed = jnp.where(use_memory[:, None, None, None], mem_xfed, 0.0)

    x = jnp.concatenate([mem_xfed, img_features], axis=-1)
    n_blocks = len(params["blocks"])
    for i, p in enumerate(params["blocks"]):
        x = conv2d(p, x)
        if i != n_blocks - 1:
            x = jax.nn.relu(x)

    new_mem = x[..., :m]
    fused = x[..., m:]
    # the carried state keeps its original dtype (scan carries must be
    # dtype-stable; memory stays f32 even when the cell computes in bf16)
    new_state = TemporalState(
        mem_features=new_mem.astype(state.mem_features.dtype),
        prev_extrinsics=cur_extrinsics,
    )
    return new_state, fused
