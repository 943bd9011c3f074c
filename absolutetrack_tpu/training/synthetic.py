"""Synthetic SequenceBatch / hand-model builders for dry runs and tests.

Shared by ``__graft_entry__.dryrun_multichip`` and the multi-device
equivalence tests: a deterministic, tiny sequence batch that exercises the
full train/eval step (backbone, FTL fusion, ConvRNN carry, regressor,
loss) without any real data. The reference has no training subsystem to
mirror; shapes follow SequenceBatch (training/train.py).
"""

from __future__ import annotations

import numpy as np

from ..kinematics.hand_model import HandModel
from ..models.config import ModelConfig
from .train import SequenceBatch


def synthetic_sequence_batch(
    b: int,
    t: int = 2,
    cfg: ModelConfig = ModelConfig(input_size=(32, 32)),
    seed: int = 0,
) -> SequenceBatch:
    """Deterministic random batch of b samples x t frames x 2 views."""
    v = cfg.num_views
    h, w = cfg.input_size
    rng = np.random.default_rng(seed)

    def arr(shape, scale=1.0):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    eye3 = np.broadcast_to(
        np.eye(3, dtype=np.float32) * [250, 250, 1], (t, b, v, 3, 3)
    )
    eye4 = np.broadcast_to(np.eye(4, dtype=np.float32), (t, b, v, 4, 4))
    use_mem = np.zeros((t, b), bool)
    use_mem[1:] = True

    return SequenceBatch(
        images=rng.uniform(0, 1, (t, b, v, h, w)).astype(np.float32),
        intrinsics=np.ascontiguousarray(eye3),
        extrinsics=np.ascontiguousarray(eye4),
        use_memory=use_mem,
        sample_mask=np.ones((t, b), bool),
        hand_idx=(np.arange(b) % 2).astype(np.int32),
        skel_axes=arr((b, 22, 3), 0.1),
        skel_rest=arr((b, 22, 3), 0.01),
        gt_joint_angles=arr((t, b, 22), 0.1),
        gt_wrist=np.ascontiguousarray(
            np.broadcast_to(np.eye(4, dtype=np.float32), (t, b, 4, 4))
        ),
        gt_log_scale=np.zeros(b, np.float32),
    )


def synthetic_hand_model_m(b: int, seed: int = 0) -> HandModel:
    """Tiny batched left-canonical hand model in meters."""
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)

    def arr(shape, scale=1.0):
        return jnp.asarray((rng.standard_normal(shape) * scale).astype(np.float32))

    return HandModel(
        joint_rotation_axes=arr((b, 22, 3)),
        joint_rest_positions=arr((b, 22, 3), 0.01),
        joint_frame_index=jnp.zeros((b, 22), jnp.int32),
        joint_parent=jnp.zeros((b, 22), jnp.int32),
        joint_first_child=jnp.zeros((b, 22), jnp.int32),
        joint_next_sibling=jnp.zeros((b, 22), jnp.int32),
        landmark_rest_positions=arr((b, 21, 3), 0.01),
        landmark_rest_bone_weights=jnp.ones((b, 21, 3)) / 3.0,
        landmark_rest_bone_indices=jnp.asarray(
            rng.integers(0, 17, (b, 21, 3)), jnp.int32
        ),
    )
