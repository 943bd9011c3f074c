"""Sharded sequence train/eval steps (scan over time, pjit over the mesh).

The reference evaluates packed sequences with a Python loop over timesteps
feeding batch-lockstep memory (run_inference_torch_data.py:39-112). Here
the unroll is a ``lax.scan`` with the temporal memory as carry, jitted once
and sharded over a ('data', 'model') mesh: batch -> data axis, the two crop
views -> model axis (XLA inserts the per-sample all-gather at fusion).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..kinematics.hand_model import HandModel
from ..models.config import ModelConfig
from ..models.umetrack import FrameInputs, SkeletonInputs, UmeTrackModel
from .loss import LossWeights, sequence_loss


class SequenceBatch(NamedTuple):
    """A batch of temporal windows (time-major for scan).

    images      : (T, B, V, H, W) normalized crops
    intrinsics  : (T, B, V, 3, 3)
    extrinsics  : (T, B, V, 4, 4) world->eye, meters
    use_memory  : (T, B) bool (False at window starts)
    sample_mask : (T, B) bool
    hand_idx    : (B,)
    skel_axes, skel_rest : (B, 22, 3), meters (known-skeleton branch)
    gt_joint_angles : (T, B, 22)
    gt_wrist    : (T, B, 4, 4) world, meters, LEFT-hand canonical space
    gt_log_scale: (B,) optional
    """

    images: jnp.ndarray
    intrinsics: jnp.ndarray
    extrinsics: jnp.ndarray
    use_memory: jnp.ndarray
    sample_mask: jnp.ndarray
    hand_idx: jnp.ndarray
    skel_axes: jnp.ndarray
    skel_rest: jnp.ndarray
    gt_joint_angles: jnp.ndarray
    gt_wrist: jnp.ndarray
    gt_log_scale: Optional[jnp.ndarray] = None


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jnp.ndarray


def _unroll(params, batch: SequenceBatch, cfg: ModelConfig, branch: str):
    """Scan the model over the window -> RegressorOutput stacked on T."""
    model = UmeTrackModel(params, cfg)
    b = batch.hand_idx.shape[0]
    state0 = model.init_state(b)
    skel = SkeletonInputs(batch.skel_axes, batch.skel_rest)

    def step(state, xs):
        images, intr, extr, use_mem, mask, gt_wrist_unused = xs
        frame = FrameInputs(
            left_images=images,
            intrinsics=intr,
            extrinsics=extr,
            view_mask=jnp.ones(images.shape[:2], bool),
            hand_idx=batch.hand_idx,
            use_memory=use_mem,
            sample_mask=mask,
        )
        if branch == "known":
            state, out = model.regress_pose_use_skeleton(state, frame, skel)
        else:
            state, out = model.regress_pose_pred_skel_scale(state, frame)
        return state, out

    xs = (
        batch.images,
        batch.intrinsics,
        batch.extrinsics,
        batch.use_memory,
        batch.sample_mask,
        batch.gt_wrist,
    )
    _, outs = lax.scan(step, state0, xs)
    return outs


def _undo_world_mirror(wrist_world: jnp.ndarray, hand_idx: jnp.ndarray) -> jnp.ndarray:
    """Map predicted world wrist back to LEFT-hand canonical space.

    The model mirrors the x column for right hands on output
    (umetrack_model.py:77-90); GT packed data stores left-canonical
    transforms, so undo the mirror before comparing.
    """
    sign = jnp.where(hand_idx == 1, -1.0, 1.0)
    return wrist_world.at[..., :, 0].multiply(sign[..., None])


def loss_fn(
    params,
    batch: SequenceBatch,
    hand_model_m: HandModel,  # leading dim (B,), left-canonical, meters
    cfg: ModelConfig,
    branch: str = "known",
    weights: LossWeights = LossWeights(),
):
    if branch == "both":
        # train regressor_k AND regressor_u (+ shared trunk) in one step:
        # the eval protocol chain needs both (unknown-skeleton calibration
        # uses regressor_u, pass-2 tracking uses regressor_k)
        tk, mk = loss_fn(params, batch, hand_model_m, cfg, "known", weights)
        tu, mu = loss_fn(params, batch, hand_model_m, cfg, "unknown", weights)
        metrics = {f"u_{k}": v for k, v in mu.items()}
        metrics.update(mk)
        metrics["total"] = tk + tu
        return tk + tu, metrics
    outs = _unroll(params, batch, cfg, branch)
    pred_wrist_left = _undo_world_mirror(outs.wrist_xfs, batch.hand_idx[None])
    outs = outs._replace(wrist_xfs=pred_wrist_left)
    return sequence_loss(
        outs,
        hand_model_m,
        batch.gt_joint_angles,
        batch.gt_wrist,
        batch.sample_mask,
        weights,
        batch.gt_log_scale if branch == "unknown" else None,
    )


def make_optimizer(
    lr: float = 1e-4,
    weight_decay: float = 1e-5,
    clip_norm: float = 1.0,
    max_consecutive_nonfinite: int = 10,
):
    """AdamW with global-norm clipping and non-finite-update rejection.

    A rare degenerate sample (e.g. an augmented pose that lands a hand
    nearly edge-on to a crop camera) can produce an inf/NaN loss; without
    the ``apply_if_finite`` guard one such batch poisons the parameters
    permanently (observed in round 4: stage-4 training went NaN at one
    batch and the periodic checkpoint save then persisted the damage).
    Clipping bounds the healthy-but-spiky gradients the sequence NLL
    produces on hard batches.
    """
    inner = optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.adamw(lr, weight_decay=weight_decay),
    )
    return optax.apply_if_finite(inner, max_consecutive_nonfinite)


def batch_shardings(mesh: Mesh) -> SequenceBatch:
    """Shardings for a SequenceBatch: batch over 'data', views over 'model'."""
    s = lambda *spec: NamedSharding(mesh, P(*spec))
    return SequenceBatch(
        images=s(None, "data", "model"),
        intrinsics=s(None, "data", "model"),
        extrinsics=s(None, "data", "model"),
        use_memory=s(None, "data"),
        sample_mask=s(None, "data"),
        hand_idx=s("data"),
        skel_axes=s("data"),
        skel_rest=s("data"),
        gt_joint_angles=s(None, "data"),
        gt_wrist=s(None, "data"),
        gt_log_scale=s("data"),
    )


def make_train_step(
    mesh: Mesh,
    cfg: ModelConfig,
    optimizer: optax.GradientTransformation,
    branch: str = "known",
    weights: LossWeights = LossWeights(),
):
    """Build the jitted SPMD train step.

    Parameters are replicated; the batch is sharded (data, model); gradient
    psums are inserted by XLA from the sharding annotations.
    """
    replicated = NamedSharding(mesh, P())

    @partial(
        jax.jit,
        donate_argnums=(0,),
        static_argnames=(),
    )
    def train_step(
        state: TrainState, batch: SequenceBatch, hand_model_m: HandModel
    ) -> Tuple[TrainState, dict]:
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, hand_model_m, cfg, branch, weights
        )
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(new_params, new_opt, state.step + 1), metrics

    return train_step


def make_eval_step(mesh: Mesh, cfg: ModelConfig, branch: str = "known"):
    """Jitted SPMD eval: unroll + per-window landmark error sums.

    Returns (err_sum_mm, err_count, outs) with the sums reduced across the
    mesh by XLA (psum via sharding), replacing the reference's
    pickle-concat metric aggregation (load_eval.py:47-89).
    """
    from ..kinematics.skinning import skin_landmarks

    @jax.jit
    def eval_step(params, batch: SequenceBatch, hand_model_m: HandModel):
        outs = _unroll(params, batch, cfg, branch)
        pred_wrist_left = _undo_world_mirror(outs.wrist_xfs, batch.hand_idx[None])
        t, b = batch.gt_joint_angles.shape[:2]
        hand_tb = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (t,) + x.shape), hand_model_m
        )
        pred_lm = skin_landmarks(hand_tb, outs.joint_angles, pred_wrist_left)
        gt_lm = skin_landmarks(hand_tb, batch.gt_joint_angles, batch.gt_wrist)
        err = jnp.linalg.norm(pred_lm - gt_lm, axis=-1).mean(-1)  # (T, B)
        mask = batch.sample_mask.astype(jnp.float32)
        return {
            "err_sum_m": jnp.sum(err * mask),
            "err_count": jnp.sum(mask),
            "scales": outs.skel_scales,
            "joint_angles": outs.joint_angles,
            "wrist_xfs": outs.wrist_xfs,
        }

    return eval_step
