"""Top-level UmeTrack model composition (pure functional).

Mirrors reference ``UmeTrackModel`` (lib/models/umetrack_model.py) with a
static-shape, masked design:

  * inputs are fixed-capacity (B samples x V=2 view slots) with a view
    validity mask, replacing the reference's ragged ``sample_range``
    batching (umetrack_model.py:123-168) -- every sample always has 2 view
    slots; invalid slots carry zero images and are masked out of fusion;
  * the known-skeleton branch concatenates encoded skeleton features;
  * the unknown-skeleton branch predicts a skeleton scale;
  * wrist transforms are recovered in world space with the right-hand x
    mirror (umetrack_model.py:77-90);
  * the temporal memory is an explicit ``TemporalState`` carried by the
    caller.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..geometry.affine import matmul, rigid_inverse
from .backbone import backbone_apply, init_backbone
from .config import ModelConfig
from .fusion import compute_singlev_xfs, fuse_views, init_fusion
from .regressor import RegressorOutput, init_regressor, regress_poses
from .skeleton_encoder import init_skeleton_encoder, skeleton_encoder_apply
from .temporal import TemporalState, init_temporal, init_temporal_state, temporal_step


class FrameInputs(NamedTuple):
    """One frame of network input for B tracked-hand samples.

    left_images : (B, V, H, W) normalized [0,1] mono crops (left-hand space;
                  right hands were mirrored by the crop camera).
    intrinsics  : (B, V, 3, 3) crop-camera intrinsics.
    extrinsics  : (B, V, 4, 4) crop-camera world->eye, translation in
                  METERS (reference tracker.py:335-337).
    view_mask   : (B, V) bool; valid views are compacted to the front.
    hand_idx    : (B,) 0 = left, 1 = right.
    use_memory  : (B,) bool -- whether the temporal memory slot is warm.
    sample_mask : (B,) bool -- inactive hand slots (outputs are garbage
                  there and must be ignored by the caller).
    """

    left_images: jnp.ndarray
    intrinsics: jnp.ndarray
    extrinsics: jnp.ndarray
    view_mask: jnp.ndarray
    hand_idx: jnp.ndarray
    use_memory: jnp.ndarray
    sample_mask: jnp.ndarray


class SkeletonInputs(NamedTuple):
    """Known-skeleton conditioning (units: METERS; reference tracker.py:361-367)."""

    joint_rotation_axes: jnp.ndarray  # (B, 22, 3) or (1, 22, 3) broadcast
    joint_rest_positions: jnp.ndarray  # (B, 22, 3)


def init_umetrack_params(rng, cfg: ModelConfig = ModelConfig()) -> dict:
    k = jax.random.split(rng, 5)
    return {
        "backbone": init_backbone(k[0], cfg),
        "fusion": init_fusion(k[1], cfg),
        "temporal": init_temporal(k[2], cfg),
        "skeleton_encoder": init_skeleton_encoder(k[3], cfg),
        "regressor_k": init_regressor(k[4], cfg, use_skel=True, predict_skel_scale=False),
        "regressor_u": init_regressor(k[4], cfg, use_skel=False, predict_skel_scale=True),
    }


def _recover_wrist_in_world(
    hand_idx: jnp.ndarray,  # (B,)
    cam0_extrinsics: jnp.ndarray,  # (B, 4, 4)
    wrist_in_cam0: jnp.ndarray,  # (B, 4, 4)
) -> jnp.ndarray:
    """inv(cam0) @ wrist, then mirror the x column for right hands
    (reference umetrack_model.py:77-90)."""
    world = matmul(rigid_inverse(cam0_extrinsics), wrist_in_cam0)
    sign = jnp.where(hand_idx == 1, -1.0, 1.0)
    return world.at[..., :, 0].multiply(sign[..., None])


class UmeTrackModel:
    """Thin namespace bundling the functional forward passes.

    All methods are static-shape pure functions suitable for jit/scan; the
    class only carries (params, cfg) for convenience.
    """

    def __init__(self, params: dict, cfg: ModelConfig = ModelConfig()):
        self.params = params
        self.cfg = cfg

    # -- feature trunk ----------------------------------------------------

    def extract_features(self, frame: FrameInputs) -> jnp.ndarray:
        """Backbone + FTL fusion -> (B, h, w, C) cam0-space features."""
        p, cfg = self.params, self.cfg
        b, v, hh, ww = frame.left_images.shape
        imgs = frame.left_images.reshape(b * v, hh, ww, 1).astype(cfg.dtype)
        feats = backbone_apply(p["backbone"], imgs, cfg)
        feats = feats.reshape((b, v) + feats.shape[1:])
        singlev_xfs = compute_singlev_xfs(
            frame.intrinsics, cfg.canonical_focal_length
        )
        return fuse_views(
            p["fusion"], feats, singlev_xfs, frame.extrinsics, frame.view_mask, cfg
        )

    def temporal_features(
        self, state: TemporalState, frame: FrameInputs, img_features: jnp.ndarray
    ) -> Tuple[TemporalState, jnp.ndarray]:
        cam0_ext = frame.extrinsics[:, 0]
        return temporal_step(
            self.params["temporal"],
            state,
            img_features,
            cam0_ext,
            frame.use_memory & frame.sample_mask,
            self.cfg,
        )

    def encode_skeleton(self, skeleton: SkeletonInputs, batch: int) -> jnp.ndarray:
        """Skeleton-encoder features broadcast to ``batch`` samples."""
        skel = skeleton_encoder_apply(
            self.params["skeleton_encoder"],
            skeleton.joint_rotation_axes,
            skeleton.joint_rest_positions,
            self.cfg,
        )
        if skel.shape[0] == 1 and batch > 1:
            skel = jnp.broadcast_to(skel, (batch,) + skel.shape[1:])
        return skel

    def regress_from_features(
        self,
        state: TemporalState,
        frame: FrameInputs,
        img_features: jnp.ndarray,
        skel_features: Optional[jnp.ndarray] = None,
    ) -> Tuple[TemporalState, RegressorOutput]:
        """Temporal fusion + regression head given precomputed trunk
        features -- the sequential tail of a step. Splitting here lets eval
        pipelines batch ``extract_features`` over whole frame chunks (the
        convs see batch F*B) and scan only this part over time."""
        state, tfeat = self.temporal_features(state, frame, img_features)
        if skel_features is not None:
            x = jnp.concatenate([tfeat, skel_features.astype(tfeat.dtype)], axis=-1)
            out = regress_poses(self.params["regressor_k"], x, self.cfg, False)
        else:
            out = regress_poses(self.params["regressor_u"], tfeat, self.cfg, True)
        wrist = _recover_wrist_in_world(
            frame.hand_idx, frame.extrinsics[:, 0], out.wrist_xfs
        )
        return state, out._replace(wrist_xfs=wrist)

    # -- branches ---------------------------------------------------------

    def regress_pose_use_skeleton(
        self,
        state: TemporalState,
        frame: FrameInputs,
        skeleton: SkeletonInputs,
    ) -> Tuple[TemporalState, RegressorOutput]:
        """Known-skeleton branch (reference umetrack_model.py:188-219)."""
        feats = self.extract_features(frame)
        skel = self.encode_skeleton(skeleton, feats.shape[0])
        return self.regress_from_features(state, frame, feats, skel)

    def regress_pose_pred_skel_scale(
        self, state: TemporalState, frame: FrameInputs
    ) -> Tuple[TemporalState, RegressorOutput]:
        """Unknown-skeleton branch; requires all-multiview samples
        (reference umetrack_model.py:221-242)."""
        feats = self.extract_features(frame)
        return self.regress_from_features(state, frame, feats, None)

    def init_state(self, batch: int) -> TemporalState:
        return init_temporal_state(batch, self.cfg)
