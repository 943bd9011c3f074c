"""Multi-view feature fusion in a canonical camera space.

Reproduces reference ``FeatureExtractor`` fusion logic
(lib/models/feature_extractor.py:61-141) and
``create_multi_view_fusion_layers`` (model_utils.py:141-163):

  1. per-view "scaled->orig" intrinsic factor S with S[2,2] = f/200
     (model_utils.py:166-192);
  2. per-view transform into the canonical space (= cam0's *scaled* space
     when use_unscaled_as_canonical is False);
  3. FTL each view into canonical space, concatenate the two views along
     channels, run the 1x1 fusion conv stack (144 -> 108 -> 72 + final 1x1);
  4. FTL the fused maps from canonical space to cam0 space.

Single-view samples skip fusion: features = FTL(feat, S) (the reference's
``compute_singlev_features``, feature_extractor.py:89-94). Here both paths
are computed dense and selected by the per-sample view mask so shapes stay
static under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.affine import matmul, rigid_inverse
from .config import ModelConfig
from .ftl import apply_ftl
from .layers import conv2d, init_conv


def init_fusion(rng, cfg: ModelConfig) -> dict:
    c = cfg.n_image_feature_channels
    nc = np.linspace(c * cfg.num_views, c, cfg.n_multi_view_fusion_blocks + 1)
    keys = jax.random.split(rng, cfg.n_multi_view_fusion_blocks + 1)
    blocks = [
        init_conv(keys[i], 1, 1, int(nc[i]), int(nc[i + 1]))
        for i in range(cfg.n_multi_view_fusion_blocks)
    ]
    final = init_conv(keys[-1], 1, 1, c, c)
    return {"blocks": blocks, "final": final}


def fusion_convs(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    for p in params["blocks"]:
        x = jax.nn.relu(conv2d(p, x))
    return conv2d(params["final"], x)


def compute_singlev_xfs(
    intrinsics: jnp.ndarray,  # (..., 3, 3)
    canonical_focal_length: float = 200.0,
) -> jnp.ndarray:
    """(..., 4, 4) scale factor S: identity with S[2,2] = fx / canonical_f.

    Factorizes K = K_canonical * S so backbone features live in a
    focal-normalized space (reference model_utils.py:166-192; the scale is
    deliberately placed on z).
    """
    focal = intrinsics[..., 0, 0]
    s = jnp.broadcast_to(
        jnp.eye(4, dtype=intrinsics.dtype), intrinsics.shape[:-2] + (4, 4)
    )
    return s.at[..., 2, 2].set(focal / canonical_focal_length)


def _scale_inverse(s: jnp.ndarray) -> jnp.ndarray:
    """Inverse of the diag(1,1,f/200,1) factor -- just invert the z entry."""
    return s.at[..., 2, 2].set(1.0 / s[..., 2, 2])


def compute_multiv_xfs(
    singlev_xfs: jnp.ndarray,  # (B, V, 4, 4)
    extrinsics: jnp.ndarray,  # (B, V, 4, 4) world->eye (rigid, maybe mirrored)
    use_unscaled_as_canonical: bool = False,
):
    """Per-view scaled->canonical transforms + canonical->cam0 transform.

    Reference ``_compute_multiv_xfs`` (feature_extractor.py:61-87). The
    extrinsics inverse uses the rigid (orthonormal) closed form.
    """
    xf_0 = extrinsics[:, 0:1]
    xf_to_world = matmul(rigid_inverse(extrinsics), singlev_xfs)
    if use_unscaled_as_canonical:
        b = singlev_xfs.shape[0]
        canonical_to_cam0 = jnp.broadcast_to(
            jnp.eye(4, dtype=singlev_xfs.dtype), (b, 4, 4)
        )
        scaled_to_canonical = matmul(xf_0, xf_to_world)
    else:
        canonical_to_cam0 = singlev_xfs[:, 0]
        s0_inv = _scale_inverse(singlev_xfs[:, 0:1])
        scaled_to_canonical = matmul(s0_inv, matmul(xf_0, xf_to_world))
    return scaled_to_canonical, canonical_to_cam0


def fuse_views(
    params: dict,
    per_view_features: jnp.ndarray,  # (B, V, h, w, C)
    singlev_xfs: jnp.ndarray,  # (B, V, 4, 4)
    extrinsics: jnp.ndarray,  # (B, V, 4, 4)
    view_mask: jnp.ndarray,  # (B, V) bool -- slot 0 always valid for live hands
    cfg: ModelConfig,
) -> jnp.ndarray:
    """Fused cam0-space features (B, h, w, C), single/multi-view masked.

    Multi-view samples follow the canonical-space fusion path; samples with
    only view 0 valid use the single-view FTL path. Both are computed dense
    (the fusion stack is 1x1 convs on 6x6 maps -- negligible) and selected
    per sample, keeping shapes static under jit.
    """
    b, v, h, w, c = per_view_features.shape
    assert v == cfg.num_views == 2, "fusion assumes 2 view slots"

    # --- multi-view path
    scaled_to_canonical, canonical_to_cam0 = compute_multiv_xfs(
        singlev_xfs, extrinsics, cfg.use_unscaled_as_canonical
    )
    canon = apply_ftl(
        scaled_to_canonical.reshape(b * v, 4, 4),
        per_view_features.reshape(b * v, h, w, c),
        cfg.spatial_ftl_ratio,
    ).reshape(b, v, h, w, c)
    # zero padded/invalid views so fusion sees no garbage
    canon = jnp.where(view_mask[:, :, None, None, None], canon, 0.0)
    # flatten view dim into channels: [view0 | view1] matching torch
    # flatten(start_dim=1, end_dim=2) channel order (feature_extractor.py:130-133)
    stacked = jnp.concatenate([canon[:, i] for i in range(v)], axis=-1)
    fused = fusion_convs(params, stacked)
    multiv = apply_ftl(canonical_to_cam0, fused, cfg.spatial_ftl_ratio)

    # --- single-view path (view slot 0 only)
    singlev = apply_ftl(
        singlev_xfs[:, 0], per_view_features[:, 0], cfg.spatial_ftl_ratio
    )

    is_multi = view_mask[:, 1] & view_mask[:, 0]
    return jnp.where(is_multi[:, None, None, None], multiv, singlev)
