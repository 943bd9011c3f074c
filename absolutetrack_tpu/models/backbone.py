"""Per-view CNN backbone: stem + resnet_layers_2352 + 1x1 projection.

Architecture reproduces reference ``create_backbone`` + ``ResNetBase``
(lib/models/model_utils.py:107-138, lib/models/backbone_resnet.py:75-192)
for arch string "resnet_layers_2352-f32":

  stem : conv 1->32 3x3 + BN + ReLU + maxpool2        -> 48x48
  stage1: 2 BasicBlocks, 32->32, stride 1             -> 48x48
  stage2: 3 BasicBlocks, 32->64, stride 2             -> 24x24
  stage3: 5 BasicBlocks, 64->128, stride 2            -> 12x12
  stage4: 2 BasicBlocks, 128->256, stride 2           -> 6x6
  proj  : conv 1x1 256->72 (no ReLU -- keeps signed features)

Input is (N, 96, 96, 1) NHWC normalized mono; output (N, 6, 6, 72) "3D
point feature" maps consumed by the FTL.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .config import ModelConfig
from .layers import basic_block, conv2d, init_basic_block, init_conv, max_pool_2x2


def _stage_strides(n_stages: int):
    return [1] + [2] * (n_stages - 1)


def init_backbone(rng, cfg: ModelConfig) -> dict:
    blocks, f = cfg.resnet_blocks  # e.g. (2,3,5,2), 32
    in_planes = [f, f, f * 2, f * 4]
    out_planes = [f, f * 2, f * 4, f * 8]
    strides = _stage_strides(len(blocks))

    keys = jax.random.split(rng, 2 + len(blocks))
    params = {"stem": init_conv(keys[0], 3, 3, 1, f)}
    for si, (n, cin, cout, s) in enumerate(zip(blocks, in_planes, out_planes, strides)):
        bkeys = jax.random.split(keys[1 + si], n)
        stage = [init_basic_block(bkeys[0], cin, cout, s)]
        for bi in range(1, n):
            stage.append(init_basic_block(bkeys[bi], cout, cout, 1))
        params[f"stage{si}"] = stage
    params["proj"] = init_conv(keys[-1], 1, 1, out_planes[-1], cfg.n_image_feature_channels)
    return params


def backbone_apply(params: dict, images: jnp.ndarray, cfg: ModelConfig) -> jnp.ndarray:
    """(N, H, W, 1) -> (N, H/16, W/16, n_image_feature_channels)."""
    blocks, _ = cfg.resnet_blocks
    strides = _stage_strides(len(blocks))
    x = jax.nn.relu(conv2d(params["stem"], images))
    x = max_pool_2x2(x)
    for si, (n, s) in enumerate(zip(blocks, strides)):
        stage = params[f"stage{si}"]
        x = basic_block(stage[0], x, stride=s)
        for bi in range(1, n):
            x = basic_block(stage[bi], x)
    return conv2d(params["proj"], x)
