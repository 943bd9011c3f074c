"""Feature Transform Layer (FTL): rigid transforms on feature maps.

The FTL treats the channel dimension as 3D coordinates: with C channels and
ratio r, the first round(C*r) channels split into three equal groups that
act as the X/Y/Z coordinates of C'/3 * H * W feature "points"; the affine
transform R x + t applies to those points and the rest of the channels pass
through. This matches reference ``apply_ftl_to_feature_maps``
(lib/models/model_utils.py:57-104) *in NCHW element order*: feature point
``k`` of axis ``a`` is channel ``a*C'/3 + k//(H*W)`` at spatial position
``k % (H*W)``.

Our activations are NHWC; the implementation transposes to channel-major
for the reshape so converted torch weights compose identically, and lets
XLA fuse the transposes into the surrounding 1x1 convs. The transform
itself is a tiny (3 x 3) x (3 x C'/3*H*W) matmul -- ideal MXU food once
batched over (hands x views).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..geometry.affine import einsum


def apply_ftl(
    xfs: jnp.ndarray,  # (N, 4, 4)
    feature_maps: jnp.ndarray,  # (N, H, W, C)
    ftl_ratio: float = 1.0,
) -> jnp.ndarray:
    """Transform feature maps as 3D point sets (NHWC in/out)."""
    assert 0.0 <= ftl_ratio <= 1.0
    if ftl_ratio == 0.0:
        return feature_maps

    n, h, w, c = feature_maps.shape
    nc_ftl = int(round(c * ftl_ratio))
    assert nc_ftl % 3 == 0, (c, ftl_ratio)

    x = jnp.moveaxis(feature_maps[..., :nc_ftl], -1, 1)  # (N, C', H, W)
    pts = x.reshape(n, 3, (nc_ftl // 3) * h * w)
    # serving mode: transforms follow the (bf16) feature dtype so the FTL
    # matmul stays on the fast MXU path instead of promoting to f32
    r = xfs[:, :3, :3].astype(feature_maps.dtype)
    t = xfs[:, :3, 3].astype(feature_maps.dtype)
    pts = einsum("nij,njk->nik", r, pts) + t[..., None]
    x = jnp.moveaxis(pts.reshape(n, nc_ftl, h, w), 1, -1)

    if nc_ftl != c:
        return jnp.concatenate([x, feature_maps[..., nc_ftl:]], axis=-1)
    return x
