"""Batched rigid Procrustes alignment (SVD orthogonal fit).

Reproduces reference ``model_utils.procrustes_align`` (lib/models/
model_utils.py:17-54): center both point sets, SVD the cross-covariance,
fix reflections via det(V U^T), assemble the 4x4 rigid transform.

On TPU ``jnp.linalg.svd`` of (B, 3, 3) lowers to a small batched kernel;
this is numerically the sensitive step of the pipeline, so the matmuls run
at full f32 precision.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..geometry.affine import einsum, matmul


def procrustes_align(from_points: jnp.ndarray, to_points: jnp.ndarray) -> jnp.ndarray:
    """Best-fit rigid transform mapping from_points -> to_points.

    Args:
      from_points, to_points: (..., N, 3) corresponding point sets.
    Returns:
      (..., 4, 4) rigid transforms (rotation + translation, det(R) = +1).
    """
    from_mean = jnp.mean(from_points, axis=-2)
    to_mean = jnp.mean(to_points, axis=-2)
    fc = from_points - from_mean[..., None, :]
    tc = to_points - to_mean[..., None, :]

    # cross-covariance: from^T @ to  (..., 3, 3)
    cov = einsum("...ni,...nj->...ij", fc, tc)
    u, _, vt = jnp.linalg.svd(cov)
    v = jnp.swapaxes(vt, -1, -2)
    v_ut = matmul(v, jnp.swapaxes(u, -1, -2))
    det = jnp.linalg.det(v_ut)
    w = jnp.broadcast_to(jnp.eye(3, dtype=cov.dtype), v_ut.shape)
    w = w.at[..., 2, 2].multiply(det)
    rot = matmul(matmul(v, w), jnp.swapaxes(u, -1, -2))

    t = to_mean - einsum("...ij,...j->...i", rot, from_mean)
    out = jnp.zeros(from_points.shape[:-2] + (4, 4), from_points.dtype)
    out = out.at[..., :3, :3].set(rot)
    out = out.at[..., :3, 3].set(t)
    out = out.at[..., 3, 3].set(1.0)
    return out
