"""Batched 3D affine transforms in pure JAX.

Reproduces the math of the reference's ``lib/common/affine.py`` (transform3,
transform_vec3, normalized, from_two_vectors, make_look_at_matrix) with
batched, jit-friendly implementations. All functions broadcast over arbitrary
leading batch dimensions.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
from jax import lax

_NORM_EPS = 5.43e-20  # matches reference lib/common/affine.py:22

# Geometry matrices are tiny (3x3 / 4x4); always run them at full f32
# precision on the MXU -- the perf cost is nil and the accuracy budget for
# landmark parity is 0.5 mm.
einsum = functools.partial(jnp.einsum, precision=lax.Precision.HIGHEST)


def matmul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Full-precision matmul for small geometry matrices."""
    return jnp.matmul(a, b, precision=lax.Precision.HIGHEST)


def transform_points(m: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Apply a 4x4 (or 3x4) affine transform to 3D points.

    Args:
      m: (..., 4, 4) transform.
      v: (..., N, 3) or (..., 3) points; batch dims broadcast against ``m``.

    Reference behavior: ``affine.transform3`` (lib/common/affine.py:11-12).
    """
    return rotate_points(m, v) + m[..., :3, 3] if v.ndim == m.ndim - 1 else (
        rotate_points(m, v) + m[..., None, :3, 3]
    )


def rotate_points(m: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Apply only the rotation/linear part of a 4x4 transform to 3D vectors.

    Reference behavior: ``affine.transform_vec3`` (lib/common/affine.py:15-19).
    """
    return einsum("...ij,...j->...i", m[..., :3, :3], v) if v.ndim == m.ndim - 1 else (
        einsum("...ij,...nj->...ni", m[..., :3, :3], v)
    )


def normalize(v: jnp.ndarray, axis: int = -1, eps: float = _NORM_EPS) -> jnp.ndarray:
    """Safe vector normalization (reference lib/common/affine.py:22-24)."""
    d = jnp.maximum(eps, jnp.sqrt(jnp.sum(v * v, axis=axis, keepdims=True)))
    return v / d


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """Cross-product (skew-symmetric) matrix of (..., 3) vectors -> (..., 3, 3)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def rotation_from_two_vectors(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix taking direction ``a`` to direction ``b`` (batched).

    Rodrigues construction ``I + [v]x + [v]x^2 (1-c)/max(s^2, 1e-15)`` exactly
    as the reference (lib/common/affine.py:34-44).
    """
    a = normalize(a)
    b = normalize(b)
    v = jnp.cross(a, b)
    s2 = jnp.sum(v * v, axis=-1)
    c = jnp.sum(a * b, axis=-1)
    vmat = skew(v)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=a.dtype), vmat.shape)
    factor = (1.0 - c) / jnp.maximum(s2, 1e-15)
    return eye + vmat + matmul(vmat, vmat) * factor[..., None, None]


def rotation_about_z(angle_deg: jnp.ndarray) -> jnp.ndarray:
    """Rotation about the z axis by ``angle_deg`` degrees -> (..., 3, 3)."""
    rad = jnp.deg2rad(angle_deg)
    c, s = jnp.cos(rad), jnp.sin(rad)
    zero = jnp.zeros_like(c)
    one = jnp.ones_like(c)
    return jnp.stack(
        [
            jnp.stack([c, -s, zero], axis=-1),
            jnp.stack([s, c, zero], axis=-1),
            jnp.stack([zero, zero, one], axis=-1),
        ],
        axis=-2,
    )


def rigid_inverse(m: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a transform with orthonormal linear part (incl. mirrors).

    inv([R t; 0 1]) = [R^T -R^T t; 0 1]. Valid for any orthogonal R
    (rotations and reflections), which covers every transform in the pipeline
    including mirrored crop cameras.
    """
    r_t = jnp.swapaxes(m[..., :3, :3], -1, -2)
    t = -einsum("...ij,...j->...i", r_t, m[..., :3, 3])
    out = jnp.zeros_like(m)
    out = out.at[..., :3, :3].set(r_t)
    out = out.at[..., :3, 3].set(t)
    out = out.at[..., 3, 3].set(1.0)
    return out


def make_look_at_matrix(
    orig_world_to_eye: jnp.ndarray,
    center: jnp.ndarray,
    camera_angle_deg: jnp.ndarray | float = 0.0,
) -> jnp.ndarray:
    """New world-to-eye transform whose optical axis passes through ``center``.

    Keeps the camera position, rotates the z axis toward the object center,
    then rolls about z by the physical camera mounting angle so the object
    appears upright. Matches reference ``affine.make_look_at_matrix``
    (lib/common/affine.py:47-76).

    Args:
      orig_world_to_eye: (..., 4, 4).
      center: (..., 3) world-space point to look at.
      camera_angle_deg: scalar or (...,) roll angle in degrees.
    """
    center_local = transform_points(orig_world_to_eye, center)
    z_dir_local = center_local / jnp.linalg.norm(center_local, axis=-1, keepdims=True)
    e_z = jnp.zeros_like(z_dir_local).at[..., 2].set(1.0)
    delta_r_local = rotation_from_two_vectors(e_z, z_dir_local)

    orig_eye_to_world = rigid_inverse(orig_world_to_eye)
    angle = jnp.asarray(camera_angle_deg, dtype=center_local.dtype)
    z_roll = rotation_about_z(jnp.broadcast_to(angle, center_local.shape[:-1]))

    new_rot = matmul(matmul(orig_eye_to_world[..., :3, :3], delta_r_local), z_roll)
    new_eye_to_world = orig_eye_to_world.at[..., :3, :3].set(new_rot)
    return rigid_inverse(new_eye_to_world)


def mirror_x_matrix(dtype=jnp.float32) -> jnp.ndarray:
    """4x4 mirror about the x axis (used for right-hand crop cameras)."""
    return jnp.diag(jnp.asarray([-1.0, 1.0, 1.0, 1.0], dtype=dtype))
