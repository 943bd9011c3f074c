"""Perspective crop-camera synthesis, batched and jittable.

Reproduces the reference's ``lib/common/crop.py`` (gen_intrinsics_from_
bounding_pts, gen_crop_parameters_from_points): given the original camera
pose and a cloud of world-space points that must land inside the crop,
construct a pinhole camera at the same position looking at the cloud center
with focal length chosen so every point projects inside the image.

TPU-first differences from the reference:
  * fully batched over (hand, view) slots -- one call synthesizes all crop
    cameras of a frame;
  * instead of raising ``ValueError`` for degenerate geometry
    (crop.py:25-26), returns a ``valid`` mask (jit cannot raise on traced
    values); downstream consumers mask invalid slots.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from . import affine


class CropCamera(NamedTuple):
    """A synthesized pinhole crop camera (batched pytree).

    T_world_to_eye : (B..., 4, 4) world->eye, including the mirror-x flip for
                     right hands (linear part is orthogonal, det = -1 there).
    fx_fy, cx_cy   : (B..., 2) intrinsics.
    valid          : (B...,) bool -- False where geometry was degenerate
                     (point behind camera or focal below minimum).
    """

    T_world_to_eye: jnp.ndarray
    fx_fy: jnp.ndarray
    cx_cy: jnp.ndarray
    valid: jnp.ndarray


def gen_intrinsics_from_bounding_pts(
    pts_eye: jnp.ndarray,
    image_w: int,
    image_h: int,
    min_focal: float = 5.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Focal/center such that all eye-space points project inside the image.

    Matches reference crop.py:15-28: cx_cy = (size-1)/2, f = cx_cy / max|ndc|
    (scalar max over points and both axes). Returns (fx_fy, cx_cy, valid).
    """
    dtype = pts_eye.dtype
    pts_ndc = pts_eye[..., 0:2] / pts_eye[..., 2:3]
    img_size = jnp.asarray([image_w, image_h], dtype=dtype)
    cx_cy = (img_size - 1.0) / 2.0
    max_ndc = jnp.max(jnp.abs(pts_ndc), axis=(-1, -2))
    fx_fy = cx_cy / max_ndc[..., None]
    valid = jnp.logical_not(
        jnp.any(pts_eye[..., 2] < 1e-4, axis=-1) | jnp.any(fx_fy < min_focal, axis=-1)
    )
    cx_cy = jnp.broadcast_to(cx_cy, fx_fy.shape)
    return fx_fy, cx_cy, valid


def gen_crop_camera(
    orig_T_world_to_eye: jnp.ndarray,
    pts_world: jnp.ndarray,
    image_size: Tuple[int, int],
    mirror_img_x: jnp.ndarray,
    camera_angle_deg: jnp.ndarray | float = 0.0,
    focal_multiplier: float = 0.95,
    min_focal: float = 5.0,
) -> CropCamera:
    """Synthesize a crop camera from bounding points (batched).

    Matches reference ``gen_crop_parameters_from_points`` (crop.py:31-83):
    center = (min+max)/2 of the cloud, look-at with the physical camera roll,
    optional mirror-x (right hands), bounding intrinsics, focal zoom-out.

    Args:
      orig_T_world_to_eye: (B..., 4, 4) original camera world->eye.
      pts_world: (B..., N, 3) points that must project inside the crop.
      image_size: static (W, H) of the crop.
      mirror_img_x: (B...,) bool.
      camera_angle_deg: scalar or (B...,).
      focal_multiplier: <1 zooms out, leaving margin at the crop boundary.
    """
    center = (jnp.min(pts_world, axis=-2) + jnp.max(pts_world, axis=-2)) / 2.0
    new_w2e = affine.make_look_at_matrix(orig_T_world_to_eye, center, camera_angle_deg)

    mirrored = affine.matmul(affine.mirror_x_matrix(new_w2e.dtype), new_w2e)
    new_w2e = jnp.where(mirror_img_x[..., None, None], mirrored, new_w2e)

    pts_eye = affine.transform_points(new_w2e, pts_world)
    fx_fy, cx_cy, valid = gen_intrinsics_from_bounding_pts(
        pts_eye, image_size[0], image_size[1], min_focal
    )
    return CropCamera(
        T_world_to_eye=new_w2e,
        fx_fy=focal_multiplier * fx_fy,
        cx_cy=cx_cy,
        valid=valid,
    )


def crop_camera_to_camera(crop: CropCamera, image_size: Tuple[int, int]):
    """View a CropCamera as a pinhole ``Camera`` pytree."""
    from .camera import Camera  # local import avoids cycle

    fx = crop.fx_fy[..., 0]
    return Camera(
        fx=fx,
        fy=crop.fx_fy[..., 1],
        cx=crop.cx_cy[..., 0],
        cy=crop.cx_cy[..., 1],
        coeffs=jnp.zeros(fx.shape + (8,), fx.dtype),
        T_world_from_eye=affine.rigid_inverse(crop.T_world_to_eye),
        width=jnp.full(fx.shape, float(image_size[0]), fx.dtype),
        height=jnp.full(fx.shape, float(image_size[1]), fx.dtype),
    )


def intrinsics_matrix_from_crop(crop: CropCamera) -> jnp.ndarray:
    """(B..., 3, 3) intrinsics matrix of crop cameras."""
    fx, fy = crop.fx_fy[..., 0], crop.fx_fy[..., 1]
    cx, cy = crop.cx_cy[..., 0], crop.cx_cy[..., 1]
    z = jnp.zeros_like(fx)
    o = jnp.ones_like(fx)
    return jnp.stack(
        [
            jnp.stack([fx, z, cx], axis=-1),
            jnp.stack([z, fy, cy], axis=-1),
            jnp.stack([z, z, o], axis=-1),
        ],
        axis=-2,
    )
