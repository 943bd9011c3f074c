"""Geometry core: affine transforms, camera models, crop-camera synthesis.

Everything here is pure JAX, batched-first and jittable. Cameras are
struct-of-array pytrees (`Camera`), not Python objects.
"""

from .affine import (
    make_look_at_matrix,
    normalize,
    rigid_inverse,
    rotation_about_z,
    rotation_from_two_vectors,
    rotate_points,
    transform_points,
)
from .camera import (
    Camera,
    FISHEYE62,
    PINHOLE,
    camera_from_json,
    eye_to_window,
    eye_to_world,
    intrinsics_matrix,
    window_to_eye,
    world_to_eye,
    world_to_window,
)
from .crop import CropCamera, gen_crop_camera, crop_camera_to_camera

__all__ = [
    "Camera",
    "CropCamera",
    "FISHEYE62",
    "PINHOLE",
    "camera_from_json",
    "crop_camera_to_camera",
    "eye_to_window",
    "eye_to_world",
    "gen_crop_camera",
    "intrinsics_matrix",
    "make_look_at_matrix",
    "normalize",
    "rigid_inverse",
    "rotation_about_z",
    "rotation_from_two_vectors",
    "rotate_points",
    "transform_points",
    "window_to_eye",
    "world_to_eye",
    "world_to_window",
]
