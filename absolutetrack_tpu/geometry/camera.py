"""Batched camera models in pure JAX.

Reproduces the projection/distortion math of the reference's
``lib/common/camera.py`` (PerspectiveProjection, ArctanProjection,
Fisheye62 distortion with 6 radial + 2 tangential coefficients, fixed-point
radial undistortion) as a struct-of-arrays pytree. One ``Camera`` value can
hold any batch shape of cameras; all point ops are vectorized and jittable.

Conventions (mirroring the reference's; lib/common/camera.py:184-200):
  v : 3D position in eye space
  p : projected 2D coords, ``p = project(v)``
  q : distorted 2D coords, ``q = distort(p)``
  w : window (pixel) coords, ``w = q * f + c``

Points are shaped ``cam_batch + (N, 2|3)`` where ``cam_batch`` is the
camera's batch shape (possibly ()).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from . import affine

PINHOLE = "pinhole"
FISHEYE62 = "fisheye62"

_UNDISTORT_ITERS = 5  # reference uses 5 fixed iterations (camera.py:169)


class Camera(NamedTuple):
    """Struct-of-arrays camera (a JAX pytree).

    Fields broadcast over an arbitrary shared batch shape ``B...``:
      fx, fy, cx, cy : (B...,)
      coeffs         : (B..., 8) distortion [k1 k2 k3 k4 p1 p2 k5 k6]; zeros
                       for pinhole cameras.
      T_world_from_eye : (B..., 4, 4) camera-to-world rigid transform
                       (the reference's ``camera_to_world_xf``).
      width, height  : (B...,) sensor size in pixels (float; static per model).

    The projection *kind* (pinhole vs fisheye62) is NOT part of the pytree;
    it is a static argument to the functions below, because source cameras
    are uniformly fisheye and crop cameras uniformly pinhole in this system.
    """

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    coeffs: jnp.ndarray
    T_world_from_eye: jnp.ndarray
    width: jnp.ndarray
    height: jnp.ndarray

    @property
    def batch_shape(self):
        return self.fx.shape


def pinhole_camera(fx, fy, cx, cy, T_world_from_eye, width, height) -> Camera:
    fx = jnp.asarray(fx, jnp.float32)
    return Camera(
        fx=fx,
        fy=jnp.asarray(fy, jnp.float32),
        cx=jnp.asarray(cx, jnp.float32),
        cy=jnp.asarray(cy, jnp.float32),
        coeffs=jnp.zeros(fx.shape + (8,), jnp.float32),
        T_world_from_eye=jnp.asarray(T_world_from_eye, jnp.float32),
        width=jnp.asarray(width, jnp.float32),
        height=jnp.asarray(height, jnp.float32),
    )


def camera_from_json(js: dict, T_world_from_eye: np.ndarray | None = None):
    """Parse one camera dict in the reference's JSON schema.

    Returns ``(Camera, kind)`` where kind is PINHOLE or FISHEYE62.
    Schema per reference ``read_camera_from_json`` (lib/common/camera.py:423-444):
    keys ImageSizeX/Y, fx, fy, cx, cy, DistortionModel, k1..k6, p1, p2.
    """
    js = js.get("Camera", js)
    model = js["DistortionModel"]
    if model == "PinholePlane":
        kind = PINHOLE
        coeffs = np.zeros(8, np.float32)
    elif model == "FishEye62":
        kind = FISHEYE62
        coeffs = np.array(
            [js[k] for k in ("k1", "k2", "k3", "k4", "p1", "p2", "k5", "k6")],
            np.float32,
        )
    else:
        raise ValueError(f"Unknown DistortionModel {model!r}")
    if T_world_from_eye is None:
        T_world_from_eye = np.eye(4, dtype=np.float32)
    cam = Camera(
        fx=jnp.float32(js["fx"]),
        fy=jnp.float32(js["fy"]),
        cx=jnp.float32(js["cx"]),
        cy=jnp.float32(js["cy"]),
        coeffs=jnp.asarray(coeffs),
        T_world_from_eye=jnp.asarray(T_world_from_eye, jnp.float32),
        width=jnp.float32(js["ImageSizeX"]),
        height=jnp.float32(js["ImageSizeY"]),
    )
    return cam, kind


def stack_cameras(cams: list[Camera]) -> Camera:
    """Stack a list of same-kind cameras into one batched Camera."""
    return Camera(*[jnp.stack(x) for x in zip(*cams)])


# --------------------------------------------------------------------------
# Projections (static dispatch on `kind`)
# --------------------------------------------------------------------------


def project(v: jnp.ndarray, kind: str, eps: float = 2.0**-128) -> jnp.ndarray:
    """Eye-space 3D -> normalized 2D image coords."""
    if kind == PINHOLE:
        # perspective: [x/z, y/z] (reference camera.py:61-66)
        return v[..., :2] / v[..., 2:3]
    elif kind == FISHEYE62:
        # equidistant fisheye: uv = xy * atan2(r, z) / r (reference camera.py:78-85)
        x, y, z = v[..., 0], v[..., 1], v[..., 2]
        r = jnp.sqrt(x * x + y * y)
        s = jnp.arctan2(r, z) / jnp.maximum(r, eps)
        return jnp.stack([x * s, y * s], axis=-1)
    raise ValueError(f"unknown projection kind {kind!r}")


def unproject(p: jnp.ndarray, kind: str) -> jnp.ndarray:
    """Normalized 2D -> unit-length eye-space 3D direction."""
    if kind == PINHOLE:
        v = jnp.concatenate([p, jnp.ones_like(p[..., :1])], axis=-1)
        return affine.normalize(v)
    elif kind == FISHEYE62:
        # inverse equidistant: [u sinc(r), v sinc(r), cos(r)]
        # (reference camera.py:87-94; np.sinc(r/pi) == sin(r)/r)
        u, vv = p[..., 0], p[..., 1]
        r = jnp.sqrt(u * u + vv * vv)
        c = jnp.cos(r)
        s = jnp.sinc(r / jnp.pi)
        return jnp.stack([u * s, vv * s, c], axis=-1)
    raise ValueError(f"unknown projection kind {kind!r}")


def distort(coeffs: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Fisheye62 forward distortion: 6 radial + 2 tangential terms.

    Matches reference ``Fisheye62CameraModel.evaluate`` (camera.py:122-143):
    r2 is clipped to [-pi^2, pi^2] before the radial polynomial; the
    tangential terms use the *radially distorted* uv.
    For zero coeffs this is the identity (pinhole NoDistortion).
    """
    k1, k2, k3, k4, p1, p2, k5, k6 = jnp.moveaxis(coeffs, -1, 0)
    r2 = jnp.clip(jnp.sum(p * p, axis=-1), -jnp.pi**2, jnp.pi**2)
    r4 = r2 * r2
    r6 = r2 * r4
    r8 = r4 * r4
    r10 = r4 * r6
    r12 = r6 * r6
    radial = 1 + k1 * r2 + k2 * r4 + k3 * r6 + k4 * r8 + k5 * r10 + k6 * r12
    uv = p * radial[..., None]
    x, y = uv[..., 0], uv[..., 1]
    x2, y2, xy = x * x, y * y, x * y
    rr = x2 + y2
    x_out = x + 2 * p2 * xy + p1 * (rr + 2 * x2)
    y_out = y + 2 * p1 * xy + p2 * (rr + 2 * y2)
    return jnp.stack([x_out, y_out], axis=-1)


def undistort(coeffs: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Iterative radial-only undistortion (5 fixed-point iterations).

    Reproduces the fork's added ``Fisheye62CameraModel.undistort``
    (camera.py:146-181): tangential terms are ignored; each iteration divides
    the distorted point by the radial factor at the current estimate. Already
    jit-friendly (fixed trip count).
    """
    k1, k2, k3, k4, _p1, _p2, k5, k6 = jnp.moveaxis(coeffs, -1, 0)
    x_d, y_d = q[..., 0], q[..., 1]
    x_u, y_u = x_d, y_d
    for _ in range(_UNDISTORT_ITERS):
        r2 = x_u * x_u + y_u * y_u
        radial = (
            1
            + k1 * r2
            + k2 * r2**2
            + k3 * r2**3
            + k4 * r2**4
            + k5 * r2**5
            + k6 * r2**6
        )
        x_u = x_d / radial
        y_u = y_d / radial
    return jnp.stack([x_u, y_u], axis=-1)


# --------------------------------------------------------------------------
# Full camera chains
# --------------------------------------------------------------------------


def _bc(field: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Broadcast a (B...,) camera scalar against point batches.

    Points carry one trailing N axis beyond the camera batch; appending a
    single dim aligns the camera batch one axis left of N, and any extra
    *leading* point dims (e.g. hands x cameras visibility grids) broadcast
    numpy-style.
    """
    del pts
    return field[..., None]


def world_to_eye(cam: Camera, v: jnp.ndarray) -> jnp.ndarray:
    """World points -> eye space: R^T (v - t). (reference camera.py:296-300)."""
    t = cam.T_world_from_eye[..., :3, 3]
    if v.ndim == cam.T_world_from_eye.ndim - 1:
        d = v - t
        return affine.einsum("...ji,...j->...i", cam.T_world_from_eye[..., :3, :3], d)
    d = v - t[..., None, :]
    return affine.einsum("...ji,...nj->...ni", cam.T_world_from_eye[..., :3, :3], d)


def eye_to_world(cam: Camera, v: jnp.ndarray) -> jnp.ndarray:
    """Eye points -> world (reference camera.py:302-306)."""
    return affine.transform_points(cam.T_world_from_eye, v)


def eye_to_window(cam: Camera, v: jnp.ndarray, kind: str) -> jnp.ndarray:
    """Eye 3D -> window (pixel) coords: distort(project(v)) * f + c."""
    q = distort(_bc2(cam.coeffs, v), project(v, kind))
    f = jnp.stack([_bc(cam.fx, q[..., 0]), _bc(cam.fy, q[..., 0])], axis=-1)
    c = jnp.stack([_bc(cam.cx, q[..., 0]), _bc(cam.cy, q[..., 0])], axis=-1)
    return q * f + c


def window_to_eye(cam: Camera, w: jnp.ndarray, kind: str) -> jnp.ndarray:
    """Window coords -> unit-length eye ray: unproject(undistort((w-c)/f))."""
    f = jnp.stack([_bc(cam.fx, w[..., 0]), _bc(cam.fy, w[..., 0])], axis=-1)
    c = jnp.stack([_bc(cam.cx, w[..., 0]), _bc(cam.cy, w[..., 0])], axis=-1)
    q = (w - c) / f
    p = undistort(_bc2(cam.coeffs, w), q)
    return unproject(p, kind)


def _bc2(coeffs: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Broadcast (B..., 8) coeffs against (B..., N, D) point batches
    (same one-extra-axis rule as ``_bc``)."""
    del pts
    return coeffs[..., None, :]


def world_to_window(cam: Camera, v: jnp.ndarray, kind: str) -> jnp.ndarray:
    return eye_to_window(cam, world_to_eye(cam, v), kind)


def crop(
    cam: Camera,
    src_x,
    src_y,
    target_width,
    target_height,
    scale: float = 1.0,
    T_world_from_eye: jnp.ndarray | None = None,
) -> Camera:
    """Intrinsics for a sub-window (and optional rescale) of the sensor.

    Matches reference ``CameraModel.crop`` (camera.py:331-361):
    f' = f * scale, c' = (c - (x, y) + 0.5) * scale - 0.5. Distortion
    coefficients are unchanged (they act on normalized coords).
    """
    sx = jnp.asarray(src_x, cam.cx.dtype)
    sy = jnp.asarray(src_y, cam.cy.dtype)
    return cam._replace(
        fx=cam.fx * scale,
        fy=cam.fy * scale,
        cx=(cam.cx - sx + 0.5) * scale - 0.5,
        cy=(cam.cy - sy + 0.5) * scale - 0.5,
        width=jnp.broadcast_to(
            jnp.asarray(float(target_width), cam.width.dtype), cam.width.shape
        ),
        height=jnp.broadcast_to(
            jnp.asarray(float(target_height), cam.height.dtype), cam.height.shape
        ),
        T_world_from_eye=cam.T_world_from_eye
        if T_world_from_eye is None
        else T_world_from_eye,
    )


def intrinsics_matrix(cam: Camera) -> jnp.ndarray:
    """(B..., 3, 3) pinhole intrinsics [[fx 0 cx][0 fy cy][0 0 1]].

    Reference: ``PinholePlaneCameraModel.uv_to_window_matrix``
    (camera.py:371-379).
    """
    z = jnp.zeros_like(cam.fx)
    o = jnp.ones_like(cam.fx)
    row0 = jnp.stack([cam.fx, z, cam.cx], axis=-1)
    row1 = jnp.stack([z, cam.fy, cam.cy], axis=-1)
    row2 = jnp.stack([z, z, o], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)
