"""Image warp / resample ops: fisheye->pinhole crop extraction.

Replaces both hot resampling paths of the reference with one batched,
jittable op:
  * ``_warp_image`` -- per-crop dense cv2.remap through the full camera
    chain (lib/tracker/tracker.py:61-89);
  * ``_resample_images_batched`` -- NumPy bilinear warp through a single
    4x4 pixel-to-pixel homography (lib/batched_dataset/data_transform.py:78-144).

Design: coordinates are computed with vectorized camera math (VPU-friendly
elementwise chains); sampling picks a backend per device: the Pallas
banded one-hot-MXU kernel (ops/pallas_warp.py, >10x faster than XLA's
gather) on TPU, the XLA bilinear gather elsewhere (also the CPU path).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ..geometry import affine, camera as cam


def split_coord_planes(coords) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Accept (N, P, 2) interleaved coords OR an (x, y) tuple of planes.

    The hot producers emit separate planes (``_crop_source_coords_planar``);
    interleaved arrays remain accepted for external callers and tests.
    """
    if isinstance(coords, tuple):
        return coords
    return coords[..., 0], coords[..., 1]


def bilinear_sample(
    images: jnp.ndarray,  # (V, H, W)
    image_idx: jnp.ndarray,  # (N,) int -- which source image each slot reads
    coords,  # (N, P, 2) source pixel coords (x, y), or an (x, y) plane tuple
    src_valid_hw: Tuple[int, int] | None = None,
) -> jnp.ndarray:
    """Bilinear sampling with zero padding outside the source image.

    Matches cv2.remap(INTER_LINEAR, BORDER_CONSTANT 0) semantics used by the
    reference (tracker.py:87) up to border-pixel handling: coordinates with
    any neighbor outside the image return 0.
    ``src_valid_hw``: true source extent when ``images`` are pre-padded
    (identical results to sampling the unpadded source).
    Returns (N, P).
    """
    H, W = src_valid_hw or (images.shape[-2], images.shape[-1])
    x, y = split_coord_planes(coords)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    valid = (x >= 0) & (x0i + 1 <= W - 1) & (y >= 0) & (y0i + 1 <= H - 1)
    x0c = jnp.clip(x0i, 0, W - 2)
    y0c = jnp.clip(y0i, 0, H - 2)

    idx = image_idx[:, None]
    f00 = images[idx, y0c, x0c]
    f01 = images[idx, y0c, x0c + 1]
    f10 = images[idx, y0c + 1, x0c]
    f11 = images[idx, y0c + 1, x0c + 1]

    out = (
        f00 * (1 - wx) * (1 - wy)
        + f01 * wx * (1 - wy)
        + f10 * (1 - wx) * wy
        + f11 * wx * wy
    )
    return jnp.where(valid, out, 0.0)


def _dst_pixel_grid(size: Tuple[int, int], dtype=jnp.float32) -> jnp.ndarray:
    """(h*w, 2) grid of (x, y) pixel centers for the crop image."""
    w, h = size
    xs = jnp.arange(w, dtype=dtype)
    ys = jnp.arange(h, dtype=dtype)
    gx, gy = jnp.meshgrid(xs, ys)  # (h, w)
    return jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)


def _pick_sampler(method: str, n_pixels: int, n_slots: int, img_hw):
    """Resolve the sampling backend: the Pallas banded one-hot-MXU kernel
    (ops/pallas_warp.py) is ~an order of magnitude faster than XLA's
    gather on TPU; its per-grid-step VMEM footprint is independent of the
    slot count, so any N (incl. the batched multi-recording path) streams
    through it. Non-TPU backends use the XLA gather."""
    if method == "auto":
        import jax

        # respect an active jax.default_device(cpu) context (utils.runtime
        # .on_cpu): the computation runs on CPU there even when the default
        # BACKEND is a TPU, and the Pallas kernel only interprets on CPU
        dev = jax.config.jax_default_device
        platform = dev.platform if dev is not None else jax.default_backend()
        method = "mxu" if platform not in ("cpu",) else "gather"
    if method == "mxu":
        from .pallas_warp import bilinear_sample_mxu

        return bilinear_sample_mxu
    # the gather path needs no orientation routing; accept and ignore the
    # crop-shape hint so callers can pass it uniformly
    return lambda imgs, idx, coords, crop_hw=None, src_valid_hw=None: (
        bilinear_sample(imgs, idx, coords, src_valid_hw=src_valid_hw)
    )


def _crop_source_coords_planar(
    src_cameras: cam.Camera,  # batch (N,)
    crop_cameras: cam.Camera,  # batch (N,) pinhole
    crop_size: Tuple[int, int],
    src_kind: str,
    depth_check: bool,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Source-window coordinate PLANES (x, y), each (N, P = h*w).

    Same math as the interleaved chain (window_to_eye -> eye_to_world ->
    world_to_eye -> eye_to_window) but x/y/z stay separate planes end to
    end: no (N, P, 2|3) minor-dim stack ever materializes. The Pallas warp
    consumes a plane-major (N, 2, P) operand, and the stack/slice round
    trip through the interleaved layout cost ~1 ms of pure relayout per
    128-frame dispatch on TPU (round-4 profile; VERDICT round-4 item 2).

    Reference math being reproduced: lib/tracker/tracker.py:61-89 (the
    cv2.remap camera chain) and lib/common/camera.py:108-181 (Fisheye62).
    """
    w, h = crop_size
    dtype = jnp.float32
    gx = jnp.tile(jnp.arange(w, dtype=dtype), h)  # (P,) row-major x
    gy = jnp.repeat(jnp.arange(h, dtype=dtype), w)  # (P,) row-major y

    # window_to_eye through the pinhole crop camera: (g - c) / f, then
    # unproject = normalize([qx, qy, 1]) (crop cameras carry zero
    # distortion; the fixed-point undistort is exactly identity there)
    qx = (gx[None, :] - crop_cameras.cx[:, None]) / crop_cameras.fx[:, None]
    qy = (gy[None, :] - crop_cameras.cy[:, None]) / crop_cameras.fy[:, None]
    inv = 1.0 / jnp.sqrt(qx * qx + qy * qy + 1.0)
    vx, vy, vz = qx * inv, qy * inv, inv

    # eye_to_world (crop) then world_to_eye (source), composed planar:
    # R = R_src^T @ R_crop, t = R_src^T (t_crop - t_src); eye = R v + t
    tc = crop_cameras.T_world_from_eye
    ts = src_cameras.T_world_from_eye
    r = affine.einsum("...ji,...jk->...ik", ts[..., :3, :3], tc[..., :3, :3])
    t = affine.einsum(
        "...ji,...j->...i", ts[..., :3, :3], tc[..., :3, 3] - ts[..., :3, 3]
    )
    ex = (
        r[..., 0, 0, None] * vx + r[..., 0, 1, None] * vy
        + r[..., 0, 2, None] * vz + t[..., 0, None]
    )
    ey = (
        r[..., 1, 0, None] * vx + r[..., 1, 1, None] * vy
        + r[..., 1, 2, None] * vz + t[..., 1, None]
    )
    ez = (
        r[..., 2, 0, None] * vx + r[..., 2, 1, None] * vy
        + r[..., 2, 2, None] * vz + t[..., 2, None]
    )

    # eye_to_window through the source camera, planar
    if src_kind == cam.FISHEYE62:
        rr = jnp.sqrt(ex * ex + ey * ey)
        s = jnp.arctan2(rr, ez) / jnp.maximum(rr, 2.0**-128)
        px, py = ex * s, ey * s
    elif src_kind == cam.PINHOLE:
        px, py = ex / ez, ey / ez
    else:
        raise ValueError(f"unknown projection kind {src_kind!r}")
    k1, k2, k3, k4, p1, p2, k5, k6 = (
        src_cameras.coeffs[..., i, None] for i in range(8)
    )
    r2 = jnp.clip(px * px + py * py, -jnp.pi**2, jnp.pi**2)
    r4 = r2 * r2
    r6 = r2 * r4
    radial = 1 + k1 * r2 + k2 * r4 + k3 * r6 + k4 * (r4 * r4) \
        + k5 * (r4 * r6) + k6 * (r6 * r6)
    ux, uy = px * radial, py * radial
    x2, y2, xy = ux * ux, uy * uy, ux * uy
    rq = x2 + y2
    dx = ux + 2 * p2 * xy + p1 * (rq + 2 * x2)
    dy = uy + 2 * p1 * xy + p2 * (rq + 2 * y2)
    wx = dx * src_cameras.fx[:, None] + src_cameras.cx[:, None]
    wy = dy * src_cameras.fy[:, None] + src_cameras.cy[:, None]

    if depth_check:
        behind = ez < 0
        wx = jnp.where(behind, -1.0, wx)
        wy = jnp.where(behind, -1.0, wy)
    # materialize both planes from ONE multi-output fusion: without the
    # barrier XLA fuses the whole chain (rotation + arctan2 + distortion
    # polynomial) separately into every downstream consumer of x and of y,
    # recomputing it up to 4x (measured +1.7 ms per 128-frame dispatch)
    import jax

    wx, wy = jax.lax.optimization_barrier((wx, wy))
    return wx, wy


def warp_perspective_crop(
    src_images: jnp.ndarray,  # (V, H, W) raw camera views
    src_cameras: cam.Camera,  # batch shape (N,) -- per-slot source camera
    src_view_idx: jnp.ndarray,  # (N,) int view index per crop slot
    crop_cameras: cam.Camera,  # batch shape (N,) pinhole crop cameras
    crop_size: Tuple[int, int],
    src_kind: str = cam.FISHEYE62,
    depth_check: bool = True,
    method: str = "auto",
    src_valid_hw: Tuple[int, int] | None = None,
) -> jnp.ndarray:
    """Extract N pinhole crops from fisheye source views -> (N, h, w).

    ``src_valid_hw``: true (H, W) of the sensor when ``src_images`` arrive
    pre-padded to warp-window-aligned dims (kills the per-dispatch device
    pad; sampling semantics unchanged).

    Per destination pixel: unproject through the crop camera, to world, into
    the source camera's eye space, project + distort to source pixels, then
    bilinear-sample. Points behind the source camera (z < 0) are masked,
    matching reference ``_warp_image`` (tracker.py:61-89). The coordinate
    chain is computed as separate x/y PLANES (``_crop_source_coords_planar``)
    so the sampler's plane-major operand needs no layout change.

    ``method``: "gather" (XLA advanced indexing), "mxu" (Pallas one-hot
    matmul kernel), or "auto" (mxu on TPU when shapes allow).
    """
    w, h = crop_size
    n = src_view_idx.shape[0]
    wx, wy = _crop_source_coords_planar(
        src_cameras, crop_cameras, crop_size, src_kind, depth_check
    )
    sampler = _pick_sampler(
        method, h * w, n, (src_images.shape[-2], src_images.shape[-1])
    )
    out = sampler(
        src_images, src_view_idx, (wx, wy), crop_hw=(h, w),
        src_valid_hw=src_valid_hw,
    )
    return out.reshape(n, h, w)


def compute_resample_matrix(
    K_orig: jnp.ndarray,  # (..., 3, 3)
    T_world_to_eye_orig: jnp.ndarray,  # (..., 4, 4)
    K_new: jnp.ndarray,  # (..., 3, 3)
    T_eye_to_world_new: jnp.ndarray,  # (..., 4, 4)
) -> jnp.ndarray:
    """4x4 homography taking new-camera pixels to orig-camera pixels.

    K_orig . W2E_orig . E2W_new . K_new^-1 lifted to 4x4, valid when both
    cameras are pinhole (reference data_transform.py:57-75).
    """
    def lift(m3):
        out = jnp.zeros(m3.shape[:-2] + (4, 4), m3.dtype)
        out = out.at[..., :3, :3].set(m3)
        out = out.at[..., 3, 3].set(1.0)
        return out

    K_inv_new = jnp.linalg.inv(K_new)
    return affine.matmul(
        affine.matmul(lift(K_orig), T_world_to_eye_orig),
        affine.matmul(T_eye_to_world_new, lift(K_inv_new)),
    )


def warp_homography(
    src_images: jnp.ndarray,  # (N, H, W)
    resample_xfs: jnp.ndarray,  # (N, 4, 4) new-pixel -> orig-pixel
    out_size: Tuple[int, int],
    method: str = "auto",
) -> jnp.ndarray:
    """Pinhole->pinhole batched warp through pixel homographies -> (N, h, w).

    Matches reference ``_resample_images_batched``
    (data_transform.py:78-144) including its in-bounds criterion
    [0, W-1) x [0, H-1) with zeros elsewhere.
    """
    w, h = out_size
    n = src_images.shape[0]
    grid = _dst_pixel_grid(out_size)  # (P, 2)
    grid_h = jnp.concatenate([grid, jnp.ones_like(grid[..., :1])], axis=-1)
    r = resample_xfs[:, :3, :3]
    t = resample_xfs[:, :3, 3]
    src = affine.einsum("nij,pj->npi", r, grid_h) + t[:, None, :]
    src_xy = src[..., :2] / src[..., 2:3]
    sampler = _pick_sampler(
        method, h * w, n, (src_images.shape[-2], src_images.shape[-1])
    )
    out = sampler(src_images, jnp.arange(n), src_xy, crop_hw=(h, w))
    return out.reshape(n, h, w)
