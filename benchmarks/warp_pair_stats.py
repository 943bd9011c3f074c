"""Measure pass-A window-fit statistics for TILE PAIRS on real poses.

Round-2 profiling showed the fused warp kernel is bound by per-tile fixed
costs (DMA issue + loop step), not MACs. Processing TWO tiles per fetched
window halves the steps — if the union of the pair's footprints still fits
a small window. This script measures, over real sample_data crop cameras:

  * per-tile (16, 32)/(32, 16) blocked footprints (the current pass A);
  * per-PAIR unions for two pairing orders: consecutive-in-enumeration
    (horizontal neighbors, row-major blocks) and vertical neighbors
    (paired block order (by//2, bx, by%2));
  * fit rates at candidate windows.

Run: PYTHONPATH=/root/repo python benchmarks/warp_pair_stats.py
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from absolutetrack_tpu.geometry import camera as cam, crop as crop_mod
from absolutetrack_tpu.ops.pallas_warp import _blocked_perm, _tile_extents
from absolutetrack_tpu.ops.resample import _dst_pixel_grid
from absolutetrack_tpu.tracker.crop_gen import gen_crop_slots
from absolutetrack_tpu.tracker.video_data import load_labels

CROP = 96
TILE = 512
H, W = 480, 636


def slot_coords(labels, t):
    slots = gen_crop_slots(
        labels.cameras_at(t),
        jnp.asarray(labels.camera_angles),
        labels.hand_model,
        jnp.asarray(labels.joint_angles[t]),
        jnp.asarray(labels.wrist_transforms[t]),
        jnp.asarray(labels.hand_confidences[t]),
        (CROP, CROP),
        focal_multiplier=0.8,
    )
    flat_idx = jnp.asarray(np.asarray(slots.view_idx).reshape(-1))
    crop_cams_flat = jax.tree.map(
        lambda x: x.reshape((4,) + x.shape[2:]), slots.cameras
    )
    crop_cam = crop_mod.crop_camera_to_camera(crop_cams_flat, (CROP, CROP))
    cams_t = labels.cameras_at(t)
    src_cams = jax.tree.map(lambda x: x[flat_idx], cams_t)
    grid = _dst_pixel_grid((CROP, CROP))
    grid = jnp.broadcast_to(grid, (4,) + grid.shape)
    dst_eye = cam.window_to_eye(crop_cam, grid, cam.PINHOLE)
    world = cam.eye_to_world(crop_cam, dst_eye)
    src_eye = cam.world_to_eye(src_cams, world)
    src_win = cam.eye_to_window(src_cams, src_eye, labels.camera_kind)
    src_win = jnp.where(src_eye[..., 2:3] < 0, -1.0, src_win)
    vv = np.asarray(slots.view_valid).reshape(-1)
    return np.asarray(src_win)[vv]  # (n_valid, P, 2)


def pair_extents(ylo, yhi, xlo, xhi, order):
    """Union extents of tile pairs under a tile permutation ``order``."""
    ylo, yhi, xlo, xhi = (a[:, order] for a in (ylo, yhi, xlo, xhi))
    e = lambda a, red: red(a.reshape(a.shape[0], -1, 2), axis=-1)
    return (
        e(ylo, np.minimum.reduce if False else np.min),
        e(yhi, np.max),
        e(xlo, np.min),
        e(xhi, np.max),
    )


def fit_rate(ylo, yhi, xlo, xhi, wr, wc, hp=512, wp=640, ralign=64, calign=128):
    """Fraction of (pair) tiles whose footprint fits an aligned (wr, wc)
    window (same placement rule as the kernel: largest aligned start
    below lo, clipped)."""
    k = np.clip(ylo // ralign, 0, (hp - wr) // ralign)
    fit_r = (yhi <= k * ralign + wr - 1) | (yhi < ylo)
    kc = np.clip(xlo // calign, 0, (wp - wc) // calign)
    fit_c = (xhi <= kc * calign + wc - 1) | (xhi < xlo)
    return (fit_r & fit_c).mean(), (fit_r & fit_c)


def window_sweep(tag, ylo, yhi, xlo, xhi):
    """Fit rates over a (rows@align x cols@align) candidate grid; prints
    MACs/px relative to the current (128, 256) pass-A window."""
    rows = ((128, 64), (96, 32), (64, 32), (192, 64))
    cols = ((256, 128), (192, 64), (128, 64), (128, 128))
    for wr, ra in rows:
        for wc, ca in cols:
            r, _ = fit_rate(ylo, yhi, xlo, xhi, wr, wc, ralign=ra, calign=ca)
            rel = wr * wc / (128 * 256)
            print(
                f"{tag} win ({wr:3d}@{ra:2d}, {wc:3d}@{ca:3d}):"
                f" fit {100 * r:6.2f}%  MACs x{rel:.2f}"
            )


def main():
    labels_files = [
        "/root/reference/sample_data/user05/recording_00.json",
        "/root/reference/sample_data/user05/recording_02.json",
        "/root/reference/sample_data/user05/recording_11.json",
    ]
    all_xy = []
    for lf in labels_files:
        labels = load_labels(lf)
        for t in range(0, len(labels), 10):
            if (labels.hand_confidences[t] <= 0).all():
                continue
            all_xy.append(slot_coords(labels, t))
    xy = np.concatenate(all_xy)  # (N, P, 2)
    n, p, _ = xy.shape
    print(f"{n} valid slots x {p} px from {len(all_xy)} frames")

    x = jnp.asarray(xy[..., 0])
    y = jnp.asarray(xy[..., 1])
    hc = wc = CROP
    t = p // TILE

    # replicate the kernel's per-slot orientation routing (pallas_warp
    # _plan_blocked): pick the blocked orientation with more fitting tiles
    results = {}
    for (bh, bw) in ((16, 32), (32, 16)):
        xs = np.asarray(_blocked_perm(x, n, hc, wc, bh, bw))
        ys = np.asarray(_blocked_perm(y, n, hc, wc, bh, bw))
        valid, ylo, yhi, xlo, xhi = (
            np.asarray(a) for a in _tile_extents(
                jnp.asarray(xs), jnp.asarray(ys), H, W, n, t
            )
        )
        results[(bh, bw)] = (ylo, yhi, xlo, xhi)
    # routing score at the pass-A (128, 256) window
    fits = {}
    for k, (ylo, yhi, xlo, xhi) in results.items():
        _, f = fit_rate(ylo, yhi, xlo, xhi, 128, 256)
        fits[k] = f.sum(axis=-1)
    pick2 = fits[(32, 16)] > fits[(16, 32)]
    mix = lambda a1, a2: np.where(pick2[:, None], a2, a1)
    ylo, yhi, xlo, xhi = (
        mix(a1, a2) for a1, a2 in zip(results[(16, 32)], results[(32, 16)])
    )
    r, _ = fit_rate(ylo, yhi, xlo, xhi, 128, 256)
    print(f"single tiles, (128,256) window: fit {100 * r:.2f}%  (pass A today)")

    # pairing orders on the ROUTED orientation. Consecutive pairing uses
    # tiles (2i, 2i+1) in enumeration order; vertical pairing reorders
    # blocks as (by//2, bx, by%2) so pairs are vertically adjacent.
    n_by, n_bx = hc // 16, wc // 32  # (16,32): 6x3 grid of blocks
    order_consec = np.arange(t)
    by, bx = np.divmod(np.arange(t), n_bx)
    order_vert = np.lexsort((by % 2, bx, by // 2))
    # NOTE: for the (32,16) orientation the grid is 3x6; same formulas with
    # its own shape. For stats, approximate both with the routed extents
    # and the two generic orders (exact per-orientation order matters only
    # if we implement it; consec is order-agnostic).
    for name, order in (("consecutive", order_consec), ("vertical", order_vert)):
        pylo, pyhi, pxlo, pxhi = pair_extents(ylo, yhi, xlo, xhi, order)
        for wr, wc_ in ((128, 256), (128, 384), (192, 256), (192, 384), (256, 384)):
            r, _ = fit_rate(pylo, pyhi, pxlo, pxhi, wr, wc_)
            print(f"pairs[{name:11s}] window ({wr},{wc_}): fit {100 * r:.2f}%")

    # smaller windows / finer alignments for single tiles and vertical pairs
    window_sweep("single", ylo, yhi, xlo, xhi)
    pylo, pyhi, pxlo, pxhi = pair_extents(ylo, yhi, xlo, xhi, order_vert)
    window_sweep("vpair ", pylo, pyhi, pxlo, pxhi)
    pylo, pyhi, pxlo, pxhi = pair_extents(ylo, yhi, xlo, xhi, order_consec)
    window_sweep("cpair ", pylo, pyhi, pxlo, pxhi)

    # larger consecutive groups (bigger matmul M per window): union extents
    # of g consecutive tiles; g=18 is the whole slot
    def group_extents(a, g, red):
        pad = (-a.shape[1]) % g
        if pad:
            a = np.concatenate([a, np.repeat(a[:, -1:], pad, axis=1)], axis=1)
        return red(a.reshape(a.shape[0], -1, g), axis=-1)

    for g in (4, 6, 9, 18):
        gylo = group_extents(ylo, g, np.min)
        gyhi = group_extents(yhi, g, np.max)
        gxlo = group_extents(xlo, g, np.min)
        gxhi = group_extents(xhi, g, np.max)
        for wr, wc_ in (
            (192, 256), (256, 256), (256, 384), (256, 512), (384, 512), (384, 640),
        ):
            if wr > 512 or wc_ > 640:
                continue
            r, _ = fit_rate(gylo, gyhi, gxlo, gxhi, wr, wc_)
            print(f"group{g:2d} window ({wr},{wc_}): fit {100 * r:.2f}%")


if __name__ == "__main__":
    main()
