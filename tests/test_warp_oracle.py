"""Warp oracle: our crop warp vs the reference's ACTUAL sampler (cv2.remap).

Every prior warp test checked the Pallas kernel against this repo's own XLA
gather path or invariants. This file pins the full warp — coordinate chain
AND sampling — against the reference implementation itself: the reference's
``_warp_image`` recipe (/root/reference/lib/tracker/tracker.py:61-89)
executed with the reference's own ``lib/common/camera.py`` CameraModel
classes (imported from the read-only mount as the oracle, never vendored)
and ``cv2.remap(INTER_LINEAR)``, on the real sample_data/user05 fisheye rig
with crop cameras synthesized from GT poses.

Agreement bound: cv2's INTER_LINEAR uses 5-bit fixed-point interpolation
weights (INTER_BITS = 5, i.e. 1/32 steps per axis), so for uint8 sources
cv2's own quantization error is up to ~255/32 ≈ 8 intensity levels per
pixel worst-case and well under 1 LSB on average over smooth images. Our
sampler carries bf16 weights (~4e-3 quantization, ~8x finer than cv2's) and
an f32 coordinate chain vs the reference's f64 — so the budget is:
mean |Δ| ≤ 1 LSB and max |Δ| ≤ 8 over interior pixels, and exact
behind-camera mask agreement (excluding |z| < 1e-4 mm knife-edge pixels,
where f32-vs-f64 rounding may legitimately flip the sign; none occur on
these poses).
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference")  # oracle import only; never vendored

import jax
import jax.numpy as jnp

from absolutetrack_tpu.geometry import camera as cam, crop as crop_mod
from absolutetrack_tpu.ops.resample import warp_perspective_crop
from absolutetrack_tpu.tracker.crop_gen import gen_crop_slots
from absolutetrack_tpu.tracker.video_data import load_labels

LABELS_JSON = "/root/reference/sample_data/user05/recording_00.json"
CROP = 96
FRAME = 100


def _smooth_texture(rng, h, w):
    """Full-coverage smooth test pattern: every crop pixel sees signal and
    local gradients stay moderate (bounds the interpolation-error term)."""
    import cv2

    coarse = rng.uniform(0, 255, (h // 16, w // 16)).astype(np.float32)
    img = cv2.resize(coarse, (w, h), interpolation=cv2.INTER_CUBIC)
    return np.clip(img, 0, 255).astype(np.uint8)


@pytest.fixture(scope="module")
def setup():
    import json

    from lib.common import camera as ref_camera  # reference oracle

    labels = load_labels(LABELS_JSON)
    with open(LABELS_JSON) as f:
        js = json.load(f)

    rng = np.random.default_rng(0)
    v = labels.num_views
    images = np.stack(
        [_smooth_texture(rng, 480, 636) for _ in range(v)]
    )  # (V, 480, 636) uint8

    cams_t = labels.cameras_at(FRAME)
    slots = jax.jit(
        lambda: gen_crop_slots(
            cams_t,
            jnp.asarray(labels.camera_angles),
            labels.hand_model,
            jnp.asarray(labels.joint_angles[FRAME]),
            jnp.asarray(labels.wrist_transforms[FRAME]),
            jnp.asarray(labels.hand_confidences[FRAME]),
            (CROP, CROP),
            focal_multiplier=0.8,
        )
    )()

    ref_cams = [
        ref_camera.read_camera_from_json(c).copy(
            camera_to_world_xf=np.asarray(
                labels.camera_to_world[FRAME, vi], np.float64
            )
        )
        for vi, c in enumerate(js["cameras"])
    ]
    return labels, images, slots, ref_cams, ref_camera


def _reference_warp(src_cam, dst_cam, src_image):
    """The reference ``_warp_image`` recipe (tracker.py:61-89), verbatim
    semantics: dst grid -> unproject -> world -> src eye -> project+distort
    -> cv2.remap INTER_LINEAR with the z<0 mask. Returns (warped, behind)."""
    import cv2

    w, h = dst_cam.width, dst_cam.height
    px, py = np.meshgrid(np.arange(w), np.arange(h))
    dst_win = np.column_stack((px.flatten(), py.flatten())).astype(np.float64)
    dst_eye = dst_cam.window_to_eye(dst_win)
    world = dst_cam.eye_to_world(dst_eye)
    src_eye = src_cam.world_to_eye(world)
    src_win = src_cam.eye_to_window(src_eye)
    behind = src_eye[:, 2] < 0
    src_win = src_win.astype(np.float32)
    src_win[behind] = -1.0
    map_x = src_win[:, 0].reshape(h, w)
    map_y = src_win[:, 1].reshape(h, w)
    warped = cv2.remap(src_image, map_x, map_y, cv2.INTER_LINEAR)
    return (
        warped.astype(np.float32),
        behind.reshape(h, w),
        map_x,
        map_y,
        src_eye[:, 2].reshape(h, w),
    )


def _our_coords(labels, slots, flat_idx):
    """The coordinate chain exactly as warp_perspective_crop computes it."""
    crop_cams_flat = jax.tree.map(
        lambda x: x.reshape((4,) + x.shape[2:]), slots.cameras
    )
    crop_cam = crop_mod.crop_camera_to_camera(crop_cams_flat, (CROP, CROP))
    cams_t = labels.cameras_at(FRAME)
    src_cams = jax.tree.map(lambda x: x[flat_idx], cams_t)
    return crop_cam, src_cams


class TestWarpVsReferenceSampler:
    def _slot_cases(self, setup):
        labels, images, slots, ref_cams, ref_camera = setup
        view_idx = np.asarray(slots.view_idx).reshape(-1)
        view_valid = np.asarray(slots.view_valid).reshape(-1)
        t_w2e = np.asarray(slots.cameras.T_world_to_eye).reshape(-1, 4, 4)
        fx_fy = np.asarray(slots.cameras.fx_fy).reshape(-1, 2)
        cx_cy = np.asarray(slots.cameras.cx_cy).reshape(-1, 2)
        cases = []
        for s in range(4):
            if not view_valid[s]:
                continue
            dst = ref_camera.PinholePlaneCameraModel(
                CROP,
                CROP,
                tuple(fx_fy[s].astype(np.float64)),
                tuple(cx_cy[s].astype(np.float64)),
                [],
                camera_to_world_xf=np.linalg.inv(t_w2e[s].astype(np.float64)),
            )
            cases.append((s, int(view_idx[s]), dst))
        return cases

    def test_slots_cover_both_hands_and_views(self, setup):
        cases = self._slot_cases(setup)
        # frame 100 has both hands confidently tracked in >= 2 cameras
        assert len(cases) == 4

    def test_gather_path_matches_cv2_remap(self, setup):
        labels, images, slots, ref_cams, ref_camera = setup
        flat_idx = jnp.asarray(np.asarray(slots.view_idx).reshape(-1))
        crop_cam, src_cams = _our_coords(labels, slots, flat_idx)
        ours = np.asarray(
            jax.jit(
                lambda imgs: warp_perspective_crop(
                    imgs, src_cams, flat_idx, crop_cam, (CROP, CROP),
                    method="gather",
                )
            )(jnp.asarray(images, jnp.float32))
        )  # (4, 96, 96)

        for s, vi, dst in self._slot_cases(setup):
            ref, behind, map_x, map_y, z = _reference_warp(
                ref_cams[vi], dst, images[vi]
            )
            # knife-edge carve-out: none of these pixels may sit at z ~ 0
            assert (np.abs(z) > 1e-4).all()
            # exact mask agreement: wherever the reference masked (z < 0),
            # our warp must produce exactly 0
            assert (ours[s][behind] == 0).all()
            # interior: reference coords fully inside with a 1-px margin
            # (border pixels differ by construction: cv2 blends the border
            # constant, we zero any pixel with an out-of-bounds neighbor)
            interior = (
                ~behind
                & (map_x >= 1)
                & (map_x <= 636 - 2)
                & (map_y >= 1)
                & (map_y <= 480 - 2)
            )
            # most of the crop must actually be comparable (some views clip
            # the fisheye image edge; frame 100 worst case is ~78% interior)
            assert interior.mean() > 0.5
            d = np.abs(ours[s] - ref)[interior]
            assert d.mean() <= 1.0, (s, d.mean())
            assert d.max() <= 8.0, (s, d.max())

    def test_pallas_kernel_matches_cv2_remap(self, setup):
        """The Pallas MXU kernel (interpret mode on CPU) against cv2.remap
        on the same real-pose coords — the hottest custom kernel pinned to
        the reference's own sampler, not just to the repo's gather."""
        from absolutetrack_tpu.ops.pallas_warp import bilinear_sample_mxu

        labels, images, slots, ref_cams, ref_camera = setup
        flat_idx = jnp.asarray(np.asarray(slots.view_idx).reshape(-1))
        crop_cam, src_cams = _our_coords(labels, slots, flat_idx)

        # reproduce warp_perspective_crop's coord computation, then sample
        # with the kernel instead of the gather
        from absolutetrack_tpu.ops.resample import _dst_pixel_grid

        grid = _dst_pixel_grid((CROP, CROP))
        grid = jnp.broadcast_to(grid, (4,) + grid.shape)
        dst_eye = cam.window_to_eye(crop_cam, grid, cam.PINHOLE)
        world = cam.eye_to_world(crop_cam, dst_eye)
        src_eye = cam.world_to_eye(src_cams, world)
        src_win = cam.eye_to_window(src_cams, src_eye, labels.camera_kind)
        src_win = jnp.where(src_eye[..., 2:3] < 0, -1.0, src_win)

        ours = np.asarray(
            bilinear_sample_mxu(
                jnp.asarray(images),  # uint8: the in-kernel convert path
                flat_idx,
                src_win,
                interpret=True,
                crop_hw=(CROP, CROP),
            )
        ).reshape(4, CROP, CROP)

        for s, vi, dst in self._slot_cases(setup):
            ref, behind, map_x, map_y, _ = _reference_warp(
                ref_cams[vi], dst, images[vi]
            )
            assert (ours[s][behind] == 0).all()
            interior = (
                ~behind
                & (map_x >= 1)
                & (map_x <= 636 - 2)
                & (map_y >= 1)
                & (map_y <= 480 - 2)
            )
            d = np.abs(ours[s] - ref)[interior]
            assert d.mean() <= 1.0, (s, d.mean())
            assert d.max() <= 8.0, (s, d.max())
