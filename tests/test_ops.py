"""Tests for resample/warp and Procrustes ops."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from absolutetrack_tpu.geometry import affine, camera, crop
from absolutetrack_tpu.ops import procrustes, resample

SAMPLE_JSON = "/root/reference/sample_data/user05/recording_00.json"


def _rand_rot(rng):
    q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
    return q * np.sign(np.linalg.det(q))


class TestProcrustes:
    def test_recovers_known_rigid_transform(self):
        rng = np.random.default_rng(0)
        for _ in range(5):
            R = _rand_rot(rng)
            t = rng.uniform(-5, 5, 3)
            src = rng.standard_normal((7, 3))
            dst = src @ R.T + t
            xf = np.asarray(
                procrustes.procrustes_align(
                    jnp.asarray(src, jnp.float32)[None], jnp.asarray(dst, jnp.float32)[None]
                )
            )[0]
            np.testing.assert_allclose(xf[:3, :3], R, atol=1e-4)
            np.testing.assert_allclose(xf[:3, 3], t, atol=1e-4)

    def test_reflection_fixup(self):
        """Noisy reflected targets must still produce det(R) = +1."""
        rng = np.random.default_rng(1)
        src = rng.standard_normal((16, 7, 3)).astype(np.float32)
        dst = src * np.array([-1.0, 1, 1]) + 0.05 * rng.standard_normal((16, 7, 3)).astype(
            np.float32
        )
        xf = np.asarray(procrustes.procrustes_align(jnp.asarray(src), jnp.asarray(dst)))
        np.testing.assert_allclose(np.linalg.det(xf[:, :3, :3]), np.ones(16), atol=1e-4)

    def test_batched_consistency(self):
        rng = np.random.default_rng(2)
        src = rng.standard_normal((4, 7, 3)).astype(np.float32)
        dst = rng.standard_normal((4, 7, 3)).astype(np.float32)
        batched = np.asarray(
            procrustes.procrustes_align(jnp.asarray(src), jnp.asarray(dst))
        )
        for i in range(4):
            single = np.asarray(
                procrustes.procrustes_align(
                    jnp.asarray(src[i])[None], jnp.asarray(dst[i])[None]
                )
            )[0]
            np.testing.assert_allclose(batched[i], single, atol=1e-5)

    def test_grad_is_finite(self):
        rng = np.random.default_rng(3)
        src = jnp.asarray(rng.standard_normal((2, 7, 3)), jnp.float32)
        dst = jnp.asarray(rng.standard_normal((2, 7, 3)), jnp.float32)

        def loss(d):
            return jnp.sum(procrustes.procrustes_align(src, d) ** 2)

        g = jax.grad(loss)(dst)
        assert np.isfinite(np.asarray(g)).all()


class TestBilinearSample:
    def test_integer_coords_identity(self):
        rng = np.random.default_rng(4)
        img = rng.uniform(0, 255, (1, 8, 9)).astype(np.float32)
        ys, xs = np.mgrid[0:7, 0:8]
        coords = np.stack([xs.reshape(-1), ys.reshape(-1)], -1).astype(np.float32)
        out = np.asarray(
            resample.bilinear_sample(
                jnp.asarray(img), jnp.zeros(1, jnp.int32), jnp.asarray(coords)[None]
            )
        )[0]
        np.testing.assert_allclose(out, img[0, :7, :8].reshape(-1), atol=1e-5)

    def test_midpoint_interpolation(self):
        img = np.zeros((1, 2, 2), np.float32)
        img[0] = [[0, 10], [20, 30]]
        coords = jnp.asarray([[[0.5, 0.5]]], jnp.float32)
        out = float(
            resample.bilinear_sample(jnp.asarray(img), jnp.zeros(1, jnp.int32), coords)[
                0, 0
            ]
        )
        assert abs(out - 15.0) < 1e-5

    def test_out_of_bounds_zero(self):
        img = jnp.ones((1, 4, 4), jnp.float32)
        coords = jnp.asarray([[[-1.0, 0.0], [0.0, -0.5], [3.5, 0.0], [0.0, 5.0]]])
        out = np.asarray(
            resample.bilinear_sample(img, jnp.zeros(1, jnp.int32), coords)
        )[0]
        np.testing.assert_allclose(out, np.zeros(4), atol=0)


class TestWarpPerspectiveCrop:
    def test_pinhole_identity_warp(self):
        """Same source/dst camera: warp must reproduce the (interior of) image."""
        rng = np.random.default_rng(5)
        img = rng.uniform(0, 1, (1, 64, 64)).astype(np.float32)
        T = np.eye(4, dtype=np.float32)
        c = camera.pinhole_camera(
            jnp.asarray([50.0]),
            jnp.asarray([50.0]),
            jnp.asarray([31.5]),
            jnp.asarray([31.5]),
            jnp.asarray(T)[None],
            jnp.asarray([64.0]),
            jnp.asarray([64.0]),
        )
        out = np.asarray(
            resample.warp_perspective_crop(
                jnp.asarray(img),
                c,
                jnp.zeros(1, jnp.int32),
                c,
                (64, 64),
                src_kind=camera.PINHOLE,
            )
        )[0]
        np.testing.assert_allclose(out[1:-1, 1:-1], img[0, 1:-1, 1:-1], atol=1e-3)

    def test_crop_of_projected_point_lands_at_expected_pixel(self):
        """Render a bright dot through a fisheye camera; the crop camera
        centered on that world point must see the dot at the crop center."""
        with open(SAMPLE_JSON) as f:
            labels = json.load(f)
        fish, kind = camera.camera_from_json(labels["cameras"][0])
        assert kind == camera.FISHEYE62

        # world point 300mm in front, off-axis
        pt_world = np.array([40.0, -25.0, 300.0], np.float32)
        w = np.asarray(
            camera.world_to_window(fish, jnp.asarray(pt_world)[None], camera.FISHEYE62)
        )[0]
        H, W = 480, 636
        img = np.zeros((1, H, W), np.float32)
        iy, ix = int(round(float(w[1]))), int(round(float(w[0])))
        img[0, iy - 2 : iy + 3, ix - 2 : ix + 3] = 1.0

        # crop camera looking at the point (cloud = small cube around it)
        cube = pt_world + np.array(
            [[dx, dy, dz] for dx in (-40, 40) for dy in (-40, 40) for dz in (-40, 40)],
            np.float32,
        )
        cc = crop.gen_crop_camera(
            jnp.eye(4), jnp.asarray(cube), (96, 96), jnp.asarray(False)
        )
        crop_cam = crop.crop_camera_to_camera(cc, (96, 96))
        crop_cam_b = jax.tree.map(lambda x: x[None], crop_cam)
        fish_b = jax.tree.map(lambda x: jnp.asarray(x)[None], fish)

        out = np.asarray(
            resample.warp_perspective_crop(
                jnp.asarray(img),
                fish_b,
                jnp.zeros(1, jnp.int32),
                crop_cam_b,
                (96, 96),
            )
        )[0]
        # the dot must appear near the crop center
        peak = np.unravel_index(out.argmax(), out.shape)
        assert out.max() > 0.2
        assert abs(peak[0] - 47.5) < 4 and abs(peak[1] - 47.5) < 4

    def test_depth_check_masks_behind_camera(self):
        img = jnp.ones((1, 32, 32), jnp.float32)
        T = np.eye(4, dtype=np.float32)
        src = camera.pinhole_camera(
            jnp.asarray([20.0]), jnp.asarray([20.0]),
            jnp.asarray([15.5]), jnp.asarray([15.5]),
            jnp.asarray(T)[None], jnp.asarray([32.0]), jnp.asarray([32.0]),
        )
        # crop camera rotated 180 degrees (looking backwards)
        T_flip = np.diag([-1.0, 1.0, -1.0, 1.0]).astype(np.float32)
        dst = camera.pinhole_camera(
            jnp.asarray([20.0]), jnp.asarray([20.0]),
            jnp.asarray([15.5]), jnp.asarray([15.5]),
            jnp.asarray(T_flip)[None], jnp.asarray([32.0]), jnp.asarray([32.0]),
        )
        out = np.asarray(
            resample.warp_perspective_crop(
                img, src, jnp.zeros(1, jnp.int32), dst, (32, 32),
                src_kind=camera.PINHOLE,
            )
        )
        np.testing.assert_allclose(out, np.zeros_like(out), atol=0)


class TestWarpHomography:
    def test_identity_homography(self):
        rng = np.random.default_rng(6)
        img = rng.uniform(0, 1, (2, 40, 40)).astype(np.float32)
        xf = jnp.broadcast_to(jnp.eye(4), (2, 4, 4))
        out = np.asarray(resample.warp_homography(jnp.asarray(img), xf, (40, 40)))
        np.testing.assert_allclose(out[:, :-1, :-1], img[:, :-1, :-1], atol=1e-4)

    def test_translation_homography(self):
        img = np.zeros((1, 16, 16), np.float32)
        img[0, 5, 7] = 1.0
        xf = np.eye(4, dtype=np.float32)
        xf[0, 3] = 7.0  # dst pixel (0, 5) reads src pixel (7, 5)
        xf[1, 3] = 5.0
        out = np.asarray(
            resample.warp_homography(jnp.asarray(img), jnp.asarray(xf)[None], (16, 16))
        )[0]
        assert out[0, 0] == pytest.approx(1.0)

    def test_matches_reference_resample_matrix(self):
        """compute_resample_matrix composed with warp reproduces a pure-numpy
        reimplementation of the reference's homography math."""
        rng = np.random.default_rng(7)
        K_orig = np.array([[50, 0, 20], [0, 55, 21], [0, 0, 1]], np.float32)
        K_new = np.array([[40, 0, 19.5], [0, 40, 19.5], [0, 0, 1]], np.float32)
        R = _rand_rot(rng).astype(np.float32) * 1.0
        w2e_orig = np.eye(4, dtype=np.float32)
        e2w_new = np.eye(4, dtype=np.float32)
        e2w_new[:3, :3] = R

        got = np.asarray(
            resample.compute_resample_matrix(
                jnp.asarray(K_orig),
                jnp.asarray(w2e_orig),
                jnp.asarray(K_new),
                jnp.asarray(e2w_new),
            )
        )
        lift = lambda m: np.block([[m, np.zeros((3, 1))], [np.zeros((1, 3)), np.ones((1, 1))]])
        want = (
            lift(K_orig) @ w2e_orig @ e2w_new @ lift(np.linalg.inv(K_new))
        )
        np.testing.assert_allclose(got, want, atol=1e-4)


class TestQuaternionProcrustes:
    def test_matches_svd_on_random_rigid(self):
        rng = np.random.default_rng(30)
        for _ in range(5):
            R = _rand_rot(rng)
            t = rng.uniform(-5, 5, 3)
            src = rng.standard_normal((7, 3)) * 0.1
            dst = src @ R.T + t + 0.01 * rng.standard_normal((7, 3))
            a = np.asarray(
                procrustes.procrustes_align(
                    jnp.asarray(src, jnp.float32)[None],
                    jnp.asarray(dst, jnp.float32)[None],
                    method="quat",
                )
            )[0]
            b = np.asarray(
                procrustes.procrustes_align(
                    jnp.asarray(src, jnp.float32)[None],
                    jnp.asarray(dst, jnp.float32)[None],
                    method="svd",
                )
            )[0]
            # power-iteration convergence: rotation agreement to ~1e-4,
            # i.e. <0.02 mm over a 100 mm hand -- far inside the 0.5 mm
            # parity budget
            np.testing.assert_allclose(a, b, atol=3e-4)

    def test_quat_det_plus_one_under_reflection(self):
        """Reflected noisy targets: the quaternion solution is a proper
        rotation by construction AND matches the constrained SVD optimum."""
        rng = np.random.default_rng(31)
        src = rng.standard_normal((8, 7, 3)).astype(np.float32)
        dst = src * np.array([-1.0, 1, 1], np.float32) + 0.05 * rng.standard_normal(
            (8, 7, 3)
        ).astype(np.float32)
        a = np.asarray(
            procrustes.procrustes_align(jnp.asarray(src), jnp.asarray(dst), "quat")
        )
        b = np.asarray(
            procrustes.procrustes_align(jnp.asarray(src), jnp.asarray(dst), "svd")
        )
        np.testing.assert_allclose(np.linalg.det(a[:, :3, :3]), np.ones(8), atol=1e-3)
        # same residual (both are the constrained optimum)
        def resid(xf):
            mapped = np.einsum("bij,bnj->bni", xf[:, :3, :3], src) + xf[:, None, :3, 3]
            return np.linalg.norm(mapped - dst, axis=-1).sum(-1)

        np.testing.assert_allclose(resid(a), resid(b), rtol=1e-3)

    def test_quat_grad_finite(self):
        rng = np.random.default_rng(32)
        src = jnp.asarray(rng.standard_normal((2, 7, 3)), jnp.float32)
        dst = jnp.asarray(rng.standard_normal((2, 7, 3)), jnp.float32)
        g = jax.grad(
            lambda d: jnp.sum(procrustes.procrustes_align(src, d, "quat") ** 2)
        )(dst)
        assert np.isfinite(np.asarray(g)).all()
