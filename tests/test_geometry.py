"""Geometry core tests: affine, camera projections, crop synthesis.

Oracles: mathematical invariants (project/unproject round trips, rigid
inverse identities) and independent NumPy recomputations of the published
formulas, evaluated with real Fisheye62 parameters from the bundled
sample_data recording.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from absolutetrack_tpu.geometry import affine, camera, crop

SAMPLE_JSON = "/root/reference/sample_data/user05/recording_00.json"


def _sample_fisheye():
    with open(SAMPLE_JSON) as f:
        labels = json.load(f)
    cams = []
    for js in labels["cameras"]:
        cam, kind = camera.camera_from_json(js)
        assert kind == camera.FISHEYE62
        cams.append(cam)
    return camera.stack_cameras(cams), labels


def _rand_rigid(rng, n=()):
    """Random rigid 4x4 transforms via QR."""
    a = rng.standard_normal(n + (3, 3))
    q, _ = np.linalg.qr(a)
    det = np.linalg.det(q)
    q[..., :, 0] *= np.sign(det)[..., None]
    t = rng.standard_normal(n + (3,))
    m = np.zeros(n + (4, 4), np.float32)
    m[..., :3, :3] = q
    m[..., :3, 3] = t
    m[..., 3, 3] = 1
    return m


class TestAffine:
    def test_transform_points_matches_numpy(self):
        rng = np.random.default_rng(0)
        m = _rand_rigid(rng)
        v = rng.standard_normal((10, 3)).astype(np.float32)
        got = affine.transform_points(jnp.asarray(m), jnp.asarray(v))
        want = v @ m[:3, :3].T + m[:3, 3]
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_rigid_inverse(self):
        rng = np.random.default_rng(1)
        m = _rand_rigid(rng, (5,))
        inv = affine.rigid_inverse(jnp.asarray(m))
        np.testing.assert_allclose(
            np.einsum("bij,bjk->bik", m, np.asarray(inv)),
            np.broadcast_to(np.eye(4), (5, 4, 4)),
            atol=1e-5,
        )

    def test_rigid_inverse_handles_mirror(self):
        m = np.eye(4, dtype=np.float32)
        m[0, 0] = -1
        m[:3, 3] = [1, 2, 3]
        inv = np.asarray(affine.rigid_inverse(jnp.asarray(m)))
        np.testing.assert_allclose(m @ inv, np.eye(4), atol=1e-6)

    def test_rotation_from_two_vectors(self):
        rng = np.random.default_rng(2)
        a = rng.standard_normal((8, 3)).astype(np.float32)
        b = rng.standard_normal((8, 3)).astype(np.float32)
        r = np.asarray(affine.rotation_from_two_vectors(jnp.asarray(a), jnp.asarray(b)))
        a_n = a / np.linalg.norm(a, axis=-1, keepdims=True)
        b_n = b / np.linalg.norm(b, axis=-1, keepdims=True)
        got = np.einsum("bij,bj->bi", r, a_n)
        np.testing.assert_allclose(got, b_n, atol=1e-5)
        # proper rotations
        np.testing.assert_allclose(np.linalg.det(r), np.ones(8), atol=1e-5)

    def test_make_look_at_centers_object(self):
        """After look-at, the target center must lie on the +z optical axis."""
        rng = np.random.default_rng(3)
        w2e = _rand_rigid(rng, (4,))
        center = rng.standard_normal((4, 3)).astype(np.float32) * 100
        new_w2e = affine.make_look_at_matrix(jnp.asarray(w2e), jnp.asarray(center), 0.0)
        c_eye = np.asarray(affine.transform_points(new_w2e, jnp.asarray(center)))
        # x, y components vanish; z = distance from the (unchanged) camera pos
        np.testing.assert_allclose(c_eye[:, :2], np.zeros((4, 2)), atol=1e-3)
        cam_pos = np.asarray(affine.rigid_inverse(jnp.asarray(w2e)))[:, :3, 3]
        dist = np.linalg.norm(center - cam_pos, axis=-1)
        np.testing.assert_allclose(c_eye[:, 2], dist, rtol=1e-4)

    def test_make_look_at_preserves_camera_position(self):
        rng = np.random.default_rng(4)
        w2e = _rand_rigid(rng)
        center = np.asarray([10.0, -5.0, 30.0], np.float32)
        new_w2e = np.asarray(
            affine.make_look_at_matrix(jnp.asarray(w2e), jnp.asarray(center), 37.0)
        )
        old_pos = np.linalg.inv(w2e)[:3, 3]
        new_pos = np.linalg.inv(new_w2e)[:3, 3]
        np.testing.assert_allclose(new_pos, old_pos, atol=1e-4)


class TestCameraProjections:
    def test_pinhole_round_trip(self):
        rng = np.random.default_rng(5)
        p = rng.uniform(-0.8, 0.8, (50, 2)).astype(np.float32)
        v = camera.unproject(jnp.asarray(p), camera.PINHOLE)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(v), axis=-1), np.ones(50), atol=1e-5
        )
        p2 = camera.project(v, camera.PINHOLE)
        np.testing.assert_allclose(np.asarray(p2), p, atol=1e-5)

    def test_fisheye_round_trip(self):
        rng = np.random.default_rng(6)
        # angles up to ~80 degrees off-axis
        theta = rng.uniform(0, 1.4, 50)
        phi = rng.uniform(0, 2 * np.pi, 50)
        v = np.stack(
            [np.sin(theta) * np.cos(phi), np.sin(theta) * np.sin(phi), np.cos(theta)],
            axis=-1,
        ).astype(np.float32)
        p = camera.project(jnp.asarray(v), camera.FISHEYE62)
        v2 = camera.unproject(p, camera.FISHEYE62)
        np.testing.assert_allclose(np.asarray(v2), v, atol=1e-5)

    def test_arctan_project_matches_reference_formula(self):
        rng = np.random.default_rng(7)
        v = rng.standard_normal((20, 3)).astype(np.float32)
        v[:, 2] = np.abs(v[:, 2]) + 0.1
        got = np.asarray(camera.project(jnp.asarray(v), camera.FISHEYE62))
        # independent recomputation of the equidistant model
        r = np.linalg.norm(v[:, :2], axis=-1)
        s = np.arctan2(r, v[:, 2]) / np.maximum(r, 1e-30)
        want = v[:, :2] * s[:, None]
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_distort_matches_reference_formula(self):
        coeffs = np.array(
            [-0.0207, 0.1058, -0.0927, 0.0332, -0.00073, -0.00056, -0.0066, 0.00062],
            np.float32,
        )
        rng = np.random.default_rng(8)
        p = rng.uniform(-1.2, 1.2, (30, 2)).astype(np.float32)
        got = np.asarray(camera.distort(jnp.asarray(coeffs), jnp.asarray(p)))
        # independent numpy recomputation
        k1, k2, k3, k4, p1, p2, k5, k6 = coeffs
        r2 = np.clip((p**2).sum(-1), -np.pi**2, np.pi**2)
        radial = (
            1 + k1 * r2 + k2 * r2**2 + k3 * r2**3 + k4 * r2**4 + k5 * r2**5 + k6 * r2**6
        )
        uv = p * radial[:, None]
        x, y = uv[:, 0].copy(), uv[:, 1].copy()
        x2, y2, xy = x * x, y * y, x * y
        rr = x2 + y2
        want = np.stack(
            [x + 2 * p2 * xy + p1 * (rr + 2 * x2), y + 2 * p1 * xy + p2 * (rr + 2 * y2)],
            axis=-1,
        )
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_distort_zero_coeffs_is_identity(self):
        p = jnp.asarray(np.random.default_rng(9).uniform(-1, 1, (10, 2)), jnp.float32)
        np.testing.assert_allclose(
            np.asarray(camera.distort(jnp.zeros(8), p)), np.asarray(p), atol=1e-7
        )

    def test_undistort_inverts_radial_distortion(self):
        """5 fixed-point iterations must invert the radial part for real params."""
        cam, _ = _sample_fisheye()
        coeffs = cam.coeffs[0]
        rng = np.random.default_rng(10)
        p = jnp.asarray(rng.uniform(-0.9, 0.9, (40, 2)), jnp.float32)
        # radial-only forward distortion (tangential ~0 for these params)
        radial_only = coeffs.at[4:6].set(0.0)
        q = camera.distort(radial_only, p)
        p_back = camera.undistort(coeffs, q)
        np.testing.assert_allclose(np.asarray(p_back), np.asarray(p), atol=2e-3)

    def test_window_eye_round_trip_real_camera(self):
        """window_to_eye then eye_to_window recovers pixels on a real camera."""
        cam, _ = _sample_fisheye()
        cam0 = jax.tree.map(lambda x: x[0], cam)
        rng = np.random.default_rng(11)
        w = np.stack(
            [rng.uniform(100, 540, 64), rng.uniform(100, 380, 64)], axis=-1
        ).astype(np.float32)
        rays = camera.window_to_eye(cam0, jnp.asarray(w), camera.FISHEYE62)
        w2 = camera.eye_to_window(cam0, rays, camera.FISHEYE62)
        # The reference's undistort (camera.py:146-181) is radial-only with 5
        # fixed-point iterations: it ignores tangential terms, so the round
        # trip carries sub-pixel error by construction. We reproduce that
        # behavior; bound it at 1 px as a regression guard.
        np.testing.assert_allclose(np.asarray(w2), w, atol=1.0)

    def test_world_eye_round_trip(self):
        cam, labels = _sample_fisheye()
        t = np.array(labels["camera_to_world_transforms"][5], np.float32)
        cam = cam._replace(T_world_from_eye=jnp.asarray(t))
        rng = np.random.default_rng(12)
        pts = rng.standard_normal((4, 10, 3)).astype(np.float32) * 100
        eye = camera.world_to_eye(cam, jnp.asarray(pts))
        back = camera.eye_to_world(cam, eye)
        np.testing.assert_allclose(np.asarray(back), pts, atol=1e-2)

    def test_world_to_eye_matches_reference_formula(self):
        cam, labels = _sample_fisheye()
        t = np.array(labels["camera_to_world_transforms"][5], np.float32)  # (4,4,4)
        cam = cam._replace(T_world_from_eye=jnp.asarray(t))
        rng = np.random.default_rng(13)
        pts = rng.standard_normal((7, 3)).astype(np.float32) * 50
        got = np.asarray(camera.world_to_eye(cam, jnp.broadcast_to(pts, (4, 7, 3))))
        for i in range(4):
            want = (pts - t[i, :3, 3]) @ t[i, :3, :3]
            np.testing.assert_allclose(got[i], want, atol=1e-3)


class TestCropSynthesis:
    def _setup(self, mirror=False):
        rng = np.random.default_rng(20)
        w2e = _rand_rigid(rng)
        # a hand-sized point cloud ~400mm in front of the camera (world space)
        e2w = np.linalg.inv(w2e)
        center_world = e2w[:3, :3] @ np.array([30.0, -20, 400]) + e2w[:3, 3]
        pts = center_world + rng.uniform(-80, 80, (63, 3))
        cc = crop.gen_crop_camera(
            jnp.asarray(w2e, jnp.float32),
            jnp.asarray(pts, jnp.float32),
            (96, 96),
            jnp.asarray(mirror),
            camera_angle_deg=90.0,
            focal_multiplier=0.95,
        )
        return cc, pts

    def test_all_points_project_inside(self):
        cc, pts = self._setup()
        assert bool(cc.valid)
        cam = crop.crop_camera_to_camera(cc, (96, 96))
        w = np.asarray(
            camera.world_to_window(cam, jnp.asarray(pts, jnp.float32), camera.PINHOLE)
        )
        assert (w >= -0.5).all() and (w <= 95.5).all()

    def test_zoom_out_leaves_margin(self):
        cc, pts = self._setup()
        cam = crop.crop_camera_to_camera(cc, (96, 96))
        w = np.asarray(
            camera.world_to_window(cam, jnp.asarray(pts, jnp.float32), camera.PINHOLE)
        )
        # focal_multiplier=0.95 guarantees the extreme point is at ~95% of
        # the half-extent: it must NOT touch the exact border
        half = (96 - 1) / 2
        assert np.abs(w - half).max() < half

    def test_mirrored_crop_flips_x(self):
        cc, pts = self._setup(mirror=False)
        cc_m, _ = self._setup(mirror=True)
        cam = crop.crop_camera_to_camera(cc, (96, 96))
        cam_m = crop.crop_camera_to_camera(cc_m, (96, 96))
        w = np.asarray(
            camera.world_to_window(cam, jnp.asarray(pts, jnp.float32), camera.PINHOLE)
        )
        w_m = np.asarray(
            camera.world_to_window(cam_m, jnp.asarray(pts, jnp.float32), camera.PINHOLE)
        )
        half = (96 - 1) / 2
        np.testing.assert_allclose(w_m[:, 0], 2 * half - w[:, 0], atol=1e-2)
        np.testing.assert_allclose(w_m[:, 1], w[:, 1], atol=1e-2)

    def test_det_of_mirrored_rotation(self):
        cc, _ = self._setup(mirror=True)
        det = np.linalg.det(np.asarray(cc.T_world_to_eye)[:3, :3])
        np.testing.assert_allclose(det, -1.0, atol=1e-4)

    def test_points_straddling_camera_invalid(self):
        """A cloud surrounding the camera position cannot be cropped: after
        look-at some points stay behind the camera -> valid must be False
        (the reference raises ValueError there, crop.py:25-26)."""
        w2e = np.eye(4, dtype=np.float32)
        pts = np.array(
            [[0, 0, 100.0], [10, 10, -120], [-5, 3, 80], [2, -4, -60]], np.float32
        )
        cc = crop.gen_crop_camera(
            jnp.asarray(w2e), jnp.asarray(pts), (96, 96), jnp.asarray(False)
        )
        assert not bool(cc.valid)

    def test_batched_matches_single(self):
        rng = np.random.default_rng(21)
        w2e = _rand_rigid(rng, (3,))
        pts = rng.uniform(-50, 50, (3, 21, 3)).astype(np.float32)
        pts[..., 2] += 500
        # move points into world space of each camera
        e2w = np.linalg.inv(w2e)
        pts_w = np.einsum("bij,bnj->bni", e2w[:, :3, :3], pts) + e2w[:, None, :3, 3]
        mirror = np.array([False, True, False])
        batched = crop.gen_crop_camera(
            jnp.asarray(w2e, jnp.float32),
            jnp.asarray(pts_w, jnp.float32),
            (96, 96),
            jnp.asarray(mirror),
        )
        for i in range(3):
            single = crop.gen_crop_camera(
                jnp.asarray(w2e[i], jnp.float32),
                jnp.asarray(pts_w[i], jnp.float32),
                (96, 96),
                jnp.asarray(mirror[i]),
            )
            np.testing.assert_allclose(
                np.asarray(batched.T_world_to_eye)[i],
                np.asarray(single.T_world_to_eye),
                atol=1e-5,
            )
            np.testing.assert_allclose(
                np.asarray(batched.fx_fy)[i], np.asarray(single.fx_fy), rtol=1e-5
            )

    def test_jit_compiles(self):
        f = jax.jit(
            lambda m, p, mir: crop.gen_crop_camera(m, p, (96, 96), mir),
        )
        rng = np.random.default_rng(22)
        w2e = jnp.asarray(_rand_rigid(rng), jnp.float32)
        pts = jnp.asarray(rng.uniform(100, 200, (63, 3)), jnp.float32)
        out = f(w2e, pts, jnp.asarray(False))
        assert out.T_world_to_eye.shape == (4, 4)


class TestCameraCrop:
    def test_crop_window_preserves_projection(self):
        """A point's pixel in the cropped camera = original pixel - offset
        (scale 1), matching reference camera.py:331-361 semantics."""
        cam0, _ = _sample_fisheye()
        cam0 = jax.tree.map(lambda x: x[0], cam0)
        cropped = camera.crop(cam0, 100, 50, 300, 200)
        pts = jnp.asarray([[30.0, -20.0, 400.0], [0.0, 0.0, 500.0]])
        w_full = np.asarray(camera.world_to_window(cam0, pts, camera.FISHEYE62))
        w_crop = np.asarray(camera.world_to_window(cropped, pts, camera.FISHEYE62))
        np.testing.assert_allclose(w_crop, w_full - np.asarray([100.0, 50.0]), atol=1e-4)

    def test_crop_with_scale(self):
        cam0, _ = _sample_fisheye()
        cam0 = jax.tree.map(lambda x: x[0], cam0)
        scaled = camera.crop(cam0, 0, 0, 318, 240, scale=0.5)
        pts = jnp.asarray([[15.0, 25.0, 300.0]])
        w_full = np.asarray(camera.world_to_window(cam0, pts, camera.FISHEYE62))
        w_half = np.asarray(camera.world_to_window(scaled, pts, camera.FISHEYE62))
        # (w + 0.5) * s - 0.5 pixel-center convention
        np.testing.assert_allclose(w_half, (w_full + 0.5) * 0.5 - 0.5, atol=1e-4)
