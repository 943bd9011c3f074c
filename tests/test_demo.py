"""Live-demo component tests: UDP protocol, detector plumbing, stereo rig,
2D-driven crop generation, multiprocess ring pipeline."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from absolutetrack_tpu.apps.demo.detector_2d import ReplayDetector, keypoints_to_slots
from absolutetrack_tpu.apps.demo.stereo_rig import build_stereo_cameras
from absolutetrack_tpu.apps.demo.unity_udp import encode_packet
from absolutetrack_tpu.geometry import camera as cam
from absolutetrack_tpu.tracker.crop_gen import gen_crop_slots_from_2d


class TestUnityUdp:
    def test_packet_format(self):
        kp = {
            0: np.asarray([[1.4, 2.6, 3.0]] * 21),
            1: np.asarray([[-1.0, -2.0, -3.0]] * 21),
        }
        pkt = encode_packet(kp).decode()
        parts = pkt.split(";")
        assert parts[0] == "U"
        assert len(parts) == 3
        hand0 = eval(parts[1])
        # y negated, x unchanged (the double flip), z unchanged; ints
        assert hand0[:3] == [1, -2, 3]
        hand1 = eval(parts[2])
        assert hand1[:3] == [-1, 2, -3]

    def test_send_requires_both_hands(self):
        from absolutetrack_tpu.apps.demo.unity_udp import UnitySender

        s = UnitySender(("127.0.0.1", 59999))
        assert not s.send({0: np.zeros((21, 3))})
        assert s.send({0: np.zeros((21, 3)), 1: np.zeros((21, 3))})
        s.close()


class TestDetectorPlumbing:
    def test_keypoints_to_slots(self):
        per_view = [
            {0: np.ones((21, 2)), 1: 2 * np.ones((21, 2))},
            {1: 3 * np.ones((21, 2))},
        ]
        kp, valid = keypoints_to_slots(per_view)
        assert kp.shape == (2, 2, 21, 2)
        np.testing.assert_array_equal(
            valid, [[True, False], [True, True]]
        )
        assert kp[1, 1, 0, 0] == 3

    def test_replay_detector_advance(self):
        seq = [
            [{0: np.zeros((21, 2))}, {}],
            [{1: np.ones((21, 2))}, {}],
        ]
        d = ReplayDetector(seq)
        assert 0 in d.detect(None, 0)
        d.advance()
        assert 1 in d.detect(None, 0)


class TestStereoRig:
    def test_build(self):
        rig = build_stereo_cameras()
        assert rig.fx.shape == (2,)
        # baseline ~59mm between the cameras
        t = np.asarray(rig.T_world_from_eye)
        base = np.linalg.norm(t[1, :3, 3] - t[0, :3, 3])
        assert 55 < base < 65
        # rotations orthonormal
        for v in range(2):
            r = t[v, :3, :3]
            np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)

    def test_2d_crop_generation_on_rig(self):
        """2D keypoints around a plausible hand position produce valid
        crops whose camera looks at the unprojected cloud."""
        rig = build_stereo_cameras()
        rng = np.random.default_rng(0)
        # hand roughly at image center of both views
        kp = np.zeros((2, 2, 21, 2), np.float32)
        kp[..., 0] = 320 + rng.uniform(-60, 60, (2, 2, 21))
        kp[..., 1] = 240 + rng.uniform(-60, 60, (2, 2, 21))
        valid = np.ones((2, 2), bool)
        slots = gen_crop_slots_from_2d(
            rig, jnp.asarray(kp), jnp.asarray(valid), (96, 96)
        )
        assert bool(slots.hand_valid.all())
        # unprojected points land inside each crop
        from absolutetrack_tpu.geometry import crop as crop_mod

        rays = cam.window_to_eye(rig, jnp.asarray(kp), cam.FISHEYE62)
        pts_world = cam.eye_to_world(rig, rays)
        crop_cam = crop_mod.crop_camera_to_camera(slots.cameras, (96, 96))
        win = np.asarray(
            cam.world_to_window(crop_cam, pts_world, cam.PINHOLE)
        )
        assert (win >= -0.5).all() and (win <= 95.5).all()

    def test_mirrored_right_hand_crop(self):
        rig = build_stereo_cameras()
        kp = np.full((2, 2, 21, 2), 300.0, np.float32)
        kp[..., 1] = 240.0
        valid = np.ones((2, 2), bool)
        slots = gen_crop_slots_from_2d(rig, jnp.asarray(kp), jnp.asarray(valid), (96, 96))
        det0 = np.linalg.det(np.asarray(slots.cameras.T_world_to_eye)[0, 0, :3, :3])
        det1 = np.linalg.det(np.asarray(slots.cameras.T_world_to_eye)[1, 0, :3, :3])
        np.testing.assert_allclose(det0, 1.0, atol=1e-4)
        np.testing.assert_allclose(det1, -1.0, atol=1e-4)


class TestMultiprocessDemo:
    def test_ring_pipeline_delivers_frames(self):
        from absolutetrack_tpu.utils.native import native_available

        if not native_available():
            pytest.skip("native library not built")
        from absolutetrack_tpu.apps.demo.multiprocess import run_multiprocess_demo

        seen_frames = []
        n = run_multiprocess_demo(
            max_frames=10,
            source_kind="synthetic",
            on_frame=lambda i, mono: seen_frames.append((i, mono.shape)),
        )
        assert n > 0
        assert all(shape == (2, 480, 640) for _, shape in seen_frames)
        # drop-oldest semantics: indices strictly increasing
        idxs = [i for i, _ in seen_frames]
        assert idxs == sorted(idxs)
