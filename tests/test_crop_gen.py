"""Crop-slot generation tests: camera selection semantics, masks."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from absolutetrack_tpu.geometry import camera as cam
from absolutetrack_tpu.kinematics.hand_model import load_hand_model_json
from absolutetrack_tpu.kinematics.skinning import skin_landmarks
from absolutetrack_tpu.tracker.crop_gen import gen_crop_slots

GENERIC = "/root/reference/dataset/generic_hand_model.json"


def _pinhole_rig(positions, look_dirs=None):
    """Simple pinhole cameras at given world positions looking at +z."""
    n = len(positions)
    T = np.broadcast_to(np.eye(4, dtype=np.float32), (n, 4, 4)).copy()
    T[:, :3, 3] = positions
    return cam.Camera(
        fx=jnp.full((n,), 300.0),
        fy=jnp.full((n,), 300.0),
        cx=jnp.full((n,), 319.5),
        cy=jnp.full((n,), 239.5),
        coeffs=jnp.zeros((n, 8)),
        T_world_from_eye=jnp.asarray(T),
        width=jnp.full((n,), 640.0),
        height=jnp.full((n,), 480.0),
    )


@pytest.fixture(scope="module")
def hand():
    return load_hand_model_json(GENERIC)


def _pose_at(z=400.0, x=0.0):
    wrist = np.eye(4, dtype=np.float32)
    wrist[:3, 3] = [x, 0, z]
    return jnp.zeros((2, 22)), jnp.asarray(np.broadcast_to(wrist, (2, 4, 4)).copy())


class TestCameraSelection:
    def test_lowest_indexed_eligible_cameras_win(self, hand):
        """With sort_camera_index=True (the reference's always-on setting),
        the two lowest-indexed cameras that can see the hand are chosen --
        not the two with the best visibility."""
        # cameras 0 and 1 see the hand head-on; camera 2 sees it too;
        # camera 3 points away (hand behind it)
        rig = _pinhole_rig(
            [[0, 0, 0], [30, 0, 0], [-30, 0, 0], [0, 0, 900]],
        )
        ja, wr = _pose_at(z=400.0)
        slots = gen_crop_slots(
            rig,
            jnp.zeros(4),
            hand,
            ja,
            wr,
            jnp.ones(2),
            (96, 96),
            src_kind=cam.PINHOLE,
        )
        assert bool(slots.hand_valid.all())
        np.testing.assert_array_equal(np.asarray(slots.view_idx)[0], [0, 1])

    def test_ineligible_low_index_skipped(self, hand):
        """Camera 0 cannot see the hand -> selection moves to 1, 2."""
        rig = _pinhole_rig(
            [[0, 0, 900], [30, 0, 0], [-30, 0, 0], [5, 0, 0]],
        )
        ja, wr = _pose_at(z=400.0)
        slots = gen_crop_slots(
            rig, jnp.zeros(4), hand, ja, wr, jnp.ones(2), (96, 96),
            src_kind=cam.PINHOLE,
        )
        assert bool(slots.hand_valid.all())
        np.testing.assert_array_equal(np.asarray(slots.view_idx)[0], [1, 2])

    def test_single_eligible_camera(self, hand):
        rig = _pinhole_rig(
            [[0, 0, 900], [0, 0, 0], [0, 0, 901], [0, 0, 902]],
        )
        ja, wr = _pose_at(z=400.0)
        slots = gen_crop_slots(
            rig, jnp.zeros(4), hand, ja, wr, jnp.ones(2), (96, 96),
            min_num_crops=1, src_kind=cam.PINHOLE,
        )
        v = np.asarray(slots.view_valid)
        assert bool(slots.hand_valid.all())
        np.testing.assert_array_equal(v[0], [True, False])
        assert np.asarray(slots.view_idx)[0, 0] == 1

    def test_min_num_crops_two_drops_mono_hands(self, hand):
        rig = _pinhole_rig(
            [[0, 0, 900], [0, 0, 0], [0, 0, 901], [0, 0, 902]],
        )
        ja, wr = _pose_at(z=400.0)
        slots = gen_crop_slots(
            rig, jnp.zeros(4), hand, ja, wr, jnp.ones(2), (96, 96),
            min_num_crops=2, src_kind=cam.PINHOLE,
        )
        assert not bool(slots.hand_valid.any())

    def test_low_confidence_hand_dropped(self, hand):
        rig = _pinhole_rig([[0, 0, 0], [30, 0, 0], [-30, 0, 0], [5, 0, 0]])
        ja, wr = _pose_at()
        slots = gen_crop_slots(
            rig, jnp.zeros(4), hand, ja, wr, jnp.asarray([1.0, 0.3]), (96, 96),
            src_kind=cam.PINHOLE,
        )
        v = np.asarray(slots.hand_valid)
        assert v[0] and not v[1]
