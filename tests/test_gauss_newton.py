"""Gauss-Newton fitter tests: pose recovery and windowed scale calibration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from absolutetrack_tpu.kinematics.hand_model import (
    load_hand_model_json,
    scaled_hand_model,
)
from absolutetrack_tpu.kinematics.skinning import skin_landmarks
from absolutetrack_tpu.ops.gauss_newton import calibrate_scale_window, fit_pose

GENERIC = "/root/reference/dataset/generic_hand_model.json"


@pytest.fixture(scope="module")
def hand():
    return load_hand_model_json(GENERIC)


def _gt_poses(rng, t):
    angles = jnp.asarray(rng.uniform(-0.4, 0.6, (t, 22)), jnp.float32)
    wr = np.broadcast_to(np.eye(4, dtype=np.float32), (t, 4, 4)).copy()
    wr[:, :3, 3] = rng.uniform(-30, 30, (t, 3))
    return angles, jnp.asarray(wr)


class TestFitPose:
    def test_recovers_perturbed_pose(self, hand):
        rng = np.random.default_rng(0)
        b = 3
        gt_angles, gt_wrist = _gt_poses(rng, b)
        hand_b = jax.tree.map(lambda x: jnp.broadcast_to(x, (b,) + x.shape), hand)
        target = skin_landmarks(hand_b, gt_angles, gt_wrist)

        # perturb the initialization
        init_angles = gt_angles + jnp.asarray(
            rng.uniform(-0.15, 0.15, (b, 22)), jnp.float32
        )
        init_wrist = np.asarray(gt_wrist).copy()
        init_wrist[:, :3, 3] += rng.uniform(-8, 8, (b, 3))

        res = fit_pose(
            hand_b, target, init_angles, jnp.asarray(init_wrist), iters=8
        )
        # initial error was ~10mm; GN must drive it below 0.5mm
        assert float(res.residual.max()) < 0.5, np.asarray(res.residual)

    def test_weighted_fit_ignores_downweighted_outliers(self, hand):
        rng = np.random.default_rng(1)
        b = 1
        gt_angles, gt_wrist = _gt_poses(rng, b)
        hand_b = jax.tree.map(lambda x: jnp.broadcast_to(x, (b,) + x.shape), hand)
        target = np.asarray(skin_landmarks(hand_b, gt_angles, gt_wrist))
        corrupted = target.copy()
        corrupted[:, 0] += 200.0  # gross outlier on one landmark
        w = np.ones((b, 21), np.float32)
        w[:, 0] = 1e-6
        res = fit_pose(
            hand_b,
            jnp.asarray(corrupted),
            gt_angles,
            gt_wrist,
            iters=6,
            weights=jnp.asarray(w),
        )
        clean = np.asarray(
            skin_landmarks(hand_b, res.joint_angles, res.wrist)
        )
        err_clean = np.linalg.norm(clean[:, 1:] - target[:, 1:], axis=-1)
        assert err_clean.max() < 1.0


class TestScaleCalibration:
    def test_recovers_known_scale(self, hand):
        rng = np.random.default_rng(2)
        t = 6
        gt_scale = 1.13
        scaled = scaled_hand_model(hand, gt_scale)
        gt_angles, gt_wrist = _gt_poses(rng, t)
        hand_t = jax.tree.map(lambda x: jnp.broadcast_to(x, (t,) + x.shape), scaled)
        target = skin_landmarks(hand_t, gt_angles, gt_wrist)

        init_angles = gt_angles + jnp.asarray(
            rng.uniform(-0.1, 0.1, (t, 22)), jnp.float32
        )
        res = calibrate_scale_window(
            hand, target, init_angles, gt_wrist, iters=8
        )
        got_scale = float(jnp.exp(res.log_scale))
        np.testing.assert_allclose(got_scale, gt_scale, rtol=5e-3)
        assert float(res.residual) < 0.5

    def test_masked_frames_ignored(self, hand):
        rng = np.random.default_rng(3)
        t = 4
        gt_scale = 0.9
        scaled = scaled_hand_model(hand, gt_scale)
        gt_angles, gt_wrist = _gt_poses(rng, t)
        hand_t = jax.tree.map(lambda x: jnp.broadcast_to(x, (t,) + x.shape), scaled)
        target = np.asarray(skin_landmarks(hand_t, gt_angles, gt_wrist)).copy()
        target[2:] = 1e6  # garbage in masked frames
        mask = jnp.asarray([1.0, 1.0, 0.0, 0.0])
        res = calibrate_scale_window(
            hand, jnp.asarray(target), gt_angles, gt_wrist, frame_mask=mask, iters=8
        )
        got_scale = float(jnp.exp(res.log_scale))
        np.testing.assert_allclose(got_scale, gt_scale, rtol=1e-2)
