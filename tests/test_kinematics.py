"""FK/LBS and metric tests against independent NumPy oracles.

The FK oracle below is an independent, loop-based NumPy implementation of
the documented UmeTrack kinematic structure (axis-angle joints, 4-DoF finger
chains keeping frames 2..4, 17 skinning frames, <=3-bone LBS). The JAX
implementation must agree on the real generic hand model at random poses.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from absolutetrack_tpu.kinematics import (
    HandModel,
    hand_model,
    metrics,
    skinning,
)
from absolutetrack_tpu.kinematics.hand_model import (
    landmark_skinning_matrix,
    load_hand_model_json,
    mirrored_hand_model,
    scaled_hand_model,
)

GENERIC = "/root/reference/dataset/generic_hand_model.json"
GOLDEN_NPY = "/root/reference/sample_data/user05/recording_00.npy"


@pytest.fixture(scope="module")
def hand():
    return load_hand_model_json(GENERIC)


def _np_rodrigues(w):
    t = np.linalg.norm(w)
    if t < 1e-10:
        return np.eye(3)
    k = w / t
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(t) * K + (1 - np.cos(t)) * (K @ K)


def _np_fk_landmarks(hand_np, joint_angles, wrist):
    """Independent loop-based FK oracle."""
    axes = hand_np["joint_rotation_axes"]
    rests = hand_np["joint_rest_positions"]
    # local transforms for the 20 finger joints
    locals_ = []
    for j in range(20):
        R = _np_rodrigues(axes[j] * joint_angles[j])
        t = rests[j] - R @ rests[j]
        m = np.eye(4)
        m[:3, :3] = R
        m[:3, 3] = t
        locals_.append(m)
    frames = [wrist.copy(), wrist.copy()]  # root + wrist
    for f in range(5):
        chain = wrist.copy()
        finger_frames = []
        for k in range(4):
            chain = chain @ locals_[4 * f + k]
            finger_frames.append(chain.copy())
        frames.extend(finger_frames[1:])  # keep frames after joints 2,3,4
    frames = np.stack(frames)  # (17,4,4)

    lm_rest = hand_np["landmark_rest_positions"]
    bone_idx = hand_np["landmark_rest_bone_indices"].astype(int)
    bone_w = hand_np["landmark_rest_bone_weights"]
    out = np.zeros((21, 3))
    for v in range(21):
        p = np.concatenate([lm_rest[v], [1.0]])
        acc = np.zeros(4)
        for k in range(bone_idx.shape[1]):
            wgt = bone_w[v, k]
            if wgt != 0:
                acc += wgt * (frames[bone_idx[v, k]] @ p)
        out[v] = acc[:3]
    return out


def _hand_np(hand):
    return {f: np.asarray(getattr(hand, f)) for f in HandModel._fields if getattr(hand, f) is not None}


class TestSkinning:
    def test_zero_pose_identity_wrist_gives_rest_landmarks(self, hand):
        lm = skinning.skin_landmarks(
            hand, jnp.zeros(22), jnp.eye(4)
        )
        np.testing.assert_allclose(
            np.asarray(lm), np.asarray(hand.landmark_rest_positions), atol=1e-5
        )

    def test_zero_pose_rigid_wrist(self, hand):
        rng = np.random.default_rng(0)
        q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
        q *= np.sign(np.linalg.det(q))
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = q
        T[:3, 3] = [10, 20, 30]
        lm = np.asarray(skinning.skin_landmarks(hand, jnp.zeros(22), jnp.asarray(T)))
        rest = np.asarray(hand.landmark_rest_positions)
        want = rest @ q.T + T[:3, 3]
        np.testing.assert_allclose(lm, want, atol=1e-4)

    def test_matches_numpy_oracle_random_poses(self, hand):
        rng = np.random.default_rng(1)
        hn = _hand_np(hand)
        for seed in range(5):
            angles = rng.uniform(-1.0, 1.0, 22).astype(np.float32)
            q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
            q *= np.sign(np.linalg.det(q))
            T = np.eye(4)
            T[:3, :3] = q
            T[:3, 3] = rng.uniform(-100, 100, 3)
            want = _np_fk_landmarks(hn, angles, T)
            got = np.asarray(
                skinning.skin_landmarks(
                    hand, jnp.asarray(angles), jnp.asarray(T, jnp.float32)
                )
            )
            np.testing.assert_allclose(got, want, atol=5e-3)

    def test_wrist_angles_ignored(self, hand):
        """Joints 20,21 (wrist DoFs) must not affect FK (reference uses [:20])."""
        rng = np.random.default_rng(2)
        angles = rng.uniform(-1, 1, 22).astype(np.float32)
        a2 = angles.copy()
        a2[20:] = 7.7
        lm1 = skinning.skin_landmarks(hand, jnp.asarray(angles), jnp.eye(4))
        lm2 = skinning.skin_landmarks(hand, jnp.asarray(a2), jnp.eye(4))
        np.testing.assert_allclose(np.asarray(lm1), np.asarray(lm2), atol=0)

    def test_batched_matches_loop(self, hand):
        rng = np.random.default_rng(3)
        B = 6
        angles = rng.uniform(-1, 1, (B, 22)).astype(np.float32)
        T = np.broadcast_to(np.eye(4, dtype=np.float32), (B, 4, 4)).copy()
        T[:, :3, 3] = rng.uniform(-50, 50, (B, 3))
        hand_b = jnp.broadcast_to  # noqa
        import jax

        hand_batched = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (B,) + x.shape), hand
        )
        got = np.asarray(
            skinning.skin_landmarks(hand_batched, jnp.asarray(angles), jnp.asarray(T))
        )
        for i in range(B):
            single = np.asarray(
                skinning.skin_landmarks(hand, jnp.asarray(angles[i]), jnp.asarray(T[i]))
            )
            np.testing.assert_allclose(got[i], single, atol=1e-4)

    def test_mirrored_model_mirrors_landmarks(self, hand):
        """Mirrored model + mirrored wrist -> x-negated landmarks."""
        rng = np.random.default_rng(4)
        angles = jnp.asarray(rng.uniform(-1, 1, 22), jnp.float32)
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [5, -3, 8]
        mirrored = mirrored_hand_model(hand, jnp.asarray(True))
        Tm = T.copy()
        # conjugate by diag(-1,1,1): flips column 0 then row 0
        Tm[:, 0] *= -1
        Tm[0, :] *= -1
        lm = np.asarray(skinning.skin_landmarks(hand, angles, jnp.asarray(T)))
        lm_m = np.asarray(skinning.skin_landmarks(mirrored, angles, jnp.asarray(Tm)))
        want = lm * np.array([-1.0, 1.0, 1.0])
        np.testing.assert_allclose(lm_m, want, atol=1e-3)

    def test_landmarks_from_hand_pose_right_hand(self, hand):
        rng = np.random.default_rng(5)
        angles = jnp.asarray(rng.uniform(-1, 1, 22), jnp.float32)
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [5, -3, 8]
        left = skinning.landmarks_from_hand_pose(hand, angles, jnp.asarray(T), 0)
        np.testing.assert_allclose(
            np.asarray(left),
            np.asarray(skinning.skin_landmarks(hand, angles, jnp.asarray(T))),
            atol=0,
        )
        # right hand: x column of wrist negated before FK
        T_flip = T.copy()
        T_flip[:, 0] *= -1
        right = skinning.landmarks_from_hand_pose(hand, angles, jnp.asarray(T), 1)
        np.testing.assert_allclose(
            np.asarray(right),
            np.asarray(skinning.skin_landmarks(hand, angles, jnp.asarray(T_flip))),
            atol=0,
        )

    def test_scaled_model(self, hand):
        s = scaled_hand_model(hand, 1.1)
        lm = np.asarray(skinning.skin_landmarks(s, jnp.zeros(22), jnp.eye(4)))
        np.testing.assert_allclose(
            lm, 1.1 * np.asarray(hand.landmark_rest_positions), atol=1e-4
        )

    def test_skinning_matrix_rows_sum_to_one(self, hand):
        sm = np.asarray(landmark_skinning_matrix(hand))
        assert sm.shape == (21, 17)
        np.testing.assert_allclose(sm.sum(-1), np.ones(21), atol=1e-5)

    def test_so3_exp_small_angle(self):
        w = jnp.asarray([1e-10, -1e-10, 1e-10])
        R = np.asarray(skinning.so3_exp(w))
        np.testing.assert_allclose(R, np.eye(3), atol=1e-8)
        # gradient must be finite at zero
        import jax

        g = jax.grad(lambda w: jnp.sum(skinning.so3_exp(w)))(jnp.zeros(3))
        assert np.isfinite(np.asarray(g)).all()


class TestMetrics:
    def test_golden_fixture_metrics_match_numpy(self):
        d = np.load(GOLDEN_NPY, allow_pickle=True)
        if isinstance(d, np.ndarray):
            d = d.tolist()
        gt = d["gt_keypoints"]  # (2, T, 21, 3)
        tr = d["tracked_keypoints"]
        valid = d["valid_tracking"]

        err = np.asarray(metrics.mpjpe(jnp.asarray(gt), jnp.asarray(tr)))
        want_err = np.linalg.norm(gt - tr, axis=-1).mean(-1)
        np.testing.assert_allclose(err, want_err, rtol=1e-5)

        mean_err = float(metrics.masked_mean(jnp.asarray(err), jnp.asarray(valid)))
        np.testing.assert_allclose(mean_err, want_err[valid].mean(), rtol=1e-5)

        acc = np.asarray(metrics.keypoint_acceleration(jnp.asarray(tr)))
        want_acc = np.linalg.norm(
            tr[:, :-2] + tr[:, 2:] - 2 * tr[:, 1:-1], axis=-1
        ).mean(-1)
        np.testing.assert_allclose(acc, want_acc, rtol=1e-4)

    def test_pck_auc_against_numpy(self):
        rng = np.random.default_rng(6)
        errors = rng.uniform(0, 60, 1000).astype(np.float32)
        th = metrics.PCK_THRESHOLDS
        curve = np.asarray(metrics.pck_curve(jnp.asarray(errors), th))
        want = np.stack([(errors <= t).mean() for t in th])
        np.testing.assert_allclose(curve, want, atol=1e-6)
        auc = float(metrics.normalized_auc(th, jnp.asarray(curve)))
        want_auc = np.trapezoid(want, th) / (th[-1] - th[0])
        np.testing.assert_allclose(auc, want_auc, rtol=1e-5)

    def test_pck_respects_mask(self):
        errors = jnp.asarray([1.0, 100.0, 2.0, 100.0])
        mask = jnp.asarray([True, False, True, False])
        curve = np.asarray(metrics.pck_curve(errors, [10.0], mask))
        np.testing.assert_allclose(curve, [1.0])
