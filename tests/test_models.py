"""Network module tests: layer numerics vs torch, FTL semantics, shapes,
masking behavior, and end-to-end jit of both branches."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from absolutetrack_tpu.models import (
    FrameInputs,
    ModelConfig,
    UmeTrackModel,
    init_umetrack_params,
)
from absolutetrack_tpu.models import layers, ftl, fusion, temporal, regressor
from absolutetrack_tpu.models.backbone import backbone_apply, init_backbone
from absolutetrack_tpu.models.umetrack import SkeletonInputs

CFG = ModelConfig()


class TestLayersVsTorch:
    """Conv/pool padding parity with torch -- one of the flagged hard parts
    (stride-2 3x3 convs with padding=1 on even inputs)."""

    @pytest.mark.parametrize("stride,k", [(1, 3), (2, 3), (1, 1), (2, 1)])
    def test_conv2d_matches_torch(self, stride, k):
        import torch
        import torch.nn.functional as F

        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 16, 16, 5)).astype(np.float32)
        w = rng.standard_normal((k, k, 5, 7)).astype(np.float32)
        b = rng.standard_normal(7).astype(np.float32)

        got = np.asarray(
            layers.conv2d({"w": jnp.asarray(w), "b": jnp.asarray(b)}, jnp.asarray(x), stride=stride)
        )
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        wt = torch.from_numpy(w).permute(3, 2, 0, 1)
        want = F.conv2d(xt, wt, torch.from_numpy(b), stride=stride, padding=k // 2)
        want = want.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_maxpool_matches_torch(self):
        import torch
        import torch.nn.functional as F

        rng = np.random.default_rng(1)
        x = rng.standard_normal((2, 12, 12, 3)).astype(np.float32)
        got = np.asarray(layers.max_pool_2x2(jnp.asarray(x)))
        want = (
            F.max_pool2d(torch.from_numpy(x).permute(0, 3, 1, 2), 2, 2)
            .permute(0, 2, 3, 1)
            .numpy()
        )
        np.testing.assert_allclose(got, want, atol=0)


class TestFTL:
    def test_identity_transform_is_noop(self):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((3, 6, 6, 72)), jnp.float32)
        xf = jnp.broadcast_to(jnp.eye(4), (3, 4, 4))
        np.testing.assert_allclose(
            np.asarray(ftl.apply_ftl(xf, x)), np.asarray(x), atol=1e-5
        )

    def test_composition(self):
        """FTL(B) o FTL(A) == FTL(B @ A) at full ratio."""
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((2, 6, 6, 72)), jnp.float32)
        A = np.eye(4, dtype=np.float32)
        A[:3, :3] = np.linalg.qr(rng.standard_normal((3, 3)))[0]
        A[:3, 3] = [0.1, -0.2, 0.3]
        B = np.eye(4, dtype=np.float32)
        B[:3, :3] = np.linalg.qr(rng.standard_normal((3, 3)))[0]
        B[:3, 3] = [-0.3, 0.5, 0.2]
        Aj = jnp.broadcast_to(jnp.asarray(A), (2, 4, 4))
        Bj = jnp.broadcast_to(jnp.asarray(B), (2, 4, 4))
        BA = jnp.broadcast_to(jnp.asarray(B @ A), (2, 4, 4))
        seq = ftl.apply_ftl(Bj, ftl.apply_ftl(Aj, x))
        direct = ftl.apply_ftl(BA, x)
        np.testing.assert_allclose(np.asarray(seq), np.asarray(direct), atol=1e-4)

    def test_nchw_reshape_semantics(self):
        """Channel c, spatial (h, w) maps to axis c // (C/3), point index
        (c % (C/3)) * H * W + h * W + w -- the torch NCHW reshape order
        (reference model_utils.py:57-104)."""
        rng = np.random.default_rng(4)
        n, h, w, c = 1, 2, 3, 6  # C/3 = 2 channels per axis
        x = rng.standard_normal((n, h, w, c)).astype(np.float32)
        xf = np.eye(4, dtype=np.float32)
        xf[:3, 3] = [10.0, 20.0, 30.0]  # pure translation
        got = np.asarray(ftl.apply_ftl(jnp.asarray(xf)[None], jnp.asarray(x)))
        # translation adds t[axis] to every element of that axis group
        want = x.copy()
        for ci in range(c):
            axis = ci // (c // 3)
            want[..., ci] += xf[axis, 3]
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_partial_ratio_passthrough(self):
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.standard_normal((1, 2, 2, 12)), jnp.float32)
        xf = jnp.eye(4).at[0, 3].set(5.0)[None]
        out = np.asarray(ftl.apply_ftl(xf, x, ftl_ratio=0.5))
        np.testing.assert_allclose(out[..., 6:], np.asarray(x)[..., 6:], atol=0)
        assert not np.allclose(out[..., :2], np.asarray(x)[..., :2])


class TestFusion:
    def test_singlev_xfs(self):
        K = np.eye(3, dtype=np.float32)
        K[0, 0] = K[1, 1] = 400.0
        s = np.asarray(fusion.compute_singlev_xfs(jnp.asarray(K)[None]))
        want = np.eye(4)
        want[2, 2] = 2.0
        np.testing.assert_allclose(s[0], want, atol=1e-6)

    def test_multiv_xfs_view0_canonical_roundtrip(self):
        """scaled_to_canonical for view 0 must be the identity when canonical
        = cam0 scaled space: S0^-1 @ xf0 @ inv(xf0) @ S0 = I."""
        rng = np.random.default_rng(6)
        q0, _ = np.linalg.qr(rng.standard_normal((3, 3)))
        q1, _ = np.linalg.qr(rng.standard_normal((3, 3)))
        ext = np.stack([np.eye(4), np.eye(4)]).astype(np.float32)[None]
        ext[0, 0, :3, :3] = q0 * np.sign(np.linalg.det(q0))
        ext[0, 1, :3, :3] = q1 * np.sign(np.linalg.det(q1))
        ext[0, :, :3, 3] = rng.standard_normal((2, 3))
        K = np.broadcast_to(np.eye(3, dtype=np.float32) * [250, 250, 1], (1, 2, 3, 3)).copy()
        s = fusion.compute_singlev_xfs(jnp.asarray(K))
        s2c, c2cam0 = fusion.compute_multiv_xfs(s, jnp.asarray(ext))
        np.testing.assert_allclose(np.asarray(s2c)[0, 0], np.eye(4), atol=1e-5)
        np.testing.assert_allclose(np.asarray(c2cam0)[0], np.asarray(s)[0, 0], atol=1e-6)

    def test_view_mask_selects_single_view_path(self):
        cfg = CFG
        rng = jax.random.PRNGKey(0)
        p = fusion.init_fusion(rng, cfg)
        feats = jax.random.normal(rng, (2, 2, 6, 6, 72))
        K = jnp.broadcast_to(jnp.eye(3) * jnp.asarray([250.0, 250, 1]), (2, 2, 3, 3))
        s = fusion.compute_singlev_xfs(K)
        ext = jnp.broadcast_to(jnp.eye(4), (2, 2, 4, 4))
        mask_single = jnp.asarray([[True, False], [True, False]])
        out = fusion.fuse_views(p, feats, s, ext, mask_single, cfg)
        want = ftl.apply_ftl(s[:, 0], feats[:, 0], cfg.spatial_ftl_ratio)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-5)

    def test_invalid_view_is_zeroed_before_fusion(self):
        """Garbage in an invalid view slot must not leak into fused output of
        multi-view samples of OTHER samples, and single-view selection must
        ignore it entirely."""
        cfg = CFG
        rng = jax.random.PRNGKey(1)
        p = fusion.init_fusion(rng, cfg)
        feats = jax.random.normal(rng, (1, 2, 6, 6, 72))
        garbage = feats.at[:, 1].set(jnp.nan)
        K = jnp.broadcast_to(jnp.eye(3) * jnp.asarray([250.0, 250, 1]), (1, 2, 3, 3))
        s = fusion.compute_singlev_xfs(K)
        ext = jnp.broadcast_to(jnp.eye(4), (1, 2, 4, 4))
        mask = jnp.asarray([[True, False]])
        out = fusion.fuse_views(p, garbage, s, ext, mask, cfg)
        assert np.isfinite(np.asarray(out)).all()


class TestTemporal:
    def test_cold_memory_is_zeroed(self):
        cfg = CFG
        rng = jax.random.PRNGKey(2)
        p = temporal.init_temporal(rng, cfg)
        state = temporal.init_temporal_state(2, cfg)
        # poison the state; use_memory=False must ignore it
        state = temporal.TemporalState(
            mem_features=jnp.full_like(state.mem_features, jnp.nan),
            prev_extrinsics=state.prev_extrinsics,
        )
        img = jax.random.normal(rng, (2, 6, 6, 72))
        ext = jnp.broadcast_to(jnp.eye(4), (2, 4, 4))
        new_state, fused = temporal.temporal_step(
            p, state, img, ext, jnp.asarray([False, False]), cfg
        )
        assert np.isfinite(np.asarray(fused)).all()
        assert np.isfinite(np.asarray(new_state.mem_features)).all()

    def test_memory_reanchoring_identity(self):
        """Same extrinsics both frames -> re-anchor transform is identity, so
        warm memory passes through the FTL unchanged."""
        cfg = CFG
        rng = jax.random.PRNGKey(3)
        p = temporal.init_temporal(rng, cfg)
        img = jax.random.normal(rng, (1, 6, 6, 72))
        ext = jnp.broadcast_to(jnp.eye(4), (1, 4, 4))
        state0 = temporal.init_temporal_state(1, cfg)
        state1, fused1 = temporal.temporal_step(
            p, state0, img, ext, jnp.asarray([False]), cfg
        )
        # second step with use_memory=True and same extrinsics
        state2, fused2 = temporal.temporal_step(
            p, state1, img, ext, jnp.asarray([True]), cfg
        )
        # memory affects output (warm vs cold differ)
        assert not np.allclose(np.asarray(fused1), np.asarray(fused2))
        np.testing.assert_allclose(
            np.asarray(state2.prev_extrinsics), np.asarray(ext), atol=0
        )


class TestRegressor:
    def test_wrist_template_norms(self):
        t = regressor.wrist_rigid_template()
        norms = np.linalg.norm(t, axis=-1)
        np.testing.assert_allclose(norms[0], 0.0, atol=0)
        np.testing.assert_allclose(norms[1:], np.full(6, 0.1), atol=1e-6)

    def test_output_shapes_and_constraints(self):
        cfg = CFG
        rng = jax.random.PRNGKey(4)
        p = regressor.init_regressor(rng, cfg, use_skel=True, predict_skel_scale=False)
        x = jax.random.normal(rng, (3, 6, 6, 76))
        out = regressor.regress_poses(p, x, cfg, predict_skel_scale=False)
        assert out.joint_angles.shape == (3, 22)
        np.testing.assert_allclose(np.asarray(out.joint_angles[:, 20:]), 0.0, atol=0)
        assert out.wrist_xfs.shape == (3, 4, 4)
        r = np.asarray(out.wrist_xfs)[:, :3, :3]
        np.testing.assert_allclose(np.linalg.det(r), np.ones(3), atol=1e-4)
        np.testing.assert_allclose(
            np.einsum("bij,bkj->bik", r, r), np.broadcast_to(np.eye(3), (3, 3, 3)), atol=1e-4
        )
        assert out.skel_scales is None
        assert (np.asarray(out.landmark_uncertainty_sigmas) >= 1e-5).all()

    def test_scale_branch(self):
        cfg = CFG
        rng = jax.random.PRNGKey(5)
        p = regressor.init_regressor(rng, cfg, use_skel=False, predict_skel_scale=True)
        x = jax.random.normal(rng, (2, 6, 6, 72))
        out = regressor.regress_poses(p, x, cfg, predict_skel_scale=True)
        assert out.skel_scales.shape == (2,)
        assert (np.asarray(out.skel_scales) > 0).all()


class TestEndToEnd:
    @pytest.fixture(scope="class")
    def model(self):
        params = init_umetrack_params(jax.random.PRNGKey(0), CFG)
        return UmeTrackModel(params, CFG)

    def _frame(self, b=2, key=0):
        rng = jax.random.PRNGKey(key)
        return FrameInputs(
            left_images=jax.random.uniform(rng, (b, 2, 96, 96)),
            intrinsics=jnp.broadcast_to(
                jnp.eye(3) * jnp.asarray([250.0, 250, 1]), (b, 2, 3, 3)
            ),
            extrinsics=jnp.broadcast_to(jnp.eye(4), (b, 2, 4, 4)),
            view_mask=jnp.ones((b, 2), bool),
            hand_idx=jnp.arange(b) % 2,
            use_memory=jnp.zeros(b, bool),
            sample_mask=jnp.ones(b, bool),
        )

    def test_backbone_output_shape(self):
        p = init_backbone(jax.random.PRNGKey(1), CFG)
        x = jnp.zeros((4, 96, 96, 1))
        out = backbone_apply(p, x, CFG)
        assert out.shape == (4, 6, 6, 72)

    def test_known_skeleton_branch_jits(self, model):
        frame = self._frame()
        skel = SkeletonInputs(
            joint_rotation_axes=jnp.zeros((1, 22, 3)),
            joint_rest_positions=jnp.zeros((1, 22, 3)),
        )
        state = model.init_state(2)

        @jax.jit
        def step(state, frame, skel):
            return model.regress_pose_use_skeleton(state, frame, skel)

        new_state, out = step(state, frame, skel)
        assert out.joint_angles.shape == (2, 22)
        assert out.wrist_xfs.shape == (2, 4, 4)
        assert np.isfinite(np.asarray(out.wrist_xfs)).all()
        assert new_state.mem_features.shape == state.mem_features.shape

    def test_unknown_skeleton_branch_jits(self, model):
        frame = self._frame()
        state = model.init_state(2)
        new_state, out = jax.jit(model.regress_pose_pred_skel_scale)(state, frame)
        assert out.skel_scales.shape == (2,)
        assert np.isfinite(np.asarray(out.skel_scales)).all()

    def test_right_hand_wrist_mirrored(self, model):
        """hand_idx=1 output wrist must equal hand_idx=0 wrist with the x
        column negated (identical inputs otherwise)."""
        frame = self._frame(b=2, key=7)
        # make both samples identical except hand_idx
        imgs = frame.left_images.at[1].set(frame.left_images[0])
        frame = frame._replace(left_images=imgs, hand_idx=jnp.asarray([0, 1]))
        state = model.init_state(2)
        _, out = model.regress_pose_use_skeleton(
            state,
            frame,
            SkeletonInputs(jnp.zeros((1, 22, 3)), jnp.zeros((1, 22, 3))),
        )
        w = np.asarray(out.wrist_xfs)
        want = w[0].copy()
        want[:, 0] *= -1
        np.testing.assert_allclose(w[1], want, atol=1e-5)

    def test_batch_position_invariance(self, model):
        """Results for a sample must not depend on other samples in batch."""
        f2 = self._frame(b=2, key=8)
        f1 = FrameInputs(*[x[0:1] for x in f2])
        state2 = model.init_state(2)
        state1 = model.init_state(1)
        _, out2 = model.regress_pose_use_skeleton(
            state2, f2, SkeletonInputs(jnp.zeros((1, 22, 3)), jnp.zeros((1, 22, 3)))
        )
        _, out1 = model.regress_pose_use_skeleton(
            state1, f1, SkeletonInputs(jnp.zeros((1, 22, 3)), jnp.zeros((1, 22, 3)))
        )
        a, b = np.asarray(out2.joint_angles[0]), np.asarray(out1.joint_angles[0])
        # conv reduction order varies with batch size; allow f32-level slop
        scale = max(np.abs(b).max(), 1.0)
        np.testing.assert_allclose(a / scale, b / scale, atol=1e-4)


class TestAlternateArchitectures:
    """The arch-string parser generalizes like the reference's
    (backbone_resnet.py:169-192): any resnet_layers_XXXX-fN config builds."""

    def test_small_config_builds_and_runs(self):
        cfg = ModelConfig(
            network="resnet_layers_1111-f16",
            n_image_feature_channels=24,
            n_temporal_memory_channels=6,
            input_size=(32, 32),
        )
        params = init_umetrack_params(jax.random.PRNGKey(0), cfg)
        model = UmeTrackModel(params, cfg)
        b = 1
        frame = FrameInputs(
            left_images=jnp.zeros((b, 2, 32, 32)),
            intrinsics=jnp.broadcast_to(
                jnp.eye(3) * jnp.asarray([250.0, 250, 1]), (b, 2, 3, 3)
            ),
            extrinsics=jnp.broadcast_to(jnp.eye(4), (b, 2, 4, 4)),
            view_mask=jnp.ones((b, 2), bool),
            hand_idx=jnp.zeros(b, jnp.int32),
            use_memory=jnp.zeros(b, bool),
            sample_mask=jnp.ones(b, bool),
        )
        state = model.init_state(b)
        state, out = model.regress_pose_use_skeleton(
            state, frame, SkeletonInputs(jnp.zeros((1, 22, 3)), jnp.zeros((1, 22, 3)))
        )
        assert out.joint_angles.shape == (b, 22)
        assert state.mem_features.shape == (b, 2, 2, 6)


class TestServingPrecision:
    """The bf16 serving preset (ModelConfig.serving) must stay close to the
    f32 trunk: same params, same inputs, bounded output drift. Pins the
    serving mode's accuracy budget (wrist translation is in METERS here;
    the tracker multiplies by 1000 -> the mm budget is 1000x these)."""

    def _run(self, cfg, params, frames=3):
        model = UmeTrackModel(params, cfg)
        state = model.init_state(2)
        outs = []
        for k in range(frames):
            frame = TestEndToEnd._frame(TestEndToEnd, b=2, key=k)
            frame = frame._replace(use_memory=jnp.full(2, k > 0))
            skel = SkeletonInputs(
                joint_rotation_axes=0.1 * jnp.ones((1, 22, 3)),
                joint_rest_positions=0.01 * jnp.ones((1, 22, 3)),
            )
            state, out = model.regress_pose_use_skeleton(state, frame, skel)
            outs.append(out)
        return state, outs

    def test_bf16_trunk_drift_bounded(self):
        cfg32 = ModelConfig()
        cfg16 = ModelConfig.serving()
        params = init_umetrack_params(jax.random.PRNGKey(0), cfg32)
        state32, outs32 = self._run(cfg32, params)
        state16, outs16 = self._run(cfg16, params)
        # state pytree dtype must be stable (scan-carry compatible)
        assert state16.mem_features.dtype == state32.mem_features.dtype
        for o32, o16 in zip(outs32, outs16):
            # RELATIVE drift budget 1%: random-init activations are huge
            # (~40 m translations), so the budget scales with magnitude.
            # At real-weight scale (~0.3 m wrists) 1% = 3 mm; the measured
            # relative drift here is ~0.5%.
            t32 = np.asarray(o32.wrist_xfs[:, :3, 3])
            t16 = np.asarray(o16.wrist_xfs[:, :3, 3])
            scale_t = np.abs(t32).max()
            assert np.abs(t32 - t16).max() < 0.01 * scale_t, (
                np.abs(t32 - t16).max(), scale_t
            )
            a32 = np.asarray(o32.joint_angles)
            a16 = np.asarray(o16.joint_angles)
            scale_a = max(np.abs(a32).max(), 1.0)
            assert np.abs(a32 - a16).max() < 0.02 * scale_a
        # outputs must be f32 (decode happens outside the bf16 trunk)
        assert outs16[-1].wrist_xfs.dtype == jnp.float32
