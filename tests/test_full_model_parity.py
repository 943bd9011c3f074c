"""FULL composed model parity: torch twin vs the JAX model.

test_weight_parity.py proves each module individually; this file composes
the same torch modules into the complete reference forwards --
FTL into canonical space, multi-view fusion, ConvRNN memory re-anchoring
across frames (including a lost-track revival), SVD Procrustes wrist
decode, world wrist recovery with the right-hand x mirror
(/root/reference/lib/models/umetrack_model.py:100-242,
feature_extractor.py:61-141, temporal.py:51-139) -- and asserts the JAX
model run through the converted weights agrees over a multi-frame stereo
sequence, a mixed 1-view/2-view batch (umetrack_model.py:149-166), and
the unknown-skeleton scale branch. This is the oracle that catches
composition-wiring bugs per-module tests cannot.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from absolutetrack_tpu.models import ModelConfig, UmeTrackModel  # noqa: E402
from absolutetrack_tpu.models.umetrack import FrameInputs, SkeletonInputs  # noqa: E402
from absolutetrack_tpu.models.regressor import wrist_rigid_template  # noqa: E402
from absolutetrack_tpu.models.weights import convert_torch_state_dict  # noqa: E402

from test_weight_parity import _build_torch_tree  # noqa: E402

CFG = ModelConfig()
MEM = CFG.n_temporal_memory_channels


# ---------------------------------------------------------------------------
# torch twin: the reference forward semantics, written functionally
# ---------------------------------------------------------------------------


def t_ftl(xfs, maps):
    """FTL at ratio 1.0: channels as 3D point coords, NCHW element order
    (reference model_utils.py:57-104)."""
    n = maps.shape[0]
    pts = maps.reshape(n, 3, -1)
    out = xfs[:, :3, :3] @ pts + xfs[:, :3, 3].unsqueeze(-1)
    return out.reshape(maps.shape)


def t_singlev_xfs(intr):
    """(N, 3, 3) -> (N, 4, 4) scale factor with S[2,2]=f/200
    (model_utils.py:166-192)."""
    n = intr.shape[0]
    s = torch.eye(4).unsqueeze(0).repeat(n, 1, 1)
    s[:, 2, 2] = intr[:, 0, 0] / 200.0
    return s


def t_multiv_features(tree, feats, sxfs, extr):
    """Canonical-space fusion of (B, 2, C, h, w) per-view features
    (feature_extractor.py:96-141, canonical = cam0 scaled space)."""
    b, v = feats.shape[:2]
    xf0 = extr[:, 0:1]
    xf_to_world = torch.inverse(extr) @ sxfs
    canonical_to_cam0 = sxfs[:, 0]
    s0_inv = torch.inverse(sxfs[:, 0:1])
    scaled_to_canonical = s0_inv @ xf0 @ xf_to_world
    canon = t_ftl(scaled_to_canonical.reshape(-1, 4, 4), feats.flatten(0, 1)).reshape(
        feats.shape
    )
    fused = tree._feature_extractor._multi_view_fusion(canon.flatten(1, 2))
    return t_ftl(canonical_to_cam0, fused)


def t_singlev_features(tree, feats, sxfs):
    """Single-view path: FTL with the scale factor only
    (feature_extractor.py:89-94)."""
    return t_ftl(sxfs, feats)


def t_temporal(tree, state, img_feats, cur_ext, use_memory):
    """ConvRNN step with explicit (mem, prev_ext) state.

    Semantics of reference temporal.py:51-139 on fixed slots: zero the
    memory of non-use slots, FTL the rest by cur_cam0 @ inv(prev_cam0),
    run the 1x1 stack on concat([mem | img]), split new memory / fused.
    """
    mem, prev = state
    um = use_memory[:, None, None, None]
    mem = torch.where(um, mem, torch.zeros_like(mem))
    prev_safe = torch.where(
        use_memory[:, None, None], prev, torch.eye(4).expand_as(prev)
    )
    rel = cur_ext @ torch.inverse(prev_safe)
    mem_x = t_ftl(rel, mem)
    mem_x = torch.where(um, mem_x, torch.zeros_like(mem_x))
    out = tree._temporal._temporal_module(torch.cat([mem_x, img_feats], dim=1))
    return (out[:, :MEM].clone(), cur_ext.clone()), out[:, MEM:]


def t_procrustes(from_pts, to_pts):
    """Batched SVD rigid fit with det reflection fix-up
    (model_utils.py:17-54)."""
    b = from_pts.shape[0]
    fm = from_pts.mean(dim=1)
    tm = to_pts.mean(dim=1)
    h = (from_pts - fm.unsqueeze(1)).transpose(1, 2) @ (to_pts - tm.unsqueeze(1))
    u, s, vh = torch.linalg.svd(h)
    v = vh.transpose(1, 2)
    det = torch.det(v @ u.transpose(1, 2))
    w = torch.diag_embed(torch.stack([torch.ones_like(det), torch.ones_like(det), det], -1))
    r = v @ w @ u.transpose(1, 2)
    xf = torch.eye(4).unsqueeze(0).repeat(b, 1, 1)
    xf[:, :3, :3] = r
    xf[:, :3, 3] = tm - (r @ fm.unsqueeze(-1)).squeeze(-1)
    return xf


def t_regress(tree, feats, branch):
    """Head + decoders (regressor.py:50-121, index ranges in insertion
    order: angles 20 | wrist 21 | [scale 1] | sigmas 21)."""
    head = (tree._regressor_k if branch == "known" else tree._regressor_u)
    raw = head._pose_regression_layers(feats).flatten(1)
    b = raw.shape[0]
    angles = torch.cat([raw[:, :20], torch.zeros(b, 2)], dim=1)
    tmpl = torch.from_numpy(wrist_rigid_template()).float()
    wrist = t_procrustes(tmpl.unsqueeze(0).expand(b, 7, 3), raw[:, 20:41].reshape(b, 7, 3))
    if branch == "known":
        scale = None
        sig = torch.clamp(torch.nn.functional.softplus(raw[:, 41:62]), min=1e-5)
    else:
        scale = torch.exp(raw[:, 41])
        sig = torch.clamp(torch.nn.functional.softplus(raw[:, 42:63]), min=1e-5)
    return angles, wrist, scale, sig


def t_recover_world(hand_idx, cam0_ext, wrist_cam0):
    """inv(cam0) @ wrist then mirror x column for right hands
    (umetrack_model.py:77-90)."""
    world = torch.inverse(cam0_ext) @ wrist_cam0
    world[hand_idx == 1, :, 0] *= -1
    return world


def t_forward_frame(tree, state, images, intr, extr, view_mask, use_memory,
                    hand_idx, skel=None, branch="known"):
    """One full frame through the torch twin.

    images (B, V, H, W); view_mask (B, V) bool decides single/multi view
    per sample (the reference's ragged sample_range, umetrack_model.py:
    123-168, realized on fixed slots).
    """
    b, v = images.shape[:2]
    with torch.no_grad():
        feats = tree._feature_extractor._image_backbone(
            images.reshape(b * v, 1, *images.shape[2:])
        )
        c, fh, fw = feats.shape[1:]
        feats = feats.reshape(b, v, c, fh, fw)
        sxfs = t_singlev_xfs(intr.reshape(-1, 3, 3)).reshape(b, v, 4, 4)

        rows = []
        for i in range(b):
            if bool(view_mask[i, 1]):
                rows.append(
                    t_multiv_features(
                        tree, feats[i : i + 1], sxfs[i : i + 1], extr[i : i + 1]
                    )
                )
            else:
                rows.append(t_singlev_features(tree, feats[i, 0:1], sxfs[i, 0:1]))
        img_features = torch.cat(rows, dim=0)

        state, tfeat = t_temporal(tree, state, img_features, extr[:, 0], use_memory)

        if branch == "known":
            skel_feats = torch.cat(
                [torch.from_numpy(skel[0]), torch.from_numpy(skel[1])], dim=-1
            ).reshape(1, -1)
            sf = tree._skeleton_enc._layers(skel_feats)
            sf = sf.expand(b, *sf.shape[1:])
            x = torch.cat([tfeat, sf], dim=1)
        else:
            x = tfeat
        angles, wrist, scale, sig = t_regress(tree, x, branch)
        wrist = t_recover_world(hand_idx, extr[:, 0], wrist)
    return state, (angles, wrist, scale, sig)


# ---------------------------------------------------------------------------
# shared inputs
# ---------------------------------------------------------------------------


def _rot(axis, angle):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    k = np.array(
        [[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]]
    )
    return np.eye(3) + np.sin(angle) * k + (1 - np.cos(angle)) * (k @ k)


def _rigid(rng):
    xf = np.eye(4, dtype=np.float32)
    xf[:3, :3] = _rot(rng.uniform(-1, 1, 3), rng.uniform(-0.5, 0.5)).astype(np.float32)
    xf[:3, 3] = rng.uniform(-0.3, 0.3, 3).astype(np.float32)
    return xf


def _make_sequence(t=4, b=2, v=2, seed=7):
    rng = np.random.default_rng(seed)
    images = rng.uniform(0, 1, (t, b, v, 96, 96)).astype(np.float32)
    intr = np.broadcast_to(np.eye(3, dtype=np.float32), (t, b, v, 3, 3)).copy()
    intr[..., 0, 0] = intr[..., 1, 1] = rng.uniform(150, 350, (t, b, v))
    intr[..., 0, 2] = 47.5
    intr[..., 1, 2] = 47.5
    extr = np.stack(
        [[[_rigid(rng) for _ in range(v)] for _ in range(b)] for _ in range(t)]
    ).astype(np.float32)
    skel = (
        rng.standard_normal((1, 22, 3)).astype(np.float32) * 0.3,
        rng.standard_normal((1, 22, 3)).astype(np.float32) * 0.02,
    )
    return images, intr, extr, skel


@pytest.fixture(scope="module")
def twin():
    tree = _build_torch_tree()
    params = jax.tree.map(
        jnp.asarray, convert_torch_state_dict(tree.state_dict(), CFG)
    )
    return tree, UmeTrackModel(params, CFG)


def _jax_frame(images, intr, extr, view_mask, use_memory, hand_idx):
    return FrameInputs(
        left_images=jnp.asarray(images * view_mask[:, :, None, None]),
        intrinsics=jnp.asarray(intr),
        extrinsics=jnp.asarray(extr),
        view_mask=jnp.asarray(view_mask),
        hand_idx=jnp.asarray(hand_idx),
        use_memory=jnp.asarray(use_memory),
        sample_mask=jnp.ones(images.shape[0], bool),
    )


def _landmark_mm(labels_hand_m, hand_idx, angles_a, wrist_a, angles_b, wrist_b):
    """FK both outputs through the same hand model -> max landmark delta (mm)."""
    from absolutetrack_tpu.kinematics.skinning import landmarks_from_hand_pose

    b = angles_a.shape[0]
    hand_b = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (b,) + x.shape), labels_hand_m
    )
    la = landmarks_from_hand_pose(
        hand_b, jnp.asarray(angles_a), jnp.asarray(wrist_a), jnp.asarray(hand_idx)
    )
    lb = landmarks_from_hand_pose(
        hand_b, jnp.asarray(angles_b), jnp.asarray(wrist_b), jnp.asarray(hand_idx)
    )
    return float(jnp.max(jnp.linalg.norm(la - lb, axis=-1))) * 1000.0


@pytest.fixture(scope="module")
def hand_model_m():
    from absolutetrack_tpu.kinematics.hand_model import scaled_hand_model
    from absolutetrack_tpu.tracker.video_data import load_labels

    labels = load_labels("/root/reference/sample_data/user05/recording_00.json")
    return scaled_hand_model(labels.hand_model, 0.001)


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


class TestFullModelParity:
    def test_known_skeleton_sequence(self, twin, hand_model_m):
        """4-frame stereo sequence with a lost-track revival at t=2."""
        tree, model = twin
        t, b, v = 4, 2, 2
        images, intr, extr, skel = _make_sequence(t, b, v)
        hand_idx = np.array([0, 1])
        # t0: cold start; t2: hand 1 lost track -> memory must zero-revive
        use_memory = np.array(
            [[False, False], [True, True], [True, False], [True, True]]
        )
        view_mask = np.ones((b, v), bool)

        t_state = (torch.zeros(b, MEM, 6, 6), torch.zeros(b, 4, 4))
        j_state = model.init_state(b)
        skel_j = SkeletonInputs(jnp.asarray(skel[0]), jnp.asarray(skel[1]))
        step = jax.jit(model.regress_pose_use_skeleton)

        for ti in range(t):
            t_state, (ta, tw, _, ts) = t_forward_frame(
                tree, t_state,
                torch.from_numpy(images[ti]), torch.from_numpy(intr[ti]),
                torch.from_numpy(extr[ti]), view_mask, torch.from_numpy(use_memory[ti]),
                torch.from_numpy(hand_idx), skel, "known",
            )
            frame = _jax_frame(images[ti], intr[ti], extr[ti], view_mask,
                               use_memory[ti], hand_idx)
            j_state, out = step(j_state, frame, skel_j)

            np.testing.assert_allclose(
                np.asarray(out.joint_angles), ta.numpy(), atol=2e-4,
                err_msg=f"frame {ti} joint angles",
            )
            np.testing.assert_allclose(
                np.asarray(out.wrist_xfs), tw.numpy(), atol=5e-4,
                err_msg=f"frame {ti} wrist",
            )
            np.testing.assert_allclose(
                np.asarray(out.landmark_uncertainty_sigmas), ts.numpy(), atol=1e-4,
                err_msg=f"frame {ti} sigmas",
            )
            # memory parity feeds the NEXT frame; check it directly too
            np.testing.assert_allclose(
                np.moveaxis(np.asarray(j_state.mem_features), -1, 1),
                t_state[0].numpy(), atol=2e-4, err_msg=f"frame {ti} memory",
            )
            mm = _landmark_mm(
                hand_model_m, hand_idx,
                np.asarray(out.joint_angles), np.asarray(out.wrist_xfs),
                ta.numpy(), tw.numpy(),
            )
            assert mm < 0.5, f"frame {ti}: landmark delta {mm:.3f} mm"

    def test_mixed_view_batch(self, twin, hand_model_m):
        """Hand 0 stereo, hand 1 single-view: the reference's ragged
        sample_range path (umetrack_model.py:149-166) vs our masked
        single-view selection."""
        tree, model = twin
        b, v = 2, 2
        images, intr, extr, skel = _make_sequence(1, b, v, seed=11)
        hand_idx = np.array([0, 1])
        use_memory = np.zeros(b, bool)
        view_mask = np.array([[True, True], [True, False]])

        t_state = (torch.zeros(b, MEM, 6, 6), torch.zeros(b, 4, 4))
        _, (ta, tw, _, ts) = t_forward_frame(
            tree, t_state,
            torch.from_numpy(images[0]), torch.from_numpy(intr[0]),
            torch.from_numpy(extr[0]), view_mask,
            torch.from_numpy(use_memory), torch.from_numpy(hand_idx), skel, "known",
        )
        frame = _jax_frame(images[0], intr[0], extr[0], view_mask, use_memory, hand_idx)
        skel_j = SkeletonInputs(jnp.asarray(skel[0]), jnp.asarray(skel[1]))
        _, out = jax.jit(model.regress_pose_use_skeleton)(
            model.init_state(b), frame, skel_j
        )

        np.testing.assert_allclose(np.asarray(out.joint_angles), ta.numpy(), atol=2e-4)
        np.testing.assert_allclose(np.asarray(out.wrist_xfs), tw.numpy(), atol=5e-4)
        mm = _landmark_mm(
            hand_model_m, hand_idx,
            np.asarray(out.joint_angles), np.asarray(out.wrist_xfs),
            ta.numpy(), tw.numpy(),
        )
        assert mm < 0.5, f"landmark delta {mm:.3f} mm"

    def test_unknown_skeleton_branch(self, twin):
        """Scale-prediction branch over 2 frames (all multiview,
        umetrack_model.py:221-242)."""
        tree, model = twin
        t, b, v = 2, 2, 2
        images, intr, extr, _ = _make_sequence(t, b, v, seed=13)
        hand_idx = np.array([0, 1])
        view_mask = np.ones((b, v), bool)
        use_memory = np.array([[False, False], [True, True]])

        t_state = (torch.zeros(b, MEM, 6, 6), torch.zeros(b, 4, 4))
        j_state = model.init_state(b)
        step = jax.jit(model.regress_pose_pred_skel_scale)
        for ti in range(t):
            t_state, (ta, tw, tscale, _) = t_forward_frame(
                tree, t_state,
                torch.from_numpy(images[ti]), torch.from_numpy(intr[ti]),
                torch.from_numpy(extr[ti]), view_mask,
                torch.from_numpy(use_memory[ti]), torch.from_numpy(hand_idx),
                None, "unknown",
            )
            frame = _jax_frame(images[ti], intr[ti], extr[ti], view_mask,
                               use_memory[ti], hand_idx)
            j_state, out = step(j_state, frame)
            np.testing.assert_allclose(
                np.asarray(out.joint_angles), ta.numpy(), atol=2e-4,
                err_msg=f"frame {ti}",
            )
            np.testing.assert_allclose(
                np.asarray(out.skel_scales), tscale.numpy(), rtol=2e-4,
                err_msg=f"frame {ti} scale",
            )
            np.testing.assert_allclose(
                np.asarray(out.wrist_xfs), tw.numpy(), atol=5e-4,
                err_msg=f"frame {ti} wrist",
            )
