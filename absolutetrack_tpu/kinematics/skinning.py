"""Forward kinematics + linear-blend skinning, fully fused for TPU.

Reproduces the math of the reference's ``lib/common/hand_skinning.py``:
  * per-joint local transform: R = exp([axis * angle]_x),
    t = rest - R @ rest (hand_skinning.py:35-53, via pytorch3d so3_exp_map);
  * per-finger 4-DoF chain keeping the last 3 frames
    (hand_skinning.py:17-32);
  * 17 skinning frames = [root, wrist, 3 per finger x 5]
    (hand_skinning.py:100-127);
  * LBS blend of landmarks with <=3 bone weights (hand_skinning.py:56-97).

TPU-first design: no Python lists of tensors, no scatter. The finger chains
are an unrolled product of 4 matmuls batched over (batch x 5 fingers); the
sparse skinning weights become a dense (21, 17) matrix applied with one
einsum. Everything broadcasts over arbitrary leading batch dims and is
jit/vmap/scan-friendly.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..geometry.affine import matmul
from .hand_model import (
    DOF_PER_FINGER,
    HandModel,
    NUM_DIGITS,
    NUM_JOINT_FRAMES,
    landmark_skinning_matrix,
)


def so3_exp(w: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Rodrigues' rotation formula for axis-angle vectors (..., 3) -> (..., 3, 3).

    R = I + sin(t)/t [w]_x + (1-cos(t))/t^2 [w]_x^2 with Taylor guards at
    t -> 0 (same semantics as pytorch3d's ``so3_exp_map`` used by the
    reference at hand_skinning.py:46).
    """
    theta2 = jnp.sum(w * w, axis=-1)
    small = theta2 < eps
    # Feed the non-taken branch safe values so its *gradient* stays finite
    # (a plain `where` still differentiates both branches; sqrt'(0) = inf).
    theta2_safe = jnp.where(small, jnp.ones_like(theta2), theta2)
    theta = jnp.sqrt(theta2_safe)
    sin_t = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    cos_t = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2_safe)

    x, y, z = w[..., 0], w[..., 1], w[..., 2]
    zero = jnp.zeros_like(x)
    K = jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye + sin_t[..., None, None] * K + cos_t[..., None, None] * matmul(K, K)


def _compose_rt(r1, t1, r2, t2):
    """(R1, t1) . (R2, t2) = (R1 R2, R1 t2 + t1) on (..., 3, 3)/(..., 3)."""
    return matmul(r1, r2), jnp.einsum("...ij,...j->...i", r1, t2) + t1


def _skinning_rt(
    rotation_axes: jnp.ndarray,  # (..., >=20, 3)
    rest_positions: jnp.ndarray,  # (..., >=20, 3)
    joint_angles: jnp.ndarray,  # (..., >=20)
    wrist_transforms: jnp.ndarray,  # (..., 4, 4)
):
    """The 17 skinning frames as (rot (..., 17, 3, 3), trans (..., 17, 3)).

    Frame order matches the reference (hand_skinning.py:100-127):
    [root, wrist, f0_frame2, f0_frame3, f0_frame4, f1_frame2, ...] where a
    finger's frames are cumulative products of its 4 local joint transforms,
    keeping products of length 2, 3 and 4. Only the first 20 joint angles
    participate; the trailing 2 wrist DoFs are carried by
    ``wrist_transforms``.

    The whole chain composes (R, t) pairs instead of homogeneous 4x4s: the
    bottom row is constant, 3x3 matmuls are cheaper, and -- decisive on
    TPU -- building 4x4s from R/t blocks lowers to scatters over
    tiny-minor-dim tiled arrays that XLA:TPU executes painfully slowly
    (profiled at ~2.6 ms per 128-frame batched step before this refactor).
    """
    n20 = NUM_DIGITS * DOF_PER_FINGER
    w = rotation_axes[..., :n20, :] * joint_angles[..., :n20, None]
    rot = so3_exp(w)  # (..., 20, 3, 3) local joint rotations
    rest = rest_positions[..., :n20, :]
    trans = rest - jnp.einsum("...ij,...j->...i", rot, rest)

    batch = rot.shape[:-3]
    # (..., 5, 4, 3, 3) / (..., 5, 4, 3): per-finger local transforms
    r_f = rot.reshape(batch + (NUM_DIGITS, DOF_PER_FINGER, 3, 3))
    t_f = trans.reshape(batch + (NUM_DIGITS, DOF_PER_FINGER, 3))

    rw = wrist_transforms[..., None, :3, :3]  # broadcast over fingers
    tw = wrist_transforms[..., None, :3, 3]
    r01, t01 = _compose_rt(rw, tw, r_f[..., 0, :, :], t_f[..., 0, :])
    r2, t2 = _compose_rt(r01, t01, r_f[..., 1, :, :], t_f[..., 1, :])
    r3, t3 = _compose_rt(r2, t2, r_f[..., 2, :, :], t_f[..., 2, :])
    r4, t4 = _compose_rt(r3, t3, r_f[..., 3, :, :], t_f[..., 3, :])
    finger_r = jnp.stack([r2, r3, r4], axis=-3)  # (..., 5, 3, 3, 3)
    finger_r = finger_r.reshape(batch + (NUM_DIGITS * 3, 3, 3))
    finger_t = jnp.stack([t2, t3, t4], axis=-2).reshape(batch + (NUM_DIGITS * 3, 3))

    rw2 = jnp.broadcast_to(
        wrist_transforms[..., None, :3, :3], batch + (2, 3, 3)
    )
    tw2 = jnp.broadcast_to(wrist_transforms[..., None, :3, 3], batch + (2, 3))
    return (
        jnp.concatenate([rw2, finger_r], axis=-3),
        jnp.concatenate([tw2, finger_t], axis=-2),
    )


def skinning_transforms(
    rotation_axes: jnp.ndarray,  # (..., >=20, 3)
    rest_positions: jnp.ndarray,  # (..., >=20, 3)
    joint_angles: jnp.ndarray,  # (..., >=20)
    wrist_transforms: jnp.ndarray,  # (..., 4, 4)
) -> jnp.ndarray:
    """The 17 skinning frames (..., 17, 4, 4) (see ``_skinning_rt``)."""
    r, t = _skinning_rt(
        rotation_axes, rest_positions, joint_angles, wrist_transforms
    )
    top = jnp.concatenate([r, t[..., None]], axis=-1)  # (..., 17, 3, 4)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], r.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def skin_points(
    hand: HandModel,
    skin_matrix: jnp.ndarray,  # (..., V, 17)
    points: jnp.ndarray,  # (..., V, 3)
    joint_angles: jnp.ndarray,  # (..., 22)
    wrist_transforms: jnp.ndarray,  # (..., 4, 4)
) -> jnp.ndarray:
    """LBS: blend the 17 frame transforms per point -> (..., V, 3).

    out_v = sum_f skin[v,f] * (R_f @ p_v + t_f) (reference
    hand_skinning.py:56-67 via _lbs + _get_skinned_vertices, fused here into
    two einsums feeding the MXU -- the (R, t) split avoids homogeneous 4x4
    assembly, see ``_skinning_rt``).
    """
    r, t = _skinning_rt(
        hand.joint_rotation_axes,
        hand.joint_rest_positions,
        joint_angles,
        wrist_transforms,
    )
    blended = jnp.einsum(
        "...vf,...fij,...vj->...vi",
        skin_matrix,
        r,
        points,
        precision="highest",
    ) + jnp.einsum("...vf,...fi->...vi", skin_matrix, t, precision="highest")
    return blended


def skin_landmarks(
    hand: HandModel,
    joint_angles: jnp.ndarray,  # (..., 22)
    wrist_transforms: jnp.ndarray,  # (..., 4, 4)
) -> jnp.ndarray:
    """21 world-space landmarks for the given pose (..., 21, 3).

    Public equivalent of reference ``skin_landmarks``
    (hand_skinning.py:189-209).
    """
    skin_mat = landmark_skinning_matrix(hand)
    return skin_points(
        hand, skin_mat, hand.landmark_rest_positions, joint_angles, wrist_transforms
    )


def skin_mesh_vertices(
    hand: HandModel,
    joint_angles: jnp.ndarray,  # (..., 22)
    wrist_transforms: jnp.ndarray,  # (..., 4, 4)
) -> jnp.ndarray:
    """Skinned 788-vertex mesh for the given pose (..., 788, 3).

    Same LBS blend as the landmarks but over the dense per-vertex
    (788, 17) weight matrix the model ships (reference
    lib/common/hand.py:48-76 ``dense_bone_weights`` /
    hand_skinning.py:130-186 ``skin_vertices``).
    """
    assert hand.mesh_vertices is not None, "hand model carries no mesh"
    assert hand.dense_bone_weights is not None
    return skin_points(
        hand,
        hand.dense_bone_weights,
        hand.mesh_vertices,
        joint_angles,
        wrist_transforms,
    )


def mesh_from_hand_pose(
    hand: HandModel,
    joint_angles: jnp.ndarray,
    wrist_transform: jnp.ndarray,
    hand_idx: jnp.ndarray,
) -> jnp.ndarray:
    """World mesh vertices with the right-hand wrist mirror applied.

    Mesh analogue of ``landmarks_from_hand_pose``: the stored mesh is
    left-canonical; right hands reflect via the flipped wrist x column
    (reference lib/tracker/perspective_crop.py:40-51).
    """
    xf = wrist_transform.at[..., :, 0].multiply(
        jnp.where(jnp.asarray(hand_idx) == 1, -1.0, 1.0)[..., None]
    )
    return skin_mesh_vertices(hand, joint_angles, xf)


def landmarks_from_hand_pose(
    hand: HandModel,
    joint_angles: jnp.ndarray,
    wrist_transform: jnp.ndarray,
    hand_idx: jnp.ndarray,
) -> jnp.ndarray:
    """World landmarks with the right-hand wrist mirror applied.

    The model stores left hands only; for right hands the wrist transform's x
    column flips sign before FK (reference
    lib/tracker/perspective_crop.py:40-51).
    """
    xf = wrist_transform.at[..., :, 0].multiply(
        jnp.where(jnp.asarray(hand_idx) == 1, -1.0, 1.0)[..., None]
    )
    return skin_landmarks(hand, joint_angles, xf)
