"""Batched Gauss-Newton kinematic fitting with Schur-complement reduction.

The reference regresses poses with a network only; its unknown-skeleton
calibration is a plain mean of per-frame scale predictions
(run_eval_unknown_skeleton.py:68-74). This module provides the solver
upgrade from BASELINE.json's north star:

  * ``fit_pose``: per-sample Gauss-Newton refinement of (20 finger DoFs +
    6 wrist DoFs) against target 3D landmarks, batched over samples --
    each iteration builds the (26 x 26) normal equations from the FK
    Jacobian (computed by jacfwd through the fused FK/LBS) and solves on
    device. Levenberg damping keeps steps well-conditioned at f32.

  * ``calibrate_scale_window``: windowed least squares for the skeleton
    scale: over T frames, jointly refine per-frame poses and one shared
    log-scale. The normal system has arrowhead structure (T pose blocks +
    one scalar); the shared scale is solved by Schur complement
    S = H_ss - sum_t H_sp H_pp^-1 H_ps -- the pose-graph reduction pattern,
    with the per-frame block solves batched over the window. Window shards
    reduce across devices with a psum of (S, rhs) when run under a mesh.

Parameterization: wrist rotation updates are right-multiplied axis-angle
increments (so the linearization is around identity each iteration);
translation in the same units as the landmarks; scale as log-scale.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..geometry.affine import matmul
from ..kinematics.hand_model import HandModel
from ..kinematics.skinning import skin_landmarks, so3_exp

N_ANGLES = 20
N_POSE = N_ANGLES + 6  # finger DoFs + wrist (3 rot, 3 trans)


class FitResult(NamedTuple):
    joint_angles: jnp.ndarray  # (..., 22)
    wrist: jnp.ndarray  # (..., 4, 4)
    residual: jnp.ndarray  # (...,) final mean landmark error
    log_scale: jnp.ndarray | None = None


def _apply_delta(
    joint_angles: jnp.ndarray,  # (..., 22)
    wrist: jnp.ndarray,  # (..., 4, 4)
    delta: jnp.ndarray,  # (..., 26)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    angles = joint_angles.at[..., :N_ANGLES].add(delta[..., :N_ANGLES])
    rot = so3_exp(delta[..., N_ANGLES : N_ANGLES + 3])
    upd = jnp.zeros(wrist.shape, wrist.dtype)
    upd = upd.at[..., :3, :3].set(rot)
    upd = upd.at[..., :3, 3].set(delta[..., N_ANGLES + 3 :])
    upd = upd.at[..., 3, 3].set(1.0)
    # right-multiply: wrist' = wrist @ [exp(w) | t]
    return angles, matmul(wrist, upd)


def _landmarks(hand, angles, wrist, log_scale=None):
    if log_scale is not None:
        s = jnp.exp(log_scale)
        hand = hand._replace(
            joint_rest_positions=hand.joint_rest_positions * s[..., None, None],
            landmark_rest_positions=hand.landmark_rest_positions * s[..., None, None],
        )
    return skin_landmarks(hand, angles, wrist)


def _residual_fn(hand, angles0, wrist0, target):
    """delta (26,) -> residual vector (63,) for one sample."""

    def f(delta):
        a, w = _apply_delta(angles0, wrist0, delta)
        lm = _landmarks(hand, a, w)
        return (lm - target).reshape(-1)

    return f


def fit_pose(
    hand: HandModel,  # batched (B, ...) left-canonical
    target_landmarks: jnp.ndarray,  # (B, 21, 3)
    init_joint_angles: jnp.ndarray,  # (B, 22)
    init_wrist: jnp.ndarray,  # (B, 4, 4)
    iters: int = 5,
    damping: float = 1e-3,
    weights: jnp.ndarray | None = None,  # (B, 21) e.g. 1/sigma^2
) -> FitResult:
    """Batched GN refinement of hand poses against target landmarks."""

    def per_sample(hand_i, target, a0, w0, wgt):
        def body(carry, _):
            a, w = carry
            f = _residual_fn(hand_i, a, w, target)
            J = jax.jacfwd(f)(jnp.zeros(N_POSE))  # (63, 26)
            r = f(jnp.zeros(N_POSE))
            if wgt is not None:
                sw = jnp.sqrt(jnp.repeat(wgt, 3))
                J = J * sw[:, None]
                r = r * sw
            H = J.T @ J + damping * jnp.eye(N_POSE)
            g = J.T @ r
            delta = -jnp.linalg.solve(H, g)
            a, w = _apply_delta(a, w, delta)
            return (a, w), None

        (a, w), _ = jax.lax.scan(body, (a0, w0), None, length=iters)
        res = jnp.linalg.norm(
            _landmarks(hand_i, a, w) - target, axis=-1
        ).mean()
        return a, w, res

    wgts = weights if weights is not None else None
    if wgts is None:
        a, w, res = jax.vmap(lambda h, t, a0, w0: per_sample(h, t, a0, w0, None))(
            hand, target_landmarks, init_joint_angles, init_wrist
        )
    else:
        a, w, res = jax.vmap(per_sample)(
            hand, target_landmarks, init_joint_angles, init_wrist, wgts
        )
    return FitResult(joint_angles=a, wrist=w, residual=res)


def calibrate_scale_window(
    hand: HandModel,  # unbatched left-canonical generic model
    target_landmarks: jnp.ndarray,  # (T, 21, 3) one hand over a window
    init_joint_angles: jnp.ndarray,  # (T, 22)
    init_wrist: jnp.ndarray,  # (T, 4, 4)
    frame_mask: jnp.ndarray | None = None,  # (T,)
    iters: int = 6,
    damping: float = 1e-3,
) -> FitResult:
    """Joint poses + shared log-scale over a temporal window (GN + Schur).

    Each iteration: per-frame residuals r_t(delta_t, ds) with J_p (63, 26)
    and J_s (63, 1); the normal system

        [ H_pp(t)  H_ps(t) ] [ dp_t ]   [ g_p(t) ]
        [ H_sp(t)  H_ss    ] [ ds   ] = [ g_s    ]

    is arrowhead: eliminate every pose block (batched 26x26 solves) and
    accumulate the scalar Schur complement
        S = sum_t (H_ss(t) - H_sp H_pp^-1 H_ps),
        b = sum_t (g_s(t) - H_sp H_pp^-1 g_p(t)).
    The sum over t is the cross-shard reduction point when windows span
    devices (psum of two scalars).
    """
    t_total = target_landmarks.shape[0]
    mask = (
        jnp.ones(t_total) if frame_mask is None else frame_mask.astype(jnp.float32)
    )

    def residual_t(a0, w0, target, delta_p, ds):
        a, w = _apply_delta(a0, w0, delta_p)
        lm = _landmarks(hand, a, w, log_scale=ds)
        return (lm - target).reshape(-1)

    def body(carry, _):
        angles, wrist, log_s = carry

        def per_frame(a0, w0, target, m):
            f_p = lambda dp: residual_t(a0, w0, target, dp, log_s)
            f_s = lambda ds: residual_t(a0, w0, target, jnp.zeros(N_POSE), ds)
            J_p = jax.jacfwd(f_p)(jnp.zeros(N_POSE))  # (63, 26)
            J_s = jax.jacfwd(f_s)(log_s)  # (63,)
            r = f_p(jnp.zeros(N_POSE))
            J_p = J_p * m
            J_s = J_s * m
            r = r * m
            H_pp = J_p.T @ J_p + damping * jnp.eye(N_POSE)
            H_ps = J_p.T @ J_s  # (26,)
            H_ss = J_s @ J_s
            g_p = J_p.T @ r
            g_s = J_s @ r
            Hinv_gp = jnp.linalg.solve(H_pp, g_p)
            Hinv_Hps = jnp.linalg.solve(H_pp, H_ps)
            S_t = H_ss - H_ps @ Hinv_Hps
            b_t = g_s - H_ps @ Hinv_gp
            return H_pp, H_ps, g_p, S_t, b_t

        H_pp, H_ps, g_p, S_t, b_t = jax.vmap(per_frame)(
            angles, wrist, target_landmarks, mask
        )
        S = jnp.sum(S_t) + damping
        b = jnp.sum(b_t)
        ds = -b / S
        # back-substitute per-frame pose updates
        rhs = g_p + H_ps * ds
        dp = -jax.vmap(jnp.linalg.solve)(H_pp, rhs)
        dp = dp * mask[:, None]
        angles, wrist = _apply_delta(angles, wrist, dp)
        log_s = log_s + ds
        return (angles, wrist, log_s), None

    init = (init_joint_angles, init_wrist, jnp.zeros(()))
    (angles, wrist, log_s), _ = jax.lax.scan(body, init, None, length=iters)

    final = _landmarks(
        jax.tree.map(lambda x: jnp.broadcast_to(x, (t_total,) + x.shape), hand),
        angles,
        wrist,
        log_scale=jnp.broadcast_to(log_s, (t_total,)),
    )
    res = (jnp.linalg.norm(final - target_landmarks, axis=-1).mean(-1) * mask).sum() / jnp.maximum(mask.sum(), 1.0)
    return FitResult(joint_angles=angles, wrist=wrist, residual=res, log_scale=log_s)
