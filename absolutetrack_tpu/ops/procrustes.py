"""Batched rigid Procrustes alignment.

Reproduces the behavior of reference ``model_utils.procrustes_align``
(lib/models/model_utils.py:17-54) with two interchangeable solvers:

  * "quat" (default): Horn's closed-form quaternion method -- Newton on
    the Davenport 4x4 characteristic quartic for lambda_max plus an
    adjugate eigenvector. Pure elementwise math and tiny matmuls; fully
    XLA-fusible (no SVD custom call, ~8x faster on TPU) and det(R) = +1
    by construction. Agrees with the SVD solution to ~1e-4 (same
    optimum).
  * "svd": the reference's formulation (center, SVD the cross-covariance,
    det(V U^T) reflection fix-up).

Both run their matmuls at full f32 precision -- this is numerically the
sensitive step of the pipeline (0.5 mm landmark budget).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..geometry.affine import einsum, matmul


def _assemble(rot, from_mean, to_mean, batch_shape, dtype):
    t = to_mean - einsum("...ij,...j->...i", rot, from_mean)
    out = jnp.zeros(batch_shape + (4, 4), dtype)
    out = out.at[..., :3, :3].set(rot)
    out = out.at[..., :3, 3].set(t)
    out = out.at[..., 3, 3].set(1.0)
    return out


def _cross_cov(from_points, to_points):
    from_mean = jnp.mean(from_points, axis=-2)
    to_mean = jnp.mean(to_points, axis=-2)
    fc = from_points - from_mean[..., None, :]
    tc = to_points - to_mean[..., None, :]
    cov = einsum("...ni,...nj->...ij", fc, tc)
    return cov, from_mean, to_mean


def procrustes_align(
    from_points: jnp.ndarray, to_points: jnp.ndarray, method: str = "quat"
) -> jnp.ndarray:
    """Best-fit rigid transform mapping from_points -> to_points.

    Args:
      from_points, to_points: (..., N, 3) corresponding point sets.
      method: "quat" (Horn's closed-form quaternion solution; see module
        docstring) or "svd" (the reference's formulation,
        model_utils.py:17-54).
    Returns:
      (..., 4, 4) rigid transforms (rotation + translation, det(R) = +1).
    """
    if method == "quat":
        return procrustes_align_quat(from_points, to_points)
    cov, from_mean, to_mean = _cross_cov(from_points, to_points)
    u, _, vt = jnp.linalg.svd(cov)
    v = jnp.swapaxes(vt, -1, -2)
    v_ut = matmul(v, jnp.swapaxes(u, -1, -2))
    det = jnp.linalg.det(v_ut)
    w = jnp.broadcast_to(jnp.eye(3, dtype=cov.dtype), v_ut.shape)
    w = w.at[..., 2, 2].multiply(det)
    rot = matmul(matmul(v, w), jnp.swapaxes(u, -1, -2))
    return _assemble(rot, from_mean, to_mean, from_points.shape[:-2], from_points.dtype)


def procrustes_align_quat(
    from_points: jnp.ndarray, to_points: jnp.ndarray, iters: int = 25
) -> jnp.ndarray:
    """Horn's quaternion Procrustes: maximize trace(R^T M) over SO(3).

    The optimal rotation's quaternion is the max-eigenvector of the
    symmetric 4x4 Davenport matrix K(M). lambda_max comes from Newton on
    the characteristic quartic (monotone from an upper bound; exact, no
    eigengap dependence), the eigenvector from the adjugate of
    K - lambda_max I -- everything closed-form elementwise math + tiny
    matmuls, no iterative factorization custom call. The det(R) = +1
    constraint is inherent to the quaternion parameterization, matching
    the SVD formulation's reflection fix-up at the optimum.
    """
    cov, from_mean, to_mean = _cross_cov(from_points, to_points)
    m = cov
    sxx, sxy, sxz = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    syx, syy, syz = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    szx, szy, szz = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    k = jnp.stack(
        [
            jnp.stack([sxx + syy + szz, syz - szy, szx - sxz, sxy - syx], -1),
            jnp.stack([syz - szy, sxx - syy - szz, sxy + syx, szx + sxz], -1),
            jnp.stack([szx - sxz, sxy + syx, -sxx + syy - szz, syz + szy], -1),
            jnp.stack([sxy - syx, szx + sxz, syz + szy, -sxx - syy + szz], -1),
        ],
        axis=-2,
    )
    # --- exact lambda_max: Newton on the characteristic quartic.
    # K is symmetric and traceless, so det(K - l I) = l^4 + c2 l^2 + c1 l
    # + c0 with c2 = -tr(K^2)/2, c1 = -tr(K^3)/3, c0 = det(K). All roots
    # are real; Newton started from an upper bound (2 ||M||_F >=
    # sigma1+sigma2+sigma3 >= lambda_max) decreases monotonically to the
    # largest root with quadratic convergence.
    k2 = matmul(k, k)
    k3 = matmul(k2, k)
    tr = lambda a: a[..., 0, 0] + a[..., 1, 1] + a[..., 2, 2] + a[..., 3, 3]
    c2 = -0.5 * tr(k2)
    c1 = -tr(k3) / 3.0
    c0 = jnp.linalg.det(k)

    m_norm = jnp.sqrt(jnp.sum(m * m, axis=(-2, -1)))
    lam = 2.0 * m_norm + 1e-6
    for _ in range(iters):
        p = ((lam * lam + c2) * lam + c1) * lam + c0
        dp = (4.0 * lam * lam + 2.0 * c2) * lam + c1
        lam = lam - p / jnp.where(jnp.abs(dp) > 1e-20, dp, 1e-20)

    # --- eigenvector via the adjugate of A = K - lambda I: A is singular,
    # so adj(A) = prod of the other eigenvalue factors projected onto the
    # null space -- every nonzero column is the wanted eigenvector.
    a = k - lam[..., None, None] * jnp.broadcast_to(
        jnp.eye(4, dtype=k.dtype), k.shape
    )
    # adj(A) via Cayley-Hamilton: adj(A) = -(A^3 + p1 A^2 + p2 A + p3 I)
    # with p1..p3 the characteristic coefficients of A (Newton identities).
    a2 = matmul(a, a)
    a3 = matmul(a2, a)
    ta = tr(a)
    ta2 = tr(a2)
    ta3 = tr(a3)
    p1 = -ta
    p2 = 0.5 * (ta * ta - ta2)
    p3 = -(ta * ta * ta - 3.0 * ta * ta2 + 2.0 * ta3) / 6.0
    eye4 = jnp.broadcast_to(jnp.eye(4, dtype=k.dtype), k.shape)
    adj = -(
        a3
        + p1[..., None, None] * a2
        + p2[..., None, None] * a
        + p3[..., None, None] * eye4
    )
    # pick the largest-norm column; if the eigenspace is (near-)degenerate
    # every optimal rotation is equally good -- fall back to identity quat
    col_norms = jnp.sqrt(jnp.sum(adj * adj, axis=-2))  # (..., 4)
    best = jnp.argmax(col_norms, axis=-1)
    q = jnp.take_along_axis(
        adj, best[..., None, None].astype(jnp.int32), axis=-1
    )[..., 0]
    qn = jnp.linalg.norm(q, axis=-1, keepdims=True)
    fallback = jnp.zeros_like(q).at[..., 0].set(1.0)
    scale_ref = jnp.maximum(m_norm[..., None] ** 3, 1e-30)
    q = jnp.where(qn > 1e-6 * scale_ref, q / jnp.maximum(qn, 1e-30), fallback)

    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    rot = jnp.stack(
        [
            jnp.stack(
                [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1
            ),
            jnp.stack(
                [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1
            ),
            jnp.stack(
                [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1
            ),
        ],
        axis=-2,
    )
    return _assemble(rot, from_mean, to_mean, from_points.shape[:-2], from_points.dtype)
