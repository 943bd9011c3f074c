"""Evaluation metrics: MPJPE, keypoint acceleration, PCK curve, AUC.

Formulas match the reference exactly:
  * keypoint error: per-frame mean of per-landmark L2 (load_eval.py:33-34);
  * acceleration proxy: ||p[t-1] + p[t+1] - 2 p[t]|| averaged over landmarks
    (load_eval.py:29-31);
  * PCK thresholds 0..50 mm in 101 steps (metric_utils.py:18-19);
  * trapezoidal normalized AUC (metric_utils.py:87-112).

All functions are jnp-based and masked (no boolean indexing), so metric
reduction can run sharded with a single psum instead of the reference's
pickle-concat aggregation.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

MAX_LANDMARK_ERROR_MM = 50.0
# float32 so jnp.asarray under the default x64-disabled config is exact
# (a float64 array would emit a truncation UserWarning on every call).
PCK_THRESHOLDS = np.linspace(0.0, MAX_LANDMARK_ERROR_MM, 101, dtype=np.float32)


def mpjpe(
    gt_keypoints: jnp.ndarray,  # (..., T, 21, 3)
    tracked_keypoints: jnp.ndarray,
) -> jnp.ndarray:
    """Per-frame mean per-joint position error (..., T)."""
    d = jnp.linalg.norm(gt_keypoints - tracked_keypoints, axis=-1)
    return jnp.mean(d, axis=-1)


def keypoint_acceleration(pts: jnp.ndarray) -> jnp.ndarray:
    """(..., T, 21, 3) -> (..., T-2) mean second-difference magnitude."""
    acc = pts[..., :-2, :, :] + pts[..., 2:, :, :] - 2.0 * pts[..., 1:-1, :, :]
    return jnp.mean(jnp.linalg.norm(acc, axis=-1), axis=-1)


def acceleration_valid_mask(valid: jnp.ndarray) -> jnp.ndarray:
    """(..., T) bool -> (..., T-2): all three consecutive frames tracked."""
    return valid[..., :-2] & valid[..., 1:-1] & valid[..., 2:]


def pck_curve(
    errors: jnp.ndarray,
    thresholds: jnp.ndarray | np.ndarray = PCK_THRESHOLDS,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Fraction of errors <= each threshold -> (len(thresholds),).

    Masked variant of reference ``PCK_curve`` (metric_utils.py:35-84) over the
    flattened error array.
    """
    # jnp.asarray without an explicit dtype: float64 numpy inputs convert
    # to float32 silently instead of warning on every aggregation run
    errors = jnp.asarray(errors).reshape(-1)
    if mask is None:
        mask = jnp.ones_like(errors, dtype=bool)
    else:
        mask = mask.reshape(-1)
    th = jnp.asarray(thresholds, errors.dtype)
    le = (errors[None, :] <= th[:, None]) & mask[None, :]
    denom = jnp.maximum(jnp.sum(mask), 1)
    return jnp.sum(le, axis=-1) / denom


def pck_curve_per_axis(
    errors: jnp.ndarray,
    axis: int,
    thresholds: jnp.ndarray | np.ndarray = PCK_THRESHOLDS,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """One PCK curve per element along ``axis`` -> (n_axis, len(thresholds)).

    Equivalent of reference ``PCK_curve(axis=...)`` (metric_utils.py:46-84),
    e.g. per-hand or per-landmark curves.
    """
    errors = jnp.moveaxis(jnp.asarray(errors), axis, 0)
    n = errors.shape[0]
    errors = errors.reshape(n, -1)
    if mask is None:
        mask = jnp.ones_like(errors, dtype=bool)
    else:
        mask = jnp.moveaxis(mask, axis, 0).reshape(n, -1)
    th = jnp.asarray(thresholds, errors.dtype)
    le = (errors[:, None, :] <= th[None, :, None]) & mask[:, None, :]
    denom = jnp.maximum(jnp.sum(mask, axis=-1), 1)
    return jnp.sum(le, axis=-1) / denom[:, None]


def normalized_auc(x, y, y_max: float = 1.0) -> jnp.ndarray:
    """Trapezoidal AUC normalized by the max area (metric_utils.py:87-112)."""
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    auc = jnp.sum((x[1:] - x[:-1]) * (y[..., 1:] + y[..., :-1]) * 0.5, axis=-1)
    return auc / ((x[-1] - x[0]) * y_max)


def masked_mean(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean over entries where mask is True (safe when mask is empty)."""
    m = mask.astype(values.dtype)
    return jnp.sum(values * m) / jnp.maximum(jnp.sum(m), 1.0)
