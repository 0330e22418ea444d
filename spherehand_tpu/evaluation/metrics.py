"""Joint-error metrics over the synthetic<->NYU keypoint correspondence.

Re-design of the reference's ``network/utils_metric.py:7-17`` (14-point
average joint error) and ``dataset/evaluation.py:59-79`` (per-joint errors,
max-error PCK-style threshold curve). Pure JAX so metrics compute on-device
inside the jitted eval step — the reference pulls tensors to the CPU every
iteration (utils_metric.py:9-10), a sync the TPU design avoids.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from spherehand_tpu import constants as C


def average_joint_error(
    gt_joints: jnp.ndarray,
    est_joints: jnp.ndarray,
    synt_points: tuple = C.SYNT_KEY_POINTS,
    real_points: tuple = C.REAL_KEY_POINTS,
    weights: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Mean L2 error (mm) over the keypoint correspondence.

    gt_joints: (..., 36, 3) NYU ground truth; est_joints: (..., 41, 3) model
    estimates; weights: optional (batch,) row weights for padded
    data-parallel batches. Matches ``utils_metric.py:7-17``.
    """
    from spherehand_tpu.ops.reduce import bmean

    gt = gt_joints[..., np.asarray(real_points, np.int32), :]
    est = est_joints[..., np.asarray(synt_points, np.int32), :]
    return bmean(jnp.linalg.norm(gt - est, axis=-1), weights)


def per_joint_error(
    gt_joints: jnp.ndarray,
    est_joints: jnp.ndarray,
    synt_points: tuple = C.EVAL_SYNT_KEY_POINTS,
    real_points: tuple = C.EVAL_REAL_KEY_POINTS,
) -> jnp.ndarray:
    """Per-sample, per-keypoint L2 errors (..., K) — evaluation.py:59-66."""
    gt = gt_joints[..., np.asarray(real_points, np.int32), :]
    est = est_joints[..., np.asarray(synt_points, np.int32), :]
    return jnp.linalg.norm(gt - est, axis=-1)


def max_error_curve(
    errors: np.ndarray, thresholds: np.ndarray | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Fraction of samples whose WORST keypoint error is under each threshold.

    errors: (N, K) per-joint errors. Thresholds default to 0.5..80.5 mm step 5
    (reference dataset/evaluation.py:69-79). Returns (thresholds, fractions).
    """
    if thresholds is None:
        thresholds = np.arange(0.5, 81.0, 5.0)
    worst = np.max(np.asarray(errors), axis=-1)
    frac = np.asarray([(worst < t).mean() for t in thresholds])
    return thresholds, frac
