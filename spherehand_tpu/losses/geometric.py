"""Geometric pose priors: collision and bone-length losses (pure JAX).

Re-design of the reference's ``CollisionLoss`` (mesh/render.py:145-176) and
``BoneLengthLoss`` (mesh/render.py:179-206 + tables in mesh/bone_length.py:
36-56). The pair tables are static framework constants
(:mod:`spherehand_tpu.constants`); both losses are two gathers and an
elementwise reduce, fully fused by XLA.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from spherehand_tpu import constants as C

_COLL_J1, _COLL_J2 = C.collision_pairs()


def _pair_sq_dist(joints: jnp.ndarray, j1: np.ndarray, j2: np.ndarray) -> jnp.ndarray:
    """joints (..., J, 3) -> squared distances (..., P) for index pairs."""
    diff = joints[..., j1, :] - joints[..., j2, :]
    return jnp.sum(diff * diff, axis=-1)


def collision_loss(
    joints: jnp.ndarray,
    min_dist: float = 6.0,
    weights: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Sum of relu(min_dist^2 - d^2) over the 690 palm/finger pairs.

    joints: (..., 41, 3) in mm. Reduction is a SUM over every pair and batch
    element (reference mesh/render.py:168-176). ``weights`` (batch,) zeroes
    padded data-parallel rows (ops.reduce).
    """
    from spherehand_tpu.ops.reduce import bsum

    sq = _pair_sq_dist(joints, _COLL_J1, _COLL_J2)
    return bsum(jax.nn.relu(min_dist * min_dist - sq), weights)


def bone_length_loss(
    joints: jnp.ndarray, weights: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Penalty outside [0.80 L, 1.05 L] of the 35 median bone lengths.

    joints: (..., 41, 3) in mm. Lower and upper squared-length violations are
    each MEANed then summed (reference mesh/render.py:196-206).
    """
    from spherehand_tpu.ops.reduce import bmean

    sq = _pair_sq_dist(joints, C.BONE_PAIRS_J1, C.BONE_PAIRS_J2)
    min_sq = jnp.asarray((C.BONE_MEDIAN_LENGTH * 0.80) ** 2, joints.dtype)
    max_sq = jnp.asarray((C.BONE_MEDIAN_LENGTH * 1.05) ** 2, joints.dtype)
    lower = bmean(jax.nn.relu(min_sq - sq), weights)
    upper = bmean(jax.nn.relu(sq - max_sq), weights)
    return lower + upper
