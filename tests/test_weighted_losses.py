"""Weighted (padded-batch) losses == unpadded losses on the real rows.

The data-parallel engine pads batches with duplicate rows at weight 0
(spherehand_tpu.ops.reduce); each loss must then equal its unpadded value
exactly — zero leakage from pad rows into either the loss or the gradient.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spherehand_tpu.losses.geometric import bone_length_loss, collision_loss
from spherehand_tpu.losses.multiview import (
    multiview_consistency_loss,
    mutual_projection_loss,
)
from spherehand_tpu.ops.reduce import bmean, bmean_keep, bsum

B, PAD, V, J = 3, 5, 3, 41


def _padded(x):
    idx = np.concatenate([np.arange(B), np.arange(PAD - B) % B])
    return x[idx]


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(0)
    joints = rng.uniform(-60, 60, (B, V, J, 3)).astype(np.float32)
    dms = np.full((B, V, 32, 32), 100.0, np.float32)
    dms[:, :, 10:22, 10:22] = rng.uniform(20, 60, (B, V, 12, 12))
    poses = np.tile(np.eye(4, dtype=np.float32), (B, V, 1, 1))
    w = np.zeros(PAD, np.float32)
    w[:B] = 1.0
    return joints, dms, poses, w


def test_reduce_helpers_match_plain_ops(data):
    joints, _, _, w = data
    x = jnp.asarray(joints)
    xp = jnp.asarray(_padded(joints))
    np.testing.assert_allclose(bmean(xp, jnp.asarray(w)), jnp.mean(x), rtol=1e-6)
    np.testing.assert_allclose(bsum(xp, jnp.asarray(w)), jnp.sum(x), rtol=1e-6)
    np.testing.assert_allclose(
        bmean_keep(xp, jnp.asarray(w), (2,)),
        jnp.mean(x, axis=(0, 2)),
        rtol=1e-6,
    )


def test_geometric_losses_ignore_padding(data):
    joints, _, _, w = data
    flat = joints.reshape(B, V * J, 3)
    flat_p = _padded(flat)
    np.testing.assert_allclose(
        collision_loss(jnp.asarray(flat_p), weights=jnp.asarray(w)),
        collision_loss(jnp.asarray(flat)),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        bone_length_loss(jnp.asarray(flat_p), weights=jnp.asarray(w)),
        bone_length_loss(jnp.asarray(flat)),
        rtol=1e-5,
    )


def test_multiview_losses_ignore_padding(data, hand_model):
    joints, dms, poses, w = data
    radii = hand_model.kp_radius
    for is_mv in (True, False):
        ref, _ = mutual_projection_loss(
            jnp.asarray(poses), jnp.asarray(poses), jnp.asarray(joints),
            jnp.asarray(dms), radii, is_mv=is_mv,
        )
        pad, _ = mutual_projection_loss(
            jnp.asarray(_padded(poses)), jnp.asarray(_padded(poses)),
            jnp.asarray(_padded(joints)), jnp.asarray(_padded(dms)), radii,
            is_mv=is_mv, weights=jnp.asarray(w),
        )
        np.testing.assert_allclose(pad, ref, rtol=1e-5)

    ref = multiview_consistency_loss(jnp.asarray(poses), jnp.asarray(joints))
    pad = multiview_consistency_loss(
        jnp.asarray(_padded(poses)), jnp.asarray(_padded(joints)),
        weights=jnp.asarray(w),
    )
    np.testing.assert_allclose(pad, ref, rtol=1e-5)


def test_prior_loss_ignores_padding(data):
    from spherehand_tpu.models.pose_vae import load_pose_vae_params, prior_loss

    joints, _, _, w = data
    params = load_pose_vae_params()
    key = jax.random.key(5)
    ref = prior_loss(params, jnp.asarray(joints) / 100.0, key)
    wp = jnp.repeat(jnp.asarray(w), V)
    pad = prior_loss(
        params, jnp.asarray(_padded(joints)) / 100.0, key, weights=wp
    )
    np.testing.assert_allclose(pad, ref, rtol=1e-5)


def test_padding_rows_get_zero_gradient(data, hand_model):
    """Gradient w.r.t. padded joint rows is exactly zero; real rows match."""
    joints, dms, poses, w = data
    radii = hand_model.kp_radius

    def loss_pad(j):
        l, _ = mutual_projection_loss(
            jnp.asarray(_padded(poses)), jnp.asarray(_padded(poses)), j,
            jnp.asarray(_padded(dms)), radii, is_mv=True,
            weights=jnp.asarray(w),
        )
        return l

    def loss_ref(j):
        l, _ = mutual_projection_loss(
            jnp.asarray(poses), jnp.asarray(poses), j,
            jnp.asarray(dms), radii, is_mv=True,
        )
        return l

    g_pad = jax.grad(loss_pad)(jnp.asarray(_padded(joints)))
    g_ref = jax.grad(loss_ref)(jnp.asarray(joints))
    np.testing.assert_array_equal(np.asarray(g_pad[B:]), 0.0)
    np.testing.assert_allclose(np.asarray(g_pad[:B]), np.asarray(g_ref), rtol=1e-5)
