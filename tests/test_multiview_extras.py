"""FuseMvPose, weighted consistency, temporal smoothness behavior tests."""
import numpy as np

import jax
import jax.numpy as jnp

from spherehand_tpu.losses.multitask import temporal_smoothness
from spherehand_tpu.losses.multiview import (
    fuse_mv_pose,
    weighted_multiview_consistency_loss,
)


def _identity_poses(batch, views):
    return jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (batch, views, 1, 1)))


def test_weighted_consistency_zero_when_views_agree():
    rng = np.random.RandomState(0)
    joints_one = rng.uniform(-50, 50, (2, 1, 41, 3)).astype(np.float32)
    joints = jnp.asarray(np.repeat(joints_one, 3, axis=1))
    poses = _identity_poses(2, 3)
    w = jnp.ones((2, 3, 41))
    assert float(weighted_multiview_consistency_loss(poses, joints, w)) < 1e-6
    # disagreeing views with confidence on view 0 pull toward view 0
    noisy = joints.at[:, 1].add(5.0)
    w = jnp.asarray(np.stack([np.full((2, 41), 2.0), np.ones((2, 41)), np.ones((2, 41))], 1))
    loss = float(weighted_multiview_consistency_loss(poses, noisy, w))
    np.testing.assert_allclose(loss, 2 * 41 * 3 * 25.0, rtol=1e-5)


def test_fuse_mv_pose_broadcasts_best_view():
    rng = np.random.RandomState(1)
    joints = jnp.asarray(rng.uniform(-50, 50, (2, 3, 41, 3)).astype(np.float32))
    poses = _identity_poses(2, 3)
    # sharply peaked heatmaps on view 1 -> lowest variance -> it wins
    hms = np.full((2, 3, 41, 16, 16), 0.0, np.float32)
    hms[:, :, :, :, :] = np.random.RandomState(2).uniform(0, 1, (2, 3, 41, 16, 16))
    hms[:, 1, :, 8, 8] = 50.0  # peaked
    fused = fuse_mv_pose(joints, poses, poses, jnp.asarray(hms))
    assert fused.shape == (2, 3, 41, 3)
    np.testing.assert_allclose(
        np.asarray(fused[:, 0]), np.asarray(joints[:, 1]), atol=1e-4
    )


def test_temporal_smoothness_state_carry():
    rng = np.random.RandomState(3)
    joints = jnp.asarray(rng.uniform(-10, 10, (4, 3, 41, 3)).astype(np.float32))
    prev = jnp.zeros((3, 41, 3))
    # without previous state: only the 3 consecutive pairs count
    loss0, new_prev, has_prev = temporal_smoothness(
        joints, prev, jnp.asarray(False)
    )
    expected0 = np.mean(
        (np.asarray(joints[1:]) - np.asarray(joints[:-1])) ** 2
    )
    np.testing.assert_allclose(float(loss0), expected0, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(new_prev), np.asarray(joints[-1]))
    assert bool(has_prev)
    # with previous state: 4 pairs including prev -> first
    loss1, _, _ = temporal_smoothness(joints, new_prev, jnp.asarray(True))
    j = np.asarray(joints)
    prev_stack = np.concatenate([np.asarray(new_prev)[None], j[:-1]])
    np.testing.assert_allclose(float(loss1), np.mean((j - prev_stack) ** 2), rtol=1e-5)


def test_extras_match_torch_goldens(goldens):
    """Torch-reference parity for the dormant modules (multiview_extras.npz:
    TemporalSmoothnessLoss util_modules.py:349-381, Weighted MV consistency +
    FuseMvPose multiview_utility.py:170-237)."""
    g = goldens("multiview_extras")
    joints = jnp.asarray(g["joints"])
    joints2 = jnp.asarray(g["joints2"])
    poses = jnp.asarray(g["poses"])
    inv_poses = jnp.asarray(g["inv_poses"])

    # temporal: first call (no previous state), then carried state
    loss0, prev, has_prev = temporal_smoothness(
        joints, jnp.zeros_like(joints[0]), jnp.asarray(False)
    )
    np.testing.assert_allclose(float(loss0), g["temporal_first"], rtol=1e-5)
    loss1, _, _ = temporal_smoothness(joints2, prev, has_prev)
    np.testing.assert_allclose(float(loss1), g["temporal_second"], rtol=1e-5)

    w_loss = weighted_multiview_consistency_loss(
        poses, joints, jnp.asarray(g["hm_weight"])
    )
    np.testing.assert_allclose(
        float(w_loss), g["weighted_consistency"], rtol=1e-5
    )

    fused = fuse_mv_pose(joints, poses, inv_poses, jnp.asarray(g["uv_hm"]))
    np.testing.assert_allclose(
        np.asarray(fused), g["fused_joints"], rtol=1e-4, atol=1e-3
    )
