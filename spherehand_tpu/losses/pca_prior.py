"""PCA pose prior — projection-residual loss and reconstruction.

Re-design of the reference's ``PosePriorLoss`` / ``PosePriorReconstruction``
(network/util_modules.py:243-306). In the reference engine these are
superseded by the PoseVae prior (create_network_and_criterion.py:164) but
remain part of the public surface; the PCA arrays ship in
``assets/pose_prior_pca.npz`` (from mesh/model/pose_prior.pkl).

Both ops root-center the skeleton (joint 0), subtract the PCA mean, and
project onto the span of the components (``x @ C^T C``). The reference's
double root-centering in PosePriorLoss (util_modules.py:261-269 subtracts the
root twice — idempotent, since the root is already at 0 after the first) is
semantically a single centering and implemented as such.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_HIGHEST = jax.lax.Precision.HIGHEST


def _center_flatten(joints: jnp.ndarray) -> jnp.ndarray:
    root = joints[..., 0:1, :]
    centered = joints - root
    return centered.reshape(-1, joints.shape[-2] * 3), root


def pca_prior_loss(
    mean: jnp.ndarray, components: jnp.ndarray, joints: jnp.ndarray
) -> jnp.ndarray:
    """MSE between centered joints and their PCA-subspace projection.

    joints: (..., J, 3); mean (J*3,); components (K, J*3).
    """
    flat, _ = _center_flatten(joints)
    x = flat - mean[None, :]
    proj = jnp.matmul(
        jnp.matmul(x, components.T, precision=_HIGHEST),
        components,
        precision=_HIGHEST,
    )
    return jnp.mean((x - proj) ** 2)


def pca_reconstruct(
    mean: jnp.ndarray, components: jnp.ndarray, joints: jnp.ndarray
) -> jnp.ndarray:
    """Project joints into the PCA subspace and reconstruct (same shape)."""
    shape = joints.shape
    flat, root = _center_flatten(joints)
    x = flat - mean[None, :]
    proj = jnp.matmul(
        jnp.matmul(x, components.T, precision=_HIGHEST),
        components,
        precision=_HIGHEST,
    )
    recon = (proj + mean[None, :]).reshape(shape[:-2] + shape[-2:])
    return recon.reshape(shape) + root
