"""Skeleton-only forward kinematics: pose params -> 41 sphere centers.

Re-design of the reference's ``SkeletonFK``
(mesh/kinematicsTransformation.py:180-207, duplicated at
mesh/pose_prior.py:12-39): FK, optional random anisotropic scale, then
keypoint LBS. This is the generator behind the VAE / denoiser training sets
and the PCA prior builder.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from spherehand_tpu.hand.assets import HandModel
from spherehand_tpu.hand.kinematics import forward_kinematics
from spherehand_tpu.hand.skinning import apply_random_scale, lbs_keypoints


def skeleton_fk(
    model: HandModel,
    params: jnp.ndarray,
    key: jax.Array | None = None,
    scale_range: float = 0.1,
) -> jnp.ndarray:
    """(B, 26) pose params -> (B, 41, 3) keypoint positions in mm.

    With ``key`` the reference's RandScale(0.1) jitter is applied
    (kinematicsTransformation.py:188,199).
    """
    transforms = forward_kinematics(model, params)
    if key is not None:
        transforms = apply_random_scale(key, transforms, scale_range)
    return lbs_keypoints(model, transforms)[..., :3]
