"""Gaussian ground-truth heatmap rendering (pure JAX, fully broadcast).

Re-design of the reference's ``HeatmapRender`` (mesh/render.py:210-248) and
``Hand3DHeatmapRender`` (:251-279) as pure functions: GT uv heatmaps are an
isotropic Gaussian ``exp(-0.5 * sigma * ((u-u0)^2 + (v-v0)^2))`` on the integer
heatmap grid, and the depth heatmap carries the joint z wherever the uv
heatmap exceeds 0.05.
"""
from __future__ import annotations

import jax.numpy as jnp

from spherehand_tpu.hand.assets import HandModel
from spherehand_tpu.hand.skinning import (
    inverse_orthographic,
    lbs_keypoints,
    orthographic_project,
)


def render_heatmaps(
    uvd: jnp.ndarray, size: int, sigma: float = 1.0
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """uvd (..., J, 3+) joint positions in heatmap pixel space -> GT heatmaps.

    Returns (uv_hms, d_hms), each (..., J, size, size). d_hm is the joint depth
    broadcast over the uv_hm > 0.05 support, zero elsewhere
    (reference mesh/render.py:226-248).
    """
    dtype = uvd.dtype
    u_grid = jnp.arange(size, dtype=dtype)[None, :]  # (1, size) along u/x
    v_grid = jnp.arange(size, dtype=dtype)[:, None]  # (size, 1) along v/y
    du = u_grid - uvd[..., 0, None, None]
    dv = v_grid - uvd[..., 1, None, None]
    uv_hms = jnp.exp(-0.5 * sigma * (du * du + dv * dv))
    d_hms = jnp.where(uv_hms > 0.05, uvd[..., 2, None, None], 0.0)
    return uv_hms, d_hms


def render_joint_heatmaps(
    model: HandModel,
    transforms: jnp.ndarray,
    heatmap_size: int,
    rand_f: jnp.ndarray | None = None,
    sigma: float = 1.0,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Bone transforms (B, 17, 4, 4) -> GT heatmaps + 3D joints.

    Skins the 41 sphere centers, projects them into heatmap pixel space with an
    optionally jittered focal length, renders Gaussian heatmaps, and recovers
    xyz through the fixed-focal inverse camera. With ``rand_f != 1`` the
    recovered xyz deliberately differs from the true joints — the round trip
    through the nominal inverse bakes the focal jitter into the labels, exactly
    as the reference does (Hand3DHeatmapRender, mesh/render.py:274-279).

    Returns (uv_hms (B, 41, S, S), d_hms (B, 41, S, S), xyz (B, 41, 4)).
    """
    kp = lbs_keypoints(model, transforms)  # (B, 41, 4)
    uvd = orthographic_project(kp, float(heatmap_size), rand_f)
    uv_hms, d_hms = render_heatmaps(uvd, heatmap_size, sigma)
    xyz = inverse_orthographic(uvd, float(heatmap_size))
    return uv_hms, d_hms, xyz
