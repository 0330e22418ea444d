"""On-device synthetic training-sample generator.

Re-design of the reference's ``HandSynthesizer`` (network/util_modules.py:
86-122): pose parameters -> FK -> random anisotropic scale -> random focal
jitter -> triangle-raster depth map (+ sensor noise) -> GT heatmaps + joints.
The torch version runs as a host-side module feeding `.detach()`ed tensors;
here it is a pure jitted function fused into the train step — the whole
synthesis pipeline compiles into the same XLA program as the network forward
and backward, and its outputs carry ``stop_gradient`` to reproduce the
reference's detach topology (util_modules.py:122).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from spherehand_tpu.constants import Constants
from spherehand_tpu.data.noise import depth_pixel_noise
from spherehand_tpu.hand.assets import HandModel
from spherehand_tpu.hand.kinematics import forward_kinematics
from spherehand_tpu.hand.skinning import apply_random_scale
from spherehand_tpu.render.heatmap import render_joint_heatmaps
from spherehand_tpu.render.raster import render_depth_64

_C = Constants()


class SyntheticBatch(NamedTuple):
    """Ground-truth supervision for one synthetic batch (all stop-gradient)."""

    dms: jnp.ndarray      # (B, 64, 64) scaled depth (background 1.0)
    uv_hms: jnp.ndarray   # (B, 41, 16, 16) Gaussian GT heatmaps
    d_hms: jnp.ndarray    # (B, 41, 16, 16) scaled GT depth heatmaps
    xyz: jnp.ndarray      # (B, 41, 3) GT joints, mm camera space


def synthesize(
    model: HandModel,
    key: jax.Array,
    pose_params: jnp.ndarray,
    add_noise: bool = True,
) -> SyntheticBatch:
    """Render a supervised batch from pose parameters (B, 26)."""
    k_scale, k_focal, k_noise = jax.random.split(key, 3)
    transforms = forward_kinematics(model, pose_params)
    transforms = apply_random_scale(k_scale, transforms, 0.1)
    rand_f = jax.random.uniform(
        k_focal, (pose_params.shape[0],), pose_params.dtype, 0.9, 1.1
    )

    dms = render_depth_64(model, transforms, rand_f) * _C.depth_scale
    if add_noise:
        dms = depth_pixel_noise(k_noise, dms)

    uv_hms, d_hms, xyz = render_joint_heatmaps(
        model, transforms, _C.heatmap_size, rand_f
    )
    batchify = jax.lax.stop_gradient
    return SyntheticBatch(
        dms=batchify(dms),
        uv_hms=batchify(uv_hms * _C.uv_hm_scale),
        d_hms=batchify(d_hms * _C.depth_scale),
        xyz=batchify(xyz[..., :3]),
    )
