"""Soft-argmax 3D joint recovery and heatmap statistics (pure JAX).

Re-design of the reference's heatmap heads (network/util_modules.py:
``SpatialSoftmax`` :126-141, ``SpatialNormalization`` :144-161,
``RecoverXYZCoordinateFromHeatmap`` :164-201, ``HeatmapVariance`` :204-240)
as stateless functions over (..., J, H, W) heatmap stacks. All reductions are
over the trailing pixel axes, so arbitrary leading batch/view axes shard
freely under pjit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from spherehand_tpu.constants import Constants

_C = Constants()


def spatial_softmax(hms: jnp.ndarray, sigma: float = 20.0) -> jnp.ndarray:
    """Temperature-scaled softmax over the pixel axes (util_modules.py:126-141)."""
    shape = hms.shape
    flat = (hms * sigma).reshape(shape[:-2] + (-1,))
    return jax.nn.softmax(flat, axis=-1).reshape(shape)


def spatial_normalize(hms: jnp.ndarray) -> jnp.ndarray:
    """ReLU then sum-normalize over pixels (util_modules.py:144-161)."""
    hms = jax.nn.relu(hms)
    sums = jnp.sum(hms, axis=(-2, -1), keepdims=True)
    return hms / (sums + 1e-5)


def recover_xyz(
    uv_hms: jnp.ndarray,
    d_hms: jnp.ndarray,
    size: int | None = None,
    depth_scale: float | None = None,
) -> jnp.ndarray:
    """Heatmaps (..., J, H, W) -> 3D joints (..., J, 3) in mm camera space.

    u/v are the softmax(sigma=20) expectation over the integer pixel grid;
    depth is the d-heatmap weighted by the sum-normalized uv heatmap; camera
    un-projection uses fx = W/300, cx = W/2 and z /= depth_scale
    (reference util_modules.py:182-201).
    """
    size = size or uv_hms.shape[-1]
    depth_scale = depth_scale or _C.depth_scale
    dtype = uv_hms.dtype
    u_grid = jnp.arange(size, dtype=dtype)[None, :]
    v_grid = jnp.arange(size, dtype=dtype)[:, None]

    probs = spatial_softmax(uv_hms)
    u = jnp.sum(probs * u_grid, axis=(-2, -1))
    v = jnp.sum(probs * v_grid, axis=(-2, -1))
    d = jnp.sum(d_hms * spatial_normalize(uv_hms), axis=(-2, -1))

    fx = size / _C.cube_mm
    c = size / 2.0
    return jnp.stack([(u - c) / fx, (v - c) / fx, d / depth_scale], axis=-1)


def heatmap_variance(hms: jnp.ndarray) -> jnp.ndarray:
    """Spatial variance of heatmap mass, a per-joint confidence proxy.

    hms (..., J, H, W) -> (..., J). The mean uses softmax(sigma=25) weights,
    the variance uses relu-normalized weights, over the centered unit grid
    ((g - S/2)/S), matching the reference (util_modules.py:219-240).
    """
    size_w = hms.shape[-1]
    size_h = hms.shape[-2]
    dtype = hms.dtype
    u_grid = ((jnp.arange(size_w, dtype=dtype) - size_w / 2.0) / size_w)[None, :]
    v_grid = ((jnp.arange(size_h, dtype=dtype) - size_h / 2.0) / size_h)[:, None]

    soft = spatial_softmax(hms, sigma=25.0)
    normed = spatial_normalize(hms)

    u_mean = jnp.sum(soft * u_grid, axis=(-2, -1))[..., None, None]
    u_var = jnp.sum(normed * (u_grid - u_mean) ** 2, axis=(-2, -1))
    v_mean = jnp.sum(soft * v_grid, axis=(-2, -1))[..., None, None]
    v_var = jnp.sum(normed * (v_grid - v_mean) ** 2, axis=(-2, -1))
    return u_var + v_var
