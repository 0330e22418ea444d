"""Joint-guided depth segmentation (pure JAX).

Re-design of the reference's ``DepthSegmentation``
(network/util_modules.py:309-346): pixels farther than 7 px (uv) from every
projected joint are reset to background (100 mm). The reference engine wires
this to ``None`` (engine.py:79) — provided for API completeness.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from spherehand_tpu.constants import Constants

_C = Constants()


def segment_depth(
    dms: jnp.ndarray, joints: jnp.ndarray, radius_px: float = 7.0
) -> jnp.ndarray:
    """dms (..., H, W) mm; joints (..., J, 3) mm camera space. Returns the
    segmented depth (no gradient, matching the reference's .detach())."""
    height, width = dms.shape[-2:]
    fx = width / _C.cube_mm
    cx = width / 2.0
    u = joints[..., 0] * fx + cx  # (..., J)
    v = joints[..., 1] * (height / _C.cube_mm) + height / 2.0
    u_grid = jnp.arange(width, dtype=dms.dtype)[None, :]
    v_grid = jnp.arange(height, dtype=dms.dtype)[:, None]
    sq = (u[..., None, None] - u_grid) ** 2 + (v[..., None, None] - v_grid) ** 2
    min_dist = jnp.sqrt(jnp.min(sq, axis=-3))
    out = jnp.where(min_dist > radius_px, _C.background_depth, dms)
    return jax.lax.stop_gradient(out)
