"""Analytic orthographic sphere rendering and the point-to-sphere distance field.

TPU-first re-design of the reference's ``BallRender`` (mesh/render.py:10-53),
``HandBallPrimitiveRender`` (:56-90) and ``DataToModelLoss`` (:93-142). The
reference materializes per-sphere grids with ``repeat`` and boolean indexing;
here everything is pure broadcasting over a shared mm-space grid so XLA fuses
the whole render into one elementwise kernel, and arbitrary leading batch axes
(batch, views, views, joints, ...) are supported without reshapes.

Semantics preserved exactly:
- The image grid is in millimetres: ``x = (u - W/2) * 300 / W`` (render.py:31-32),
  u along the last axis, v along the second-to-last.
- Squared surface distance is clamped at 1e-2; pixels at the clamp value are
  background = 100.0 mm (render.py:41-52). Gradient is therefore zero outside
  a sphere's silhouette.
- The hand depth map is the min over the 41 sphere part maps (render.py:89).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from spherehand_tpu.constants import Constants

_C = Constants()


def _fuse_spheres(size: int) -> bool:
    """Route through the fused Pallas kernels (render/sphere_pallas.py)?

    True on TPU for lane-divisible canvases: the fused forward is
    numerically equivalent to the XLA path here (same expression order;
    differences are compiler fp-contraction ulps) and the custom VJP
    matches autodiff to ~5e-6 relative (tests/test_sphere_pallas.py),
    while avoiding the (N, J, S, S) HBM intermediates in both passes.
    CPU keeps the pure-XLA path (the oracle the goldens pin).
    """
    return jax.default_backend() == "tpu" and (size * size) % 128 == 0


def _mm_grid(height: int, width: int, dtype) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pixel-center grid in millimetres; x varies along axis -1, y along -2."""
    u = (jnp.arange(width, dtype=dtype) - width / 2.0) * _C.cube_mm / width
    v = (jnp.arange(height, dtype=dtype) - height / 2.0) * _C.cube_mm / height
    return u[None, :], v[:, None]  # broadcast to (H, W)


def render_spheres(centers: jnp.ndarray, radii: jnp.ndarray, size: int) -> jnp.ndarray:
    """Render each sphere to its own orthographic depth map.

    centers: (..., 3) sphere centers in mm camera space; radii: (...) mm.
    Returns (..., size, size) depth maps: ``z - sqrt(r^2 - dx^2 - dy^2)`` inside
    the silhouette, 100.0 outside (reference mesh/render.py:26-53).
    """
    dtype = centers.dtype
    x_grid, y_grid = _mm_grid(size, size, dtype)
    x = centers[..., 0, None, None]
    y = centers[..., 1, None, None]
    z = centers[..., 2, None, None]
    r = radii[..., None, None]
    sq = r * r - (x_grid - x) ** 2 - (y_grid - y) ** 2
    sq = jnp.clip(sq, min=1e-2)
    inside = sq > 1e-2
    depth = z - jnp.sqrt(sq)
    return jnp.where(inside, depth, jnp.asarray(_C.background_depth, dtype))


def render_sphere_hand(centers: jnp.ndarray, radii: jnp.ndarray, size: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Render a set of spheres and min-reduce into one hand depth map.

    centers: (..., J, 3); radii: (J,) or broadcastable to (..., J).
    Returns (part_maps (..., J, size, size), depth_map (..., size, size)),
    matching HandBallPrimitiveRender (reference mesh/render.py:81-90).
    """
    radii = jnp.broadcast_to(radii, centers.shape[:-1]).astype(centers.dtype)
    part_maps = render_spheres(centers, radii, size)
    return part_maps, jnp.min(part_maps, axis=-3)


def data_to_model_distance(
    depth_maps: jnp.ndarray,
    centers: jnp.ndarray,
    radii: jnp.ndarray,
    weights: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Mean distance from observed depth pixels to the nearest sphere surface.

    depth_maps: (..., H, W) in mm (background 100); centers: (..., J, 3) mm;
    radii: (J,); weights: optional (batch,) row weights for padded
    data-parallel batches (spherehand_tpu.ops.reduce). Every foreground pixel
    is backprojected to 3D; its distance to
    the nearest sphere surface ``| ||p - c|| - r |`` is clamped to [0, 50] and
    averaged over ALL pixels (background contributes 0), matching
    DataToModelLoss (reference mesh/render.py:123-142).

    Unlike the reference — which materializes a (B, J, H, W, 3) displacement
    field — this accumulates the squared distance via the expansion
    ``||p - c||^2 = ||p||^2 + ||c||^2 - 2 p.c`` so the (pixels x joints)
    working set is a single (B, J, H, W) tensor; on TPU the ``p.c`` term is a
    (H*W, 3) x (3, J) MXU contraction per batch element.
    """
    dtype = depth_maps.dtype
    height, width = depth_maps.shape[-2:]
    if height == width and depth_maps.ndim >= 3 and _fuse_spheres(height):
        # Fused Pallas nearest-surface field: no (..., J, H, W) HBM
        # intermediates in either pass (render/sphere_pallas.py). The
        # depth input is observed data at every call site (no gradient).
        from spherehand_tpu.ops.reduce import bmean
        from spherehand_tpu.render.sphere_pallas import d2m_nearest

        lead = depth_maps.shape[:-2]
        nearest = d2m_nearest(
            depth_maps.reshape((-1, height, width)),
            centers.reshape((-1,) + centers.shape[-2:]),
            radii,
            height,
        ).reshape(lead + (height, width))
        return bmean(jnp.clip(nearest, 0.0, 50.0), weights)
    x_grid, y_grid = _mm_grid(height, width, dtype)
    z = depth_maps  # (..., H, W)
    # ||p||^2 per pixel and p.c per (joint, pixel).
    p_sq = x_grid * x_grid + y_grid * y_grid + z * z  # (..., H, W)
    cx = centers[..., 0, None, None]
    cy = centers[..., 1, None, None]
    cz = centers[..., 2, None, None]
    p_dot_c = (
        x_grid * cx + y_grid * cy + z[..., None, :, :] * cz
    )  # (..., J, H, W)
    c_sq = jnp.sum(centers * centers, axis=-1)[..., None, None]
    # Floor keeps sqrt differentiable when a pixel coincides with a center.
    sq_dist = jnp.maximum(p_sq[..., None, :, :] - 2.0 * p_dot_c + c_sq, 1e-6)
    dist_to_surface = jnp.abs(jnp.sqrt(sq_dist) - radii[..., None, None].astype(dtype))
    background = depth_maps > 99.0
    dist_to_surface = jnp.where(background[..., None, :, :], 0.0, dist_to_surface)
    nearest = jnp.min(dist_to_surface, axis=-3)
    from spherehand_tpu.ops.reduce import bmean

    return bmean(jnp.clip(nearest, 0.0, 50.0), weights)
