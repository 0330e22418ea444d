"""Fused Pallas kernels for the differentiable sphere-render core.

The mutual-projection loss renders (B, V, V, J) spheres and measures the
point-to-sphere distance field on (B, V, V) view pairs — with J=41 joints at
64x64 this materializes ~150 MB (N, J, S, S) intermediates in BOTH the
forward and the autodiff backward pass of the XLA path
(:mod:`spherehand_tpu.render.sphere`), ~3.5 ms/step of pure HBM traffic at
the reference batch geometry (the two biggest ops in the combined-step
device trace, PERF.md round 4).

These kernels keep the J loop in registers: one program per image computes
the min-depth (or nearest-distance) plane plus the argmin sphere index, and
the custom-VJP backward replays the J loop against the stored argmin to
accumulate per-sphere center gradients — the only HBM traffic is the
(N, S, S) planes themselves.

Numerics: the forward expression order replicates
:func:`spherehand_tpu.render.sphere.render_spheres` /
:func:`data_to_model_distance` exactly, and fp ``min`` is associative, so
forward outputs are bit-identical to the XLA path. The backward differs from
autodiff ONLY on exact depth ties between spheres (autodiff splits the
gradient among ties; the kernel assigns it to the lowest sphere index — a
measure-zero event for continuous centers).

The canvas is computed in (S*S/128, 128) layout (full lanes; a (64, 64)
grid would waste half of every vector register) and reshaped by the caller.

Reference provenance: mesh/render.py:26-53 (BallRender), :89
(min over spheres), :123-142 (DataToModelLoss).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spherehand_tpu.constants import Constants

_C = Constants()

_LANES = 128


def _grid_rows(size: int):
    """Pixel-center mm coordinates for the flat (rows, 128) canvas layout.

    Flat pixel p = v * size + u lives at [p // 128, p % 128]; returns
    (x, y) arrays of shape (size*size // 128, 128) matching sphere._mm_grid.
    """
    rows = size * size // _LANES
    p = jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 0) * _LANES + (
        jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 1)
    )
    u = (p % size).astype(jnp.float32)
    v = (p // size).astype(jnp.float32)
    # Two separate fp ops, exactly like sphere._mm_grid's
    # ``(arange - w/2) * cube_mm / w`` — folding them into one precomputed
    # scale rounds differently (~1e-5 mm), which is enough to flip argmins
    # at sphere-intersection pixels and misroute their gradients.
    half = size / 2.0
    return ((u - half) * _C.cube_mm) / size, ((v - half) * _C.cube_mm) / size


def _sphere_fields(cref, n_pad, j, xg, yg):
    """Per-sphere depth plane, replicating render_spheres' expression order."""
    cx = cref[0, j, 0]
    cy = cref[0, j, 1]
    cz = cref[0, j, 2]
    r = cref[0, j, 3]
    sq = r * r - (xg - cx) ** 2 - (yg - cy) ** 2
    sqc = jnp.maximum(sq, 1e-2)
    inside = sq > 1e-2
    depth = cz - jnp.sqrt(sqc)
    return jnp.where(inside, depth, _C.background_depth), inside, sqc, cx, cy


def _min_depth_fwd_kernel(cref, depth_ref, amin_ref, *, num_j, size):
    xg, yg = _grid_rows(size)
    best = jnp.full(xg.shape, jnp.inf, jnp.float32)
    bestj = jnp.zeros(xg.shape, jnp.int32)

    for j in range(num_j):
        d, _, _, _, _ = _sphere_fields(cref, None, j, xg, yg)
        upd = d < best
        best = jnp.where(upd, d, best)
        bestj = jnp.where(upd, j, bestj)
    depth_ref[0, :, :] = best
    amin_ref[0, :, :] = bestj


def _min_depth_bwd_kernel(cref, g_ref, amin_ref, out_ref, *, num_j, size):
    xg, yg = _grid_rows(size)
    g = g_ref[0, :, :]
    amin = amin_ref[0, :, :]
    for j in range(num_j):
        d, inside, sqc, cx, cy = _sphere_fields(cref, None, j, xg, yg)
        # where(inside, depth, bg) and sqc = max(sq, 1e-2): gradient flows
        # only inside the (unclipped) silhouette, exactly like autodiff
        # through jnp.where + jnp.clip(min=...).
        sel = (amin == j) & inside
        gm = jnp.where(sel, g, 0.0)
        inv = jax.lax.rsqrt(sqc)
        # depth = cz - sqrt(sqc); dsq/dcx = +2 (xg - cx), so
        # d depth / d cx = -(xg - cx) / sqrt(sqc).
        gx = jnp.sum(gm * ((cx - xg) * inv))
        gy = jnp.sum(gm * ((cy - yg) * inv))
        gz = jnp.sum(gm)
        out_ref[0, j, 0] = gx
        out_ref[0, j, 1] = gy
        out_ref[0, j, 2] = gz


def _d2m_fwd_kernel(cref, z_ref, dist_ref, amin_ref, *, num_j, size):
    xg, yg = _grid_rows(size)
    z = z_ref[0, :, :]
    p_sq = xg * xg + yg * yg + z * z
    background = z > 99.0
    best = jnp.full(xg.shape, jnp.inf, jnp.float32)
    bestj = jnp.zeros(xg.shape, jnp.int32)
    for j in range(num_j):
        cx = cref[0, j, 0]
        cy = cref[0, j, 1]
        cz = cref[0, j, 2]
        r = cref[0, j, 3]
        c_sq = cx * cx + cy * cy + cz * cz
        p_dot_c = xg * cx + yg * cy + z * cz
        sq_dist = jnp.maximum(p_sq - 2.0 * p_dot_c + c_sq, 1e-6)
        dist = jnp.abs(jnp.sqrt(sq_dist) - r)
        dist = jnp.where(background, 0.0, dist)
        upd = dist < best
        best = jnp.where(upd, dist, best)
        bestj = jnp.where(upd, j, bestj)
    dist_ref[0, :, :] = best
    amin_ref[0, :, :] = bestj


def _d2m_bwd_kernel(cref, z_ref, g_ref, amin_ref, out_ref, *, num_j, size):
    xg, yg = _grid_rows(size)
    z = z_ref[0, :, :]
    p_sq = xg * xg + yg * yg + z * z
    background = z > 99.0
    g = jnp.where(background, 0.0, g_ref[0, :, :])
    amin = amin_ref[0, :, :]
    for j in range(num_j):
        cx = cref[0, j, 0]
        cy = cref[0, j, 1]
        cz = cref[0, j, 2]
        r = cref[0, j, 3]
        c_sq = cx * cx + cy * cy + cz * cz
        p_dot_c = xg * cx + yg * cy + z * cz
        sq_dist = p_sq - 2.0 * p_dot_c + c_sq
        clipped = sq_dist < 1e-6
        sq_dist = jnp.maximum(sq_dist, 1e-6)
        root = jnp.sqrt(sq_dist)
        # dist = |root - r|; d dist/d c = sign(root - r) * (c - p) / root,
        # zero where the sq-dist floor clips (matches jnp.maximum autodiff).
        sel = (amin == j) & ~clipped
        gm = jnp.where(sel, g * jnp.sign(root - r) / root, 0.0)
        out_ref[0, j, 0] = jnp.sum(gm * (cx - xg))
        out_ref[0, j, 1] = jnp.sum(gm * (cy - yg))
        out_ref[0, j, 2] = jnp.sum(gm * (cz - z))


def _pack_centers(centers, radii):
    n, num_j = centers.shape[0], centers.shape[1]
    packed = jnp.concatenate(
        [centers, jnp.broadcast_to(radii, (n, num_j))[..., None]], axis=-1
    )
    return packed.astype(jnp.float32)  # (N, J, 4)


def _smem_spec(num_j):
    return pl.BlockSpec(
        (1, num_j, 4), lambda n: (n, 0, 0), memory_space=pltpu.SMEM
    )


def _plane_spec(rows):
    return pl.BlockSpec((1, rows, _LANES), lambda n: (n, 0, 0))


def _grads_spec(num_j):
    return pl.BlockSpec(
        (1, num_j, 4), lambda n: (n, 0, 0), memory_space=pltpu.SMEM
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def sphere_min_depth(centers, radii, size, interpret=False):
    """min_j of the orthographic sphere depth planes, fused over J.

    centers (N, J, 3) mm, radii (J,) -> (N, size, size); bit-identical to
    ``jnp.min(render_spheres(...), axis=-3)`` with gradient support w.r.t.
    ``centers`` (radii are treated as constants, as everywhere in the
    reference loss stack).
    """
    depth, _ = _min_depth_fwd(centers, radii, size, interpret)
    return depth


def _min_depth_fwd(centers, radii, size, interpret):
    n, num_j = centers.shape[0], centers.shape[1]
    rows = size * size // _LANES
    packed = _pack_centers(centers, radii)
    depth, amin = pl.pallas_call(
        functools.partial(_min_depth_fwd_kernel, num_j=num_j, size=size),
        grid=(n,),
        in_specs=[_smem_spec(num_j)],
        out_specs=[_plane_spec(rows), _plane_spec(rows)],
        out_shape=[
            jax.ShapeDtypeStruct((n, rows, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((n, rows, _LANES), jnp.int32),
        ],
        interpret=interpret,
    )(packed)
    return depth.reshape(n, size, size), (packed, amin)


def _min_depth_fwd_rule(centers, radii, size, interpret):
    depth, res = _min_depth_fwd(centers, radii, size, interpret)
    return depth, res


def _min_depth_bwd_rule(size, interpret, res, g):
    packed, amin = res
    n, num_j = packed.shape[0], packed.shape[1]
    rows = size * size // _LANES
    grads = pl.pallas_call(
        functools.partial(_min_depth_bwd_kernel, num_j=num_j, size=size),
        grid=(n,),
        in_specs=[
            _smem_spec(num_j),
            _plane_spec(rows),
            _plane_spec(rows),
        ],
        out_specs=_grads_spec(num_j),
        out_shape=jax.ShapeDtypeStruct((n, num_j, 4), jnp.float32),
        interpret=interpret,
    )(packed, g.reshape(n, rows, _LANES).astype(jnp.float32), amin)
    # radii are constants everywhere in the reference loss stack; a zero
    # cotangent (rather than a real derivative) is documented API.
    return grads[..., :3].astype(packed.dtype), jnp.zeros(
        (packed.shape[1],), packed.dtype
    )


sphere_min_depth.defvjp(_min_depth_fwd_rule, _min_depth_bwd_rule)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def d2m_nearest(depth_maps, centers, radii, size, interpret=False):
    """Per-pixel distance to the nearest sphere surface, fused over J.

    depth_maps (N, size, size) mm (DATA — not differentiated; every call
    site feeds observed sensor depth), centers (N, J, 3) -> (N, size, size),
    bit-identical to the min over J of sphere.data_to_model_distance's
    ``dist_to_surface`` (background pixels 0). Gradients w.r.t. ``centers``.
    """
    dist, _ = _d2m_fwd(depth_maps, centers, radii, size, interpret)
    return dist


def _d2m_fwd(depth_maps, centers, radii, size, interpret):
    n, num_j = centers.shape[0], centers.shape[1]
    rows = size * size // _LANES
    packed = _pack_centers(centers, radii)
    z = depth_maps.reshape(n, rows, _LANES).astype(jnp.float32)
    dist, amin = pl.pallas_call(
        functools.partial(_d2m_fwd_kernel, num_j=num_j, size=size),
        grid=(n,),
        in_specs=[_smem_spec(num_j), _plane_spec(rows)],
        out_specs=[_plane_spec(rows), _plane_spec(rows)],
        out_shape=[
            jax.ShapeDtypeStruct((n, rows, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((n, rows, _LANES), jnp.int32),
        ],
        interpret=interpret,
    )(packed, z)
    return dist.reshape(n, size, size), (packed, z, amin)


def _d2m_fwd_rule(depth_maps, centers, radii, size, interpret):
    dist, res = _d2m_fwd(depth_maps, centers, radii, size, interpret)
    return dist, res


def _d2m_bwd_rule(size, interpret, res, g):
    packed, z, amin = res
    n, num_j = packed.shape[0], packed.shape[1]
    rows = size * size // _LANES
    grads = pl.pallas_call(
        functools.partial(_d2m_bwd_kernel, num_j=num_j, size=size),
        grid=(n,),
        in_specs=[
            _smem_spec(num_j),
            _plane_spec(rows),
            _plane_spec(rows),
            _plane_spec(rows),
        ],
        out_specs=_grads_spec(num_j),
        out_shape=jax.ShapeDtypeStruct((n, num_j, 4), jnp.float32),
        interpret=interpret,
    )(packed, z, g.reshape(n, rows, _LANES).astype(jnp.float32), amin)
    return (
        jnp.zeros((n, size, size), packed.dtype),  # depth is data (docstring)
        grads[..., :3].astype(packed.dtype),
        jnp.zeros((num_j,), packed.dtype),  # radii constant (docstring)
    )


d2m_nearest.defvjp(_d2m_fwd_rule, _d2m_bwd_rule)
