"""Fused Pallas kernels for the differentiable sphere-render core.

The mutual-projection loss renders (B, V, V, J) spheres and measures the
point-to-sphere distance field on (B, V, V) view pairs — with J=41 joints at
64x64 this materializes ~150 MB (N, J, S, S) intermediates in BOTH the
forward and the autodiff backward pass of the XLA path
(:mod:`spherehand_tpu.render.sphere`), ~3.5 ms/step of pure HBM traffic at
the reference batch geometry (the two biggest ops in the combined-step
device trace, PERF.md round 4).

These kernels keep the J loop in registers: one program per image computes
the min-depth (or nearest-distance) plane plus the argmin sphere index AND
a per-pixel gradient-weight plane (the argmin sphere's ``1/||p - c||``
factor, zeroed outside the differentiable region), and the custom-VJP
backward reduces against the stored planes — its J loop is four masked
sums per sphere (the winning sphere's contribution factors as
``c_j * sum(A) - sum(A * grid)``), with no per-sphere field recompute and
no transcendentals. The only HBM traffic is the (N, S, S) planes.

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


def _min_depth_fwd_kernel(cref, depth_ref, amin_ref, w_ref, *, num_j, size):
    xg, yg = _grid_rows(size)
    best = jnp.full(xg.shape, jnp.inf, jnp.float32)
    bestj = jnp.zeros(xg.shape, jnp.int32)
    best_sq = jnp.zeros(xg.shape, jnp.float32)

    for j in range(num_j):
        cx = cref[0, j, 0]
        cy = cref[0, j, 1]
        cz = cref[0, j, 2]
        r = cref[0, j, 3]
        sq = r * r - (xg - cx) ** 2 - (yg - cy) ** 2
        depth = cz - jnp.sqrt(jnp.maximum(sq, 1e-2))
        d = jnp.where(sq > 1e-2, depth, _C.background_depth)
        upd = d < best
        best = jnp.where(upd, d, best)
        bestj = jnp.where(upd, j, bestj)
        best_sq = jnp.where(upd, sq, best_sq)
    depth_ref[0, :, :] = best
    amin_ref[0, :, :] = bestj
    # Gradient weight of the winning sphere: 1/sqrt(clip(sq)) inside the
    # (unclipped) silhouette, 0 elsewhere — where(inside, depth, bg) and
    # sqc = max(sq, 1e-2) pass gradient only there, exactly like autodiff
    # through jnp.where + jnp.clip(min=...).
    w_ref[0, :, :] = jnp.where(
        best_sq > 1e-2, jax.lax.rsqrt(jnp.maximum(best_sq, 1e-2)), 0.0
    )


def _min_depth_primal_kernel(cref, depth_ref, *, num_j, size):
    """Primal-only variant: writes just the depth plane. Pallas outputs are
    not DCE'd, so non-differentiated calls (eval-time losses) would pay the
    amin/w plane HBM writes for nothing — custom_vjp runs this body when the
    call is NOT being differentiated, and the 3-output kernel otherwise."""
    xg, yg = _grid_rows(size)
    best = jnp.full(xg.shape, jnp.inf, jnp.float32)
    for j in range(num_j):
        cx = cref[0, j, 0]
        cy = cref[0, j, 1]
        cz = cref[0, j, 2]
        r = cref[0, j, 3]
        sq = r * r - (xg - cx) ** 2 - (yg - cy) ** 2
        depth = cz - jnp.sqrt(jnp.maximum(sq, 1e-2))
        d = jnp.where(sq > 1e-2, depth, _C.background_depth)
        best = jnp.minimum(best, d)
    depth_ref[0, :, :] = best


def _min_depth_bwd_kernel(cref, g_ref, amin_ref, w_ref, out_ref, *, num_j, size):
    xg, yg = _grid_rows(size)
    g = g_ref[0, :, :]
    amin = amin_ref[0, :, :]
    w = w_ref[0, :, :]
    # depth = cz - sqrt(sqc); d depth / d cx = (cx - xg) / sqrt(sqc). With
    # A = g * w (w = the stored 1/sqrt(sqc) of the winning sphere, 0 outside
    # its silhouette), the winning sphere's gradient factors as
    # gx_j = cx * sum_sel(A) - sum_sel(A * xg) — no field recompute.
    a = g * w
    ax = a * xg
    ay = a * yg
    c = jnp.where(w > 0.0, g, 0.0)  # d depth / d cz = 1 inside
    for j in range(num_j):
        sel = amin == j
        s_a = jnp.sum(jnp.where(sel, a, 0.0))
        out_ref[0, j, 0] = cref[0, j, 0] * s_a - jnp.sum(
            jnp.where(sel, ax, 0.0)
        )
        out_ref[0, j, 1] = cref[0, j, 1] * s_a - jnp.sum(
            jnp.where(sel, ay, 0.0)
        )
        out_ref[0, j, 2] = jnp.sum(jnp.where(sel, c, 0.0))


def _d2m_fwd_kernel(cref, z_ref, dist_ref, amin_ref, w_ref, *, num_j, size):
    xg, yg = _grid_rows(size)
    z = z_ref[0, :, :]
    p_sq = xg * xg + yg * yg + z * z
    background = z > 99.0
    best = jnp.full(xg.shape, jnp.inf, jnp.float32)
    bestj = jnp.zeros(xg.shape, jnp.int32)
    best_raw = jnp.zeros(xg.shape, jnp.float32)
    best_r = jnp.zeros(xg.shape, jnp.float32)
    for j in range(num_j):
        cx = cref[0, j, 0]
        cy = cref[0, j, 1]
        cz = cref[0, j, 2]
        r = cref[0, j, 3]
        c_sq = cx * cx + cy * cy + cz * cz
        p_dot_c = xg * cx + yg * cy + z * cz
        raw = p_sq - 2.0 * p_dot_c + c_sq
        sq_dist = jnp.maximum(raw, 1e-6)
        dist = jnp.abs(jnp.sqrt(sq_dist) - r)
        dist = jnp.where(background, 0.0, dist)
        upd = dist < best
        best = jnp.where(upd, dist, best)
        bestj = jnp.where(upd, j, bestj)
        best_raw = jnp.where(upd, raw, best_raw)
        best_r = jnp.where(upd, r, best_r)
    dist_ref[0, :, :] = best
    amin_ref[0, :, :] = bestj
    # Gradient weight of the winning sphere: dist = |root - r| with
    # root = sqrt(max(raw, 1e-6)), so d dist/d c = sign(root - r)(c - p)/root
    # — zero where the sq-dist floor clips (matches jnp.maximum autodiff).
    root = jnp.sqrt(jnp.maximum(best_raw, 1e-6))
    w_ref[0, :, :] = jnp.where(
        best_raw < 1e-6, 0.0, jnp.sign(root - best_r) / root
    )


def _d2m_primal_kernel(cref, z_ref, dist_ref, *, num_j, size):
    """Primal-only variant of _d2m_fwd_kernel (see _min_depth_primal_kernel)."""
    xg, yg = _grid_rows(size)
    z = z_ref[0, :, :]
    p_sq = xg * xg + yg * yg + z * z
    background = z > 99.0
    best = jnp.full(xg.shape, jnp.inf, jnp.float32)
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
        best = jnp.minimum(best, dist)
    dist_ref[0, :, :] = best


def _d2m_bwd_kernel(cref, z_ref, g_ref, amin_ref, w_ref, out_ref, *, num_j, size):
    xg, yg = _grid_rows(size)
    z = z_ref[0, :, :]
    background = z > 99.0
    g = jnp.where(background, 0.0, g_ref[0, :, :])
    amin = amin_ref[0, :, :]
    # The winning sphere's gradient gm * (c - p) factors through the stored
    # weight plane as c_j * sum_sel(A) - sum_sel(A * p) — four masked sums
    # per sphere, no field recompute.
    a = g * w_ref[0, :, :]
    ax = a * xg
    ay = a * yg
    az = a * z
    for j in range(num_j):
        sel = amin == j
        s_a = jnp.sum(jnp.where(sel, a, 0.0))
        out_ref[0, j, 0] = cref[0, j, 0] * s_a - jnp.sum(
            jnp.where(sel, ax, 0.0)
        )
        out_ref[0, j, 1] = cref[0, j, 1] * s_a - jnp.sum(
            jnp.where(sel, ay, 0.0)
        )
        out_ref[0, j, 2] = cref[0, j, 2] * s_a - jnp.sum(
            jnp.where(sel, az, 0.0)
        )


def _fused_primal_kernel(cref, z_ref, depth_ref, dist_ref, *, num_j, size):
    """Primal-only fused kernel: min-depth render AND nearest-surface
    distance of the same sphere set against the same observed maps, one J
    loop, no residual planes (see sphere_min_depth_and_d2m)."""
    xg, yg = _grid_rows(size)
    z = z_ref[0, :, :]
    p_sq = xg * xg + yg * yg + z * z
    background = z > 99.0
    bestd = jnp.full(xg.shape, jnp.inf, jnp.float32)
    bestm = jnp.full(xg.shape, jnp.inf, jnp.float32)
    for j in range(num_j):
        cx = cref[0, j, 0]
        cy = cref[0, j, 1]
        cz = cref[0, j, 2]
        r = cref[0, j, 3]
        sq = r * r - (xg - cx) ** 2 - (yg - cy) ** 2
        depth = cz - jnp.sqrt(jnp.maximum(sq, 1e-2))
        bestd = jnp.minimum(bestd, jnp.where(sq > 1e-2, depth, _C.background_depth))
        c_sq = cx * cx + cy * cy + cz * cz
        p_dot_c = xg * cx + yg * cy + z * cz
        dist = jnp.abs(jnp.sqrt(jnp.maximum(p_sq - 2.0 * p_dot_c + c_sq, 1e-6)) - r)
        bestm = jnp.minimum(bestm, jnp.where(background, 0.0, dist))
    depth_ref[0, :, :] = bestd
    dist_ref[0, :, :] = bestm


def _fused_fwd_kernel(
    cref, z_ref, depth_ref, dist_ref, amind_ref, wd_ref, aminm_ref, wm_ref,
    *, num_j, size,
):
    """Differentiated-path fused forward: both fields plus both argmin/
    gradient-weight residual plane pairs (the same quantities the separate
    _min_depth_fwd_kernel/_d2m_fwd_kernel produce, one J loop)."""
    xg, yg = _grid_rows(size)
    z = z_ref[0, :, :]
    p_sq = xg * xg + yg * yg + z * z
    background = z > 99.0
    bestd = jnp.full(xg.shape, jnp.inf, jnp.float32)
    bestjd = jnp.zeros(xg.shape, jnp.int32)
    best_sq = jnp.zeros(xg.shape, jnp.float32)
    bestm = jnp.full(xg.shape, jnp.inf, jnp.float32)
    bestjm = jnp.zeros(xg.shape, jnp.int32)
    best_raw = jnp.zeros(xg.shape, jnp.float32)
    best_r = jnp.zeros(xg.shape, jnp.float32)
    for j in range(num_j):
        cx = cref[0, j, 0]
        cy = cref[0, j, 1]
        cz = cref[0, j, 2]
        r = cref[0, j, 3]
        sq = r * r - (xg - cx) ** 2 - (yg - cy) ** 2
        depth = cz - jnp.sqrt(jnp.maximum(sq, 1e-2))
        d = jnp.where(sq > 1e-2, depth, _C.background_depth)
        upd = d < bestd
        bestd = jnp.where(upd, d, bestd)
        bestjd = jnp.where(upd, j, bestjd)
        best_sq = jnp.where(upd, sq, best_sq)
        c_sq = cx * cx + cy * cy + cz * cz
        p_dot_c = xg * cx + yg * cy + z * cz
        raw = p_sq - 2.0 * p_dot_c + c_sq
        dist = jnp.abs(jnp.sqrt(jnp.maximum(raw, 1e-6)) - r)
        dist = jnp.where(background, 0.0, dist)
        updm = dist < bestm
        bestm = jnp.where(updm, dist, bestm)
        bestjm = jnp.where(updm, j, bestjm)
        best_raw = jnp.where(updm, raw, best_raw)
        best_r = jnp.where(updm, r, best_r)
    depth_ref[0, :, :] = bestd
    amind_ref[0, :, :] = bestjd
    wd_ref[0, :, :] = jnp.where(
        best_sq > 1e-2, jax.lax.rsqrt(jnp.maximum(best_sq, 1e-2)), 0.0
    )
    dist_ref[0, :, :] = bestm
    aminm_ref[0, :, :] = bestjm
    # Background folded into the weight plane (dist there is 0 for every
    # sphere, so its cotangent must not leak into any center).
    root = jnp.sqrt(jnp.maximum(best_raw, 1e-6))
    wm_ref[0, :, :] = jnp.where(
        background | (best_raw < 1e-6), 0.0, jnp.sign(root - best_r) / root
    )


def _fused_bwd_kernel(
    cref, z_ref, gd_ref, gm_ref, amind_ref, wd_ref, aminm_ref, wm_ref,
    out_ref, *, num_j, size,
):
    """One backward pass for BOTH cotangents: the render and distance fields
    are functions of the same centers, so the two gradient contributions sum
    into one (N, J, 3) output — a single J loop of masked sums, replacing
    two kernel launches (and the XLA add of their outputs)."""
    xg, yg = _grid_rows(size)
    z = z_ref[0, :, :]
    gd = gd_ref[0, :, :]
    amind = amind_ref[0, :, :]
    wd = wd_ref[0, :, :]
    ad = gd * wd
    adx = ad * xg
    ady = ad * yg
    cd = jnp.where(wd > 0.0, gd, 0.0)  # d depth / d cz = 1 inside
    am = gm_ref[0, :, :] * wm_ref[0, :, :]  # wm already 0 on background
    amx = am * xg
    amy = am * yg
    amz = am * z
    aminm = aminm_ref[0, :, :]
    for j in range(num_j):
        seld = amind == j
        selm = aminm == j
        s_ad = jnp.sum(jnp.where(seld, ad, 0.0))
        s_am = jnp.sum(jnp.where(selm, am, 0.0))
        out_ref[0, j, 0] = (
            cref[0, j, 0] * (s_ad + s_am)
            - jnp.sum(jnp.where(seld, adx, 0.0))
            - jnp.sum(jnp.where(selm, amx, 0.0))
        )
        out_ref[0, j, 1] = (
            cref[0, j, 1] * (s_ad + s_am)
            - jnp.sum(jnp.where(seld, ady, 0.0))
            - jnp.sum(jnp.where(selm, amy, 0.0))
        )
        out_ref[0, j, 2] = (
            jnp.sum(jnp.where(seld, cd, 0.0))
            + cref[0, j, 2] * s_am
            - jnp.sum(jnp.where(selm, amz, 0.0))
        )


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

    Non-differentiated calls (e.g. eval-time losses) run a primal-only
    kernel that writes just the depth plane — the argmin/weight residual
    planes cost ~2x extra HBM output traffic and pallas outputs cannot be
    DCE'd; custom_vjp swaps in the 3-output forward only under autodiff.
    """
    n, num_j = centers.shape[0], centers.shape[1]
    rows = size * size // _LANES
    packed = _pack_centers(centers, radii)
    depth = pl.pallas_call(
        functools.partial(_min_depth_primal_kernel, num_j=num_j, size=size),
        grid=(n,),
        in_specs=[_smem_spec(num_j)],
        out_specs=_plane_spec(rows),
        out_shape=jax.ShapeDtypeStruct((n, rows, _LANES), jnp.float32),
        interpret=interpret,
    )(packed)
    return depth.reshape(n, size, size)


def _min_depth_fwd(centers, radii, size, interpret):
    n, num_j = centers.shape[0], centers.shape[1]
    rows = size * size // _LANES
    packed = _pack_centers(centers, radii)
    depth, amin, w = pl.pallas_call(
        functools.partial(_min_depth_fwd_kernel, num_j=num_j, size=size),
        grid=(n,),
        in_specs=[_smem_spec(num_j)],
        out_specs=[_plane_spec(rows), _plane_spec(rows), _plane_spec(rows)],
        out_shape=[
            jax.ShapeDtypeStruct((n, rows, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((n, rows, _LANES), jnp.int32),
            jax.ShapeDtypeStruct((n, rows, _LANES), jnp.float32),
        ],
        interpret=interpret,
    )(packed)
    return depth.reshape(n, size, size), (packed, amin, w)


def _min_depth_fwd_rule(centers, radii, size, interpret):
    depth, res = _min_depth_fwd(centers, radii, size, interpret)
    return depth, res


def _min_depth_bwd_rule(size, interpret, res, g):
    packed, amin, w = res
    n, num_j = packed.shape[0], packed.shape[1]
    rows = size * size // _LANES
    grads = pl.pallas_call(
        functools.partial(_min_depth_bwd_kernel, num_j=num_j, size=size),
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
    )(packed, g.reshape(n, rows, _LANES).astype(jnp.float32), amin, w)
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

    Non-differentiated calls run a primal-only kernel (just the distance
    plane; see sphere_min_depth) — custom_vjp swaps in the residual-writing
    forward only under autodiff.
    """
    n, num_j = centers.shape[0], centers.shape[1]
    rows = size * size // _LANES
    packed = _pack_centers(centers, radii)
    z = depth_maps.reshape(n, rows, _LANES).astype(jnp.float32)
    dist = pl.pallas_call(
        functools.partial(_d2m_primal_kernel, num_j=num_j, size=size),
        grid=(n,),
        in_specs=[_smem_spec(num_j), _plane_spec(rows)],
        out_specs=_plane_spec(rows),
        out_shape=jax.ShapeDtypeStruct((n, rows, _LANES), jnp.float32),
        interpret=interpret,
    )(packed, z)
    return dist.reshape(n, size, size)


def _d2m_fwd(depth_maps, centers, radii, size, interpret):
    n, num_j = centers.shape[0], centers.shape[1]
    rows = size * size // _LANES
    packed = _pack_centers(centers, radii)
    z = depth_maps.reshape(n, rows, _LANES).astype(jnp.float32)
    dist, amin, w = pl.pallas_call(
        functools.partial(_d2m_fwd_kernel, num_j=num_j, size=size),
        grid=(n,),
        in_specs=[_smem_spec(num_j), _plane_spec(rows)],
        out_specs=[_plane_spec(rows), _plane_spec(rows), _plane_spec(rows)],
        out_shape=[
            jax.ShapeDtypeStruct((n, rows, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((n, rows, _LANES), jnp.int32),
            jax.ShapeDtypeStruct((n, rows, _LANES), jnp.float32),
        ],
        interpret=interpret,
    )(packed, z)
    return dist.reshape(n, size, size), (packed, z, amin, w)


def _d2m_fwd_rule(depth_maps, centers, radii, size, interpret):
    dist, res = _d2m_fwd(depth_maps, centers, radii, size, interpret)
    return dist, res


def _d2m_bwd_rule(size, interpret, res, g):
    packed, z, amin, w = res
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
            _plane_spec(rows),
        ],
        out_specs=_grads_spec(num_j),
        out_shape=jax.ShapeDtypeStruct((n, num_j, 4), jnp.float32),
        interpret=interpret,
    )(packed, z, g.reshape(n, rows, _LANES).astype(jnp.float32), amin, w)
    return (
        jnp.zeros((n, size, size), packed.dtype),  # depth is data (docstring)
        grads[..., :3].astype(packed.dtype),
        jnp.zeros((num_j,), packed.dtype),  # radii constant (docstring)
    )


d2m_nearest.defvjp(_d2m_fwd_rule, _d2m_bwd_rule)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def sphere_min_depth_and_d2m(centers, target_dms, radii, size, interpret=False):
    """Fused mutual-projection core: BOTH loss fields in one kernel pass.

    The mv mutual-projection loss consumes two fields of the SAME sphere set
    against the SAME observed maps — the rendered min depth (m2d MSE term)
    and the nearest-surface distance (d2m term); reference
    mesh/render.py:26-53,89 and :123-142 via multiview_utility.py:90-130.
    Separate kernels pay two J loops, two plane passes and two backward
    launches; fused they share the grid/centers loop, and because both
    cotangents flow to the same ``centers``, the backward emits the SUMMED
    gradient from one launch.

    centers (N, J, 3) mm, target_dms (N, size, size) mm observed data (not
    differentiated), radii (J,) constants -> (depth (N, size, size),
    dist (N, size, size)), each bit-identical to the standalone
    sphere_min_depth / d2m_nearest outputs. Non-differentiated calls run a
    two-output primal kernel with no residual planes.
    """
    n, num_j = centers.shape[0], centers.shape[1]
    rows = size * size // _LANES
    packed = _pack_centers(centers, radii)
    z = target_dms.reshape(n, rows, _LANES).astype(jnp.float32)
    depth, dist = pl.pallas_call(
        functools.partial(_fused_primal_kernel, num_j=num_j, size=size),
        grid=(n,),
        in_specs=[_smem_spec(num_j), _plane_spec(rows)],
        out_specs=[_plane_spec(rows), _plane_spec(rows)],
        out_shape=[
            jax.ShapeDtypeStruct((n, rows, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((n, rows, _LANES), jnp.float32),
        ],
        interpret=interpret,
    )(packed, z)
    return depth.reshape(n, size, size), dist.reshape(n, size, size)


def _fused_fwd_rule(centers, target_dms, radii, size, interpret):
    n, num_j = centers.shape[0], centers.shape[1]
    rows = size * size // _LANES
    packed = _pack_centers(centers, radii)
    z = target_dms.reshape(n, rows, _LANES).astype(jnp.float32)
    plane = jax.ShapeDtypeStruct((n, rows, _LANES), jnp.float32)
    iplane = jax.ShapeDtypeStruct((n, rows, _LANES), jnp.int32)
    depth, dist, amind, wd, aminm, wm = pl.pallas_call(
        functools.partial(_fused_fwd_kernel, num_j=num_j, size=size),
        grid=(n,),
        in_specs=[_smem_spec(num_j), _plane_spec(rows)],
        out_specs=[_plane_spec(rows)] * 6,
        out_shape=[plane, plane, iplane, plane, iplane, plane],
        interpret=interpret,
    )(packed, z)
    out = (depth.reshape(n, size, size), dist.reshape(n, size, size))
    return out, (packed, z, amind, wd, aminm, wm)


def _fused_bwd_rule(size, interpret, res, gs):
    packed, z, amind, wd, aminm, wm = res
    g_depth, g_dist = gs
    n, num_j = packed.shape[0], packed.shape[1]
    rows = size * size // _LANES
    grads = pl.pallas_call(
        functools.partial(_fused_bwd_kernel, num_j=num_j, size=size),
        grid=(n,),
        in_specs=[_smem_spec(num_j)] + [_plane_spec(rows)] * 7,
        out_specs=_grads_spec(num_j),
        out_shape=jax.ShapeDtypeStruct((n, num_j, 4), jnp.float32),
        interpret=interpret,
    )(
        packed,
        z,
        g_depth.reshape(n, rows, _LANES).astype(jnp.float32),
        g_dist.reshape(n, rows, _LANES).astype(jnp.float32),
        amind,
        wd,
        aminm,
        wm,
    )
    return (
        grads[..., :3].astype(packed.dtype),
        jnp.zeros((n, size, size), packed.dtype),  # target is data
        jnp.zeros((num_j,), packed.dtype),  # radii constant
    )


sphere_min_depth_and_d2m.defvjp(_fused_fwd_rule, _fused_bwd_rule)
