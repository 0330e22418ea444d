"""Triangle depth rasterization (z-buffer) in pure XLA.

TPU-native replacement for the reference's CUDA rasterizer
(mesh/cuda_kernel/depth_rasterization_cuda_kernel.cu:18-113). The CUDA design
launches one thread per face and scanline-fills with a float ``atomicMin``;
TPUs have no atomics, so this formulation inverts the loop: every (sample,
face) pair is tested in parallel with pure elementwise math and the z-buffer
is a ``min`` reduction over faces — race-free by construction.

Coverage semantics replicate the CUDA kernel exactly (same scanline span
rules, including its ``(int)`` truncation of negative column/row bounds), so a
sample at integer pixel (x, y) sees the same depth the CUDA kernel writes:

- back-face cull on the *unsorted* winding (``.cu:33``),
- vertices sorted left-to-right by x with the kernel's tie rules (``.cu:38-45``),
- per column x the covered rows span the two polyline edges (``.cu:70-91``),
- perspective-correct depth ``1/z = sum(w_k / z_k)`` from barycentric weights
  clamped to [0, 1] and renormalized (``.cu:97-109``),
- depth buffer initialized to 1000.0 (``.cu:122``); callers clamp to 100.

One deliberate deviation: faces whose sorted (x, y) projection is exactly
collinear (zero barycentric denominator) are skipped outright; the CUDA kernel
divides by zero and relies on ``fminf`` dropping the resulting NaNs.

The key bandwidth trick: the reference renders 640x640 and bilinear-resizes to
64x64 (mesh/render.py:310-311). With align_corners=False and scale 10, output
pixel (i, j) reads *only* input pixels {10i+4, 10i+5} x {10j+4, 10j+5} with
uniform 1/4 weights. So :func:`render_depth_64` evaluates the rasterizer at
just those 128x128 sample positions — 4% of the full canvas — and averages
2x2, reproducing the reference's 640-canvas output bit-for-bit at 1/25 the
coverage work.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from spherehand_tpu.constants import Constants
from spherehand_tpu.hand.assets import HandModel
from spherehand_tpu.hand.skinning import (
    lbs_faces,
    lbs_mesh,
    orthographic_project,
    orthographic_project_xyz,
    project_faces_planes,
)

_C = Constants()

_BACKGROUND_INIT = 1000.0


def face_setup(face_vertices: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-face precomputation shared by all samples.

    face_vertices: (..., F, 3, 3) — per face, 3 vertices of (x, y, z) with x/y
    in output pixel units and z in mm.

    Returns (p, face_inv, valid):
      p        (..., F, 3, 3) vertices sorted by x (leftmost first),
      face_inv (..., F, 3, 3) barycentric interpolation matrix rows,
      valid    (..., F) front-facing, non-degenerate mask.
    """
    x = face_vertices[..., 0]
    y = face_vertices[..., 1]
    x0, x1, x2 = x[..., 0], x[..., 1], x[..., 2]
    y0, y1, y2 = y[..., 0], y[..., 1], y[..., 2]

    # Back-face cull on original winding (.cu:33 rejects when strictly less).
    front = (y2 - y0) * (x1 - x0) >= (y1 - y0) * (x2 - x0)

    # Sort vertices by x, reproducing the kernel's comparison ladder (.cu:38-45).
    c01 = x0 < x1
    pi0 = jnp.where(c01, jnp.where(x2 < x0, 2, 0), jnp.where(x2 < x1, 2, 1))
    pi2 = jnp.where(c01, jnp.where(x1 < x2, 2, 1), jnp.where(x0 < x2, 2, 0))
    pi1 = 3 - pi0 - pi2
    order = jnp.stack([pi0, pi1, pi2], axis=-1)  # (..., F, 3)
    p = jnp.take_along_axis(face_vertices, order[..., None], axis=-2)

    px0, px1, px2 = p[..., 0, 0], p[..., 1, 0], p[..., 2, 0]
    py0, py1, py2 = p[..., 0, 1], p[..., 1, 1], p[..., 2, 1]

    # Barycentric inverse (adjugate / determinant), rows match .cu:57-65.
    den = px2 * (py0 - py1) + px0 * (py1 - py2) + px1 * (py2 - py0)
    nondegenerate = (px0 != px2) & (den != 0.0)
    safe_den = jnp.where(den == 0.0, 1.0, den)
    row0 = jnp.stack([py1 - py2, px2 - px1, px1 * py2 - px2 * py1], axis=-1)
    row1 = jnp.stack([py2 - py0, px0 - px2, px2 * py0 - px0 * py2], axis=-1)
    row2 = jnp.stack([py0 - py1, px1 - px0, px0 * py1 - px1 * py0], axis=-1)
    face_inv = jnp.stack([row0, row1, row2], axis=-2) / safe_den[..., None, None]

    return p, face_inv, front & nondegenerate


def _face_chunk_depth(
    p: jnp.ndarray,
    face_inv: jnp.ndarray,
    valid: jnp.ndarray,
    sample_x: jnp.ndarray,
    sample_y: jnp.ndarray,
    width: int,
    height: int,
) -> jnp.ndarray:
    """Min depth over a face chunk at every sample. p: (B, C, 3, 3) sorted.

    sample_x (Sx,), sample_y (Sy,) are integer-valued pixel coordinates.
    Returns (B, Sy, Sx).
    """
    px = p[..., 0]  # (B, C, 3)
    py = p[..., 1]
    pz = p[..., 2]
    sx = sample_x[None, None, :]  # (1, 1, Sx)

    def edge_y(a: int, b: int) -> jnp.ndarray:
        dx = px[..., b] - px[..., a]
        slope = (py[..., b] - py[..., a]) / jnp.where(dx == 0.0, 1.0, dx)
        yi = slope[..., None] * (sx - px[..., a, None]) + py[..., a, None]
        return jnp.where((dx == 0.0)[..., None], py[..., 1, None], yi)

    # Column span: ceil(p0.x) <= x <= trunc(min(p2.x, width-1))  (.cu:68-69).
    x_hi = jnp.trunc(jnp.minimum(px[..., 2], width - 1.0))
    x_ok = (sx >= jnp.ceil(px[..., 0, None])) & (sx <= x_hi[..., None])

    # Row span at this column: between the two polyline edges (.cu:70-91).
    yi1 = jnp.where(sx <= px[..., 1, None], edge_y(0, 1), edge_y(1, 2))
    yi2 = edge_y(0, 2)
    y_lo = jnp.ceil(jnp.minimum(yi1, yi2))  # (B, C, Sx)
    y_hi = jnp.trunc(jnp.minimum(jnp.maximum(yi1, yi2), height - 1.0))

    # Clamped, renormalized barycentric weights; w = (A x + c) + b y (.cu:97-106).
    wx = face_inv[..., 0, None] * sx[..., None, :] + face_inv[..., 2, None]  # (B,C,3,Sx)
    wy = face_inv[..., 1]  # (B, C, 3)
    sy = sample_y[None, None, None, :, None]  # (1, 1, 1, Sy, 1)
    w = wx[..., None, :] + wy[..., None, None] * sy  # (B, C, 3, Sy, Sx)
    w = jnp.clip(w, 0.0, 1.0)
    w_sum = jnp.sum(w, axis=-3)
    inv_z = jnp.sum(w * (1.0 / pz)[..., None, None], axis=-3) / w_sum  # (B,C,Sy,Sx)
    depth = 1.0 / inv_z

    cover = (
        valid[..., None, None]
        & x_ok[..., None, :]
        & (sy[..., 0, :, :] >= y_lo[..., None, :])
        & (sy[..., 0, :, :] <= y_hi[..., None, :])
        & (w_sum > 0.0)
    )
    # fminf in the CUDA kernel silently drops NaNs; emulate via isnan guard.
    depth = jnp.where(cover & ~jnp.isnan(depth), depth, _BACKGROUND_INIT)
    return jnp.min(depth, axis=-3)  # (B, Sy, Sx)


@functools.partial(jax.jit, static_argnames=("width", "height", "face_chunk"))
def rasterize_depth(
    face_vertices: jnp.ndarray,
    sample_x: jnp.ndarray,
    sample_y: jnp.ndarray,
    width: int = 640,
    height: int = 640,
    face_chunk: int = 128,
) -> jnp.ndarray:
    """Z-buffer depth at the given integer sample positions.

    face_vertices: (B, F, 3, 3); sample_x (Sx,) / sample_y (Sy,) integer-valued
    pixel coordinates (float dtype). Returns (B, Sy, Sx) with background 1000.
    XLA formulation: `lax.scan` over face chunks, each chunk a fully fused
    broadcast + min-reduce; the carry is the running z-buffer.
    """
    batch, num_faces = face_vertices.shape[:2]
    pad = (-num_faces) % face_chunk
    if pad:
        face_vertices = jnp.pad(face_vertices, ((0, 0), (0, pad), (0, 0), (0, 0)))
    p, face_inv, valid = face_setup(face_vertices)
    if pad:
        valid = valid & (jnp.arange(valid.shape[1]) < num_faces)[None, :]

    num_chunks = p.shape[1] // face_chunk
    p = p.reshape(batch, num_chunks, face_chunk, 3, 3).transpose(1, 0, 2, 3, 4)
    face_inv = face_inv.reshape(batch, num_chunks, face_chunk, 3, 3).transpose(1, 0, 2, 3, 4)
    valid = valid.reshape(batch, num_chunks, face_chunk).transpose(1, 0, 2)

    init = jnp.full(
        (batch, sample_y.shape[0], sample_x.shape[0]),
        _BACKGROUND_INIT,
        face_vertices.dtype,
    )

    def body(zbuf, chunk):
        cp, cinv, cvalid = chunk
        depth = _face_chunk_depth(cp, cinv, cvalid, sample_x, sample_y, width, height)
        return jnp.minimum(zbuf, depth), None

    zbuf, _ = jax.lax.scan(body, init, (p, face_inv, valid))
    return zbuf


def bilinear_sample_positions(out_size: int, scale: int) -> np.ndarray:
    """The input pixels a bilinear ``align_corners=False`` downsample reads.

    For integer ``scale`` with ``scale % 2 == 0`` the sample point for output i
    lands exactly halfway between input pixels ``scale*i + scale//2 - 1`` and
    ``scale*i + scale//2`` — the resize is an exact mean of a 2x2 block. This
    matches torch's ``interpolate(mode='bilinear', align_corners=False)`` used
    at mesh/render.py:311 (640 -> 64, scale 10).
    """
    base = scale * np.arange(out_size) + scale // 2 - 1
    return np.stack([base, base + 1], axis=1).reshape(-1).astype(np.float32)


def _assemble_face_verts(
    model: HandModel, transforms: jnp.ndarray, rand_f: jnp.ndarray | None
) -> jnp.ndarray:
    """LBS + project + face assembly -> (B, F, 3, 3) [u, v, z] per vertex.

    Uses the fused face-order LBS when the asset provides it (identical
    math to gather-after-project); the CUDA-parity-comparable front end."""
    if model.skin_matrix_faces is not None:
        verts = lbs_faces(model, transforms)  # (B, 3F, 4)
        face_verts = orthographic_project_xyz(
            verts, float(_C.raster_size), rand_f
        )
    else:
        verts = lbs_mesh(model, transforms)  # (B, V, 4)
        projected = orthographic_project(verts, float(_C.raster_size), rand_f)
        face_verts = projected[:, model.faces.reshape(-1), :3]
    return face_verts.reshape(transforms.shape[0], model.num_faces, 3, 3)


def render_depth_64(
    model: HandModel,
    transforms: jnp.ndarray,
    rand_f: jnp.ndarray | None = None,
    out_size: int = 64,
    backend: str = "auto",
    exact: bool = False,
    chunk_override: int | None = None,
    _diag: tuple = (),
) -> jnp.ndarray:
    """Bone transforms -> 64x64 depth maps in mm, reference-parity path.

    LBS the full mesh, orthographic-project into the 640 canvas, rasterize at
    the 128x128 sparse sample grid, average 2x2, clamp depth to <= 100
    (reference DepthRender + DepthRasterization, mesh/render.py:282-331).

    backend: "pallas" (tile-binned kernel, the production TPU path), "xla"
    (brute-force scan, the oracle/fallback), or "auto" (pallas on TPU).
    exact: scanline-span coverage bit-matching the reference CUDA kernel
    (always used by the xla backend); False selects the pallas kernel's
    half-plane fast mode — identical depths, boundary pixels may differ —
    at ~1/3 the coverage math (the training-data production default).
    """
    scale = _C.raster_size // out_size
    samples = jnp.asarray(bilinear_sample_positions(out_size, scale))
    if backend == "auto":
        backend = "pallas" if jax.default_backend() != "cpu" else "xla"
    if backend == "pallas":
        from spherehand_tpu.render.raster_pallas import rasterize_depth_binned

        tiles = (2 * out_size) // 8
        if model.skin_matrix_faces is not None:
            # Gather-free front end: projection folded into the LBS matmul
            # (skinning.project_faces_planes), coordinate planes fed
            # straight to the column-wise binning pre-pass — no (B, 3F, 4)
            # or (B, F, 3, 3) intermediate is ever materialized.
            planes = project_faces_planes(
                model, transforms, float(_C.raster_size), rand_f
            )
            face_verts, planes_in = None, planes
        else:
            face_verts, planes_in = _assemble_face_verts(
                model, transforms, rand_f
            ), None
        # The truncation bound is a measured per-mesh property shipped in the
        # asset npz (full mesh 0.62: max nondump 48.8% over 1,024,000 sampler
        # poses incl. RandScale + focal jitter; lite mesh 0.70: max 53.9%
        # over 131k poses — both leave a ~30% margin, regression-swept in
        # tests/test_raster_pallas.py). A mesh without a validated bound gets
        # 1.0 (no truncation) — overflowing faces would silently vanish.
        return rasterize_depth_binned(
            face_verts, samples, samples,
            width=_C.raster_size, height=_C.raster_size,
            tiles_x=tiles, tiles_y=tiles, exact=exact,
            valid_frac=model.raster_valid_frac,
            pool_clamp=float(_C.background_depth),
            bilinear_grid=(out_size, scale),
            chunk_override=chunk_override,
            planes=planes_in,
            # _diag: hashable ("_diag_pack4", True)-style pairs forwarded to
            # rasterize_depth_binned — perf-probe levers (tools/probe_chunk).
            **dict(_diag),
        )
    face_verts = _assemble_face_verts(model, transforms, rand_f)
    zbuf = rasterize_depth(
        face_verts, samples, samples,
        width=_C.raster_size, height=_C.raster_size,
    )
    zbuf = jnp.minimum(zbuf, _C.background_depth)  # clamp (mesh/render.py:286)
    batch = zbuf.shape[0]
    blocks = zbuf.reshape(batch, out_size, 2, out_size, 2)
    return blocks.mean(axis=(2, 4))
