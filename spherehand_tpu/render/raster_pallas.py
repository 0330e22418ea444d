"""Tile-binned Pallas z-buffer rasterizer — the production TPU render path.

Same coverage/depth semantics as :mod:`spherehand_tpu.render.raster` (which
replicates the reference CUDA kernel, depth_rasterization_cuda_kernel.cu), but
restructured for TPU speed-of-light. Design, shaped by per-op profiling on a
v5e chip:

1. **Binning (XLA pre-pass).** Each face gets ONE sort key: the sample tile
   containing its bbox LOW corner (faces spanning more than 2x2 tiles go to a
   shared overflow bucket; off-screen/degenerate faces to a dump bucket at the
   end). One ``sort_key_val`` of F entries orders the face records by bucket;
   per-bucket offsets come from a histogram + cumsum (searchsorted's binary-
   search lowering is a TPU while-loop that once dominated this pipeline).
   A tile's relevant faces (bbox <= tile size => low corner in its 2x2 upper-
   left neighborhood) then live in two contiguous windows of the sorted
   buffer: buckets {t-1, t} and {t-tiles_x-1, t-tiles_x}.

2. **Vertex sorting by select, not gather.** The CUDA-order x-sort of each
   face's vertices is computed with elementwise ``where`` ladders; a
   ``take_along_axis`` formulation lowers to a 12-byte-row gather that costs
   more than the entire rasterization kernel.

3. **Kernel.** Grid = (batch,): one program per image. The whole sorted
   record buffer rides into VMEM through the normal BlockSpec pipeline (auto
   double-buffered across grid steps) — no manual DMA, no per-tile program
   overhead (a (batch x tiles) grid spent ~0.9 us/program of fixed cost).
   Orientation puts FACES ON SUBLANES and SAMPLES ON LANES: records are
   (entry, field) blocks, the z-buffer row per tile is a (1, 64) lane vector,
   and per-tile stores hit dynamic sublane offsets — all shapes Mosaic lays
   out compactly (a lane-sized-1 layout padded every row to 128 lanes and
   blew the 16 MB VMEM budget). No atomics anywhere: the z-test is a lane
   reduction (the CUDA original needs a CAS loop, .cu:6-16).

Face record layout (FREC=24 columns per entry row):
  0-2  p0x p1x p2x (x-sorted)     3-5  p0y p1y p2y
  6-8  s01 s12 s02 (edge slopes)  9-10 vert01 vert12 (vertical-edge flags)
  11-13 r0 r1 r2 (1/z)            14-22 barycentric inverse (row-major)
  23   valid
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FREC = 24  # fields per face record
CHUNK = 128  # faces per compute chunk (sublane dimension)
TILE_S = 8  # tile edge in samples -> 64 samples/tile


def _sort_vertices_by_x(face_vertices: jnp.ndarray) -> jnp.ndarray:
    """Sort each face's 3 vertices left-to-right with the CUDA tie rules
    (.cu:38-45), as pure elementwise selects (gathers are slow on TPU)."""
    v0 = face_vertices[..., 0, :]
    v1 = face_vertices[..., 1, :]
    v2 = face_vertices[..., 2, :]
    x0, x1, x2 = v0[..., 0], v1[..., 0], v2[..., 0]

    c01 = x0 < x1
    pi0 = jnp.where(c01, jnp.where(x2 < x0, 2, 0), jnp.where(x2 < x1, 2, 1))
    pi2 = jnp.where(c01, jnp.where(x1 < x2, 2, 1), jnp.where(x0 < x2, 2, 0))
    pi1 = 3 - pi0 - pi2

    def pick(idx):
        sel = idx[..., None]
        return jnp.where(sel == 0, v0, jnp.where(sel == 1, v1, v2))

    return jnp.stack([pick(pi0), pick(pi1), pick(pi2)], axis=-2)


def face_setup_fast(face_vertices: jnp.ndarray):
    """Like raster.face_setup but with select-based vertex sorting."""
    x = face_vertices[..., 0]
    y = face_vertices[..., 1]
    front = (y[..., 2] - y[..., 0]) * (x[..., 1] - x[..., 0]) >= (
        y[..., 1] - y[..., 0]
    ) * (x[..., 2] - x[..., 0])

    p = _sort_vertices_by_x(face_vertices)
    px0, px2 = p[..., 0, 0], p[..., 2, 0]
    py0, py1, py2 = p[..., 0, 1], p[..., 1, 1], p[..., 2, 1]
    px1 = p[..., 1, 0]

    den = px2 * (py0 - py1) + px0 * (py1 - py2) + px1 * (py2 - py0)
    nondegenerate = (px0 != px2) & (den != 0.0)
    safe_den = jnp.where(den == 0.0, 1.0, den)
    row0 = jnp.stack([py1 - py2, px2 - px1, px1 * py2 - px2 * py1], axis=-1)
    row1 = jnp.stack([py2 - py0, px0 - px2, px2 * py0 - px0 * py2], axis=-1)
    row2 = jnp.stack([py0 - py1, px1 - px0, px0 * py1 - px1 * py0], axis=-1)
    face_inv = jnp.stack([row0, row1, row2], axis=-2) / safe_den[..., None, None]
    return p, face_inv, front & nondegenerate


def _build_face_records(p, face_inv, valid):
    """(B, F, 3, 3) sorted verts + inverse + valid -> (B, F, FREC) records."""
    px = p[..., 0]
    py = p[..., 1]
    pz = p[..., 2]

    def safe_slope(a, b):
        dx = px[..., b] - px[..., a]
        return jnp.where(
            dx == 0.0, 0.0, (py[..., b] - py[..., a]) / jnp.where(dx == 0.0, 1.0, dx)
        )

    cols = [
        px[..., 0], px[..., 1], px[..., 2],
        py[..., 0], py[..., 1], py[..., 2],
        safe_slope(0, 1), safe_slope(1, 2), safe_slope(0, 2),
        (px[..., 1] == px[..., 0]).astype(jnp.float32),
        (px[..., 2] == px[..., 1]).astype(jnp.float32),
        1.0 / pz[..., 0], 1.0 / pz[..., 1], 1.0 / pz[..., 2],
    ]
    inv_flat = face_inv.reshape(face_inv.shape[:-2] + (9,))
    cols.extend(inv_flat[..., k] for k in range(9))
    cols.append(valid.astype(jnp.float32))
    return jnp.stack(cols, axis=-1)  # (B, F, FREC)


def _bin_faces(p, valid, sample_x, sample_y, tiles_x, tiles_y, width, height):
    """Single low-corner tile key per face. Returns (keys (B, F), num_tiles)."""
    num_tiles = tiles_x * tiles_y
    overflow, dump = num_tiles, num_tiles + 1

    px = p[..., 0]
    py = p[..., 1]
    xmin, xmax = px[..., 0], px[..., 2]
    ymin = jnp.min(py, axis=-1)
    ymax = jnp.max(py, axis=-1)
    xmax_c = jnp.trunc(jnp.minimum(xmax, width - 1.0))
    ymax_c = jnp.trunc(jnp.minimum(ymax, height - 1.0))

    # compare_all: the default binary-search lowering is a while loop that
    # once dominated the whole render (4 x ~26 ms per 128-batch call).
    def srt(grid, v, side):
        return jnp.searchsorted(grid, v, side=side, method="compare_all")

    i_lo = srt(sample_x, jnp.ceil(xmin), "left")
    i_hi = srt(sample_x, xmax_c, "right") - 1
    j_lo = srt(sample_y, jnp.ceil(ymin), "left")
    j_hi = srt(sample_y, ymax_c, "right") - 1
    empty = (i_hi < i_lo) | (j_hi < j_lo) | ~valid

    tx_lo = jnp.clip(i_lo // TILE_S, 0, tiles_x - 1)
    tx_hi = jnp.clip(i_hi // TILE_S, 0, tiles_x - 1)
    ty_lo = jnp.clip(j_lo // TILE_S, 0, tiles_y - 1)
    ty_hi = jnp.clip(j_hi // TILE_S, 0, tiles_y - 1)
    big = ((tx_hi - tx_lo) > 1) | ((ty_hi - ty_lo) > 1)

    low_corner = ty_lo * tiles_x + tx_lo
    keys = jnp.where(empty, dump, jnp.where(big, overflow, low_corner))
    return keys.astype(jnp.int32), num_tiles


QUAD = 4  # tiles processed per loop iteration (4 x 64 samples = 256 lanes)


def _raster_kernel(
    starts_ref,  # scalar prefetch: (B*(NT+2),) int32
    xcoord_ref,  # (NT/QUAD, QUAD*64) per-quad sample x (full array in VMEM)
    ycoord_ref,  # (NT/QUAD, QUAD*64)
    fdata_ref,   # (1, E, FREC) sorted face records (block, auto-pipelined)
    out_ref,     # (1, NT/QUAD, QUAD*64)
    *,
    num_tiles: int,
    tiles_x: int,
    width: int,
    height: int,
    exact: bool,
):
    b = pl.program_id(0)
    base = b * (num_tiles + 2)
    lanes = QUAD * TILE_S * TILE_S

    def quad_body(q, _):
        t0 = q * QUAD
        x = xcoord_ref[q, :][None, :]  # (1, lanes)
        y = ycoord_ref[q, :][None, :]

        def process_range(rs, re, zbuf):
            # Sublane tiling is 8: align the window start down to 8.
            aligned_rs = (rs // 8) * 8

            def chunk_exact(i, zbuf):
                """CUDA scanline-span semantics (the parity mode)."""
                off = pl.multiple_of(aligned_rs + i * CHUNK, 8)
                f = fdata_ref[0, pl.ds(off, CHUNK), :]  # (CHUNK, FREC)

                def col(k):
                    return f[:, k][:, None]  # (CHUNK, 1), broadcasts over lanes

                p0x, p1x, p2x = col(0), col(1), col(2)
                p0y, p1y, p2y = col(3), col(4), col(5)
                s01, s12, s02 = col(6), col(7), col(8)
                vert01, vert12 = col(9) > 0.5, col(10) > 0.5
                r0, r1, r2 = col(11), col(12), col(13)
                valid = col(23) > 0.5

                e01 = s01 * (x - p0x) + p0y
                e12 = s12 * (x - p1x) + p1y
                yi1 = jnp.where(
                    x <= p1x,
                    jnp.where(vert01, p1y, e01),
                    jnp.where(vert12, p1y, e12),
                )
                yi2 = s02 * (x - p0x) + p0y
                y_lo = jnp.ceil(jnp.minimum(yi1, yi2))
                y_hi = jnp.trunc(jnp.minimum(jnp.maximum(yi1, yi2), height - 1.0))
                x_ok = (x >= jnp.ceil(p0x)) & (
                    x <= jnp.trunc(jnp.minimum(p2x, width - 1.0))
                )

                w0 = jnp.clip(col(14) * x + col(15) * y + col(16), 0.0, 1.0)
                w1 = jnp.clip(col(17) * x + col(18) * y + col(19), 0.0, 1.0)
                w2 = jnp.clip(col(20) * x + col(21) * y + col(22), 0.0, 1.0)
                w_sum = w0 + w1 + w2
                depth = w_sum / (w0 * r0 + w1 * r1 + w2 * r2)

                entry = off + jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
                cover = (
                    valid
                    & (entry >= rs)
                    & (entry < re)
                    & x_ok
                    & (y >= y_lo)
                    & (y <= y_hi)
                    & (w_sum > 0.0)
                    & ~jnp.isnan(depth)
                )
                depth = jnp.where(cover, depth, 1000.0)  # (CHUNK, lanes)
                return jnp.minimum(zbuf, jnp.min(depth, axis=0, keepdims=True))

            def chunk_fast(i, zbuf):
                """Half-plane coverage: raw barycentrics all >= 0. Exact
                interpolation everywhere it agrees with the span rule; the two
                differ only at triangle-boundary pixels (sub-pixel silhouette
                detail already blurred by the 2x2 downsample). ~1/3 of the
                exact mode's op count — the training-data production path."""
                off = pl.multiple_of(aligned_rs + i * CHUNK, 8)
                f = fdata_ref[0, pl.ds(off, CHUNK), :]

                def col(k):
                    return f[:, k][:, None]

                w0 = col(14) * x + col(15) * y + col(16)
                w1 = col(17) * x + col(18) * y + col(19)
                w2 = col(20) * x + col(21) * y + col(22)
                q_inv = w0 * col(11) + w1 * col(12) + w2 * col(13)
                depth = 1.0 / q_inv  # sum(w) == 1 for true barycentrics

                entry = off + jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
                cover = (
                    (col(23) > 0.5)
                    & (entry >= rs)
                    & (entry < re)
                    & (jnp.minimum(jnp.minimum(w0, w1), w2) >= 0.0)
                    & ~jnp.isnan(depth)
                )
                depth = jnp.where(cover, depth, 1000.0)
                return jnp.minimum(zbuf, jnp.min(depth, axis=0, keepdims=True))

            chunk_body = chunk_exact if exact else chunk_fast
            n_chunks = jnp.where(
                re > rs, pl.cdiv(jnp.maximum(re - aligned_rs, 0), CHUNK), 0
            )
            return jax.lax.fori_loop(0, n_chunks, chunk_body, zbuf)

        # Windows: faces relevant to tiles t0..t0+3 have their bbox low
        # corner in buckets {t0-1 .. t0+3} (this row, contiguous) or
        # {t0-tiles_x-1 .. t0-tiles_x+3} (the row above); for top-row quads
        # the clamped upper window degenerates to an empty range.
        rs_a = starts_ref[base + jnp.maximum(t0 - 1, 0)]
        re_a = starts_ref[base + t0 + QUAD]
        up = t0 - tiles_x
        rs_b = starts_ref[base + jnp.maximum(up - 1, 0)]
        re_b = starts_ref[base + jnp.maximum(up + QUAD, 0)]
        rs_c = starts_ref[base + num_tiles]
        re_c = starts_ref[base + num_tiles + 1]

        out_ref[0, q, :] = jnp.full((lanes,), 1000.0, jnp.float32)
        work = (re_a > rs_a) | (re_b > rs_b) | (re_c > rs_c)

        @pl.when(work)
        def _():
            zbuf = jnp.full((1, lanes), 1000.0, jnp.float32)
            zbuf = process_range(rs_a, re_a, zbuf)
            zbuf = process_range(rs_b, re_b, zbuf)
            zbuf = process_range(rs_c, re_c, zbuf)
            out_ref[0, q, :] = zbuf[0]

        return 0

    jax.lax.fori_loop(0, num_tiles // QUAD, quad_body, 0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "tiles_x", "tiles_y", "interpret", "exact"
    ),
)
def rasterize_depth_binned(
    face_vertices: jnp.ndarray,
    sample_x: jnp.ndarray,
    sample_y: jnp.ndarray,
    width: int = 640,
    height: int = 640,
    tiles_x: int = 16,
    tiles_y: int = 16,
    interpret: bool = False,
    exact: bool = True,
) -> jnp.ndarray:
    """Tile-binned Pallas rasterization at integer sample positions.

    Same contract as :func:`spherehand_tpu.render.raster.rasterize_depth`;
    requires len(sample_x) == tiles_x * TILE_S and likewise for y.
    """
    batch, num_faces = face_vertices.shape[:2]
    assert sample_x.shape[0] == tiles_x * TILE_S
    assert sample_y.shape[0] == tiles_y * TILE_S

    p, face_inv, valid = face_setup_fast(face_vertices)
    keys, num_tiles = _bin_faces(
        p, valid, sample_x, sample_y, tiles_x, tiles_y, width, height
    )
    face_ids = jnp.broadcast_to(
        jnp.arange(num_faces, dtype=jnp.int32)[None], keys.shape
    )
    _, order = jax.lax.sort_key_val(keys, face_ids, dimension=-1)

    # Per-bucket range starts: histogram prefix sums of the small-domain keys
    # (searchsorted's while-loop lowering is slow on TPU).
    counts = jnp.sum(
        keys[:, :, None] == jnp.arange(num_tiles + 2, dtype=jnp.int32),
        axis=1,
        dtype=jnp.int32,
    )
    starts = jnp.concatenate(
        [
            jnp.zeros((batch, 1), jnp.int32),
            jnp.cumsum(counts[:, :-1], axis=-1, dtype=jnp.int32),
        ],
        axis=-1,
    )  # (B, NT+2)

    # Records in (entry, field) orientation — whole 96-byte-row gather, no
    # transposes, and the kernel's natural sublane-major layout.
    fdata = _build_face_records(p, face_inv, valid)  # (B, F, FREC)
    fdata_sorted = jnp.take_along_axis(fdata, order[:, :, None], axis=1)
    pad = (-fdata_sorted.shape[1]) % CHUNK + CHUNK
    fdata_sorted = jnp.pad(fdata_sorted, ((0, 0), (0, pad), (0, 0)))

    # Per-quad sample coordinate tables (NT/QUAD, QUAD*64): quads are 4
    # consecutive row-major tiles, so the quad rows are just a reshape of the
    # per-tile (NT, 64) table.
    assert tiles_x % QUAD == 0
    samples_per_tile = TILE_S * TILE_S
    shape4 = (tiles_y, tiles_x, TILE_S, TILE_S)
    num_quads = num_tiles // QUAD
    xcoords = jnp.broadcast_to(
        sample_x.reshape(1, tiles_x, 1, TILE_S), shape4
    ).reshape(num_quads, QUAD * samples_per_tile)
    ycoords = jnp.broadcast_to(
        sample_y.reshape(tiles_y, 1, TILE_S, 1), shape4
    ).reshape(num_quads, QUAD * samples_per_tile)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(batch,),
        in_specs=[
            pl.BlockSpec(
                (num_quads, QUAD * samples_per_tile),
                lambda b, s: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (num_quads, QUAD * samples_per_tile),
                lambda b, s: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, fdata_sorted.shape[1], FREC),
                lambda b, s: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, num_quads, QUAD * samples_per_tile),
            lambda b, s: (b, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    kernel = functools.partial(
        _raster_kernel,
        num_tiles=num_tiles,
        tiles_x=tiles_x,
        width=width,
        height=height,
        exact=exact,
    )
    tile_depths = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (batch, num_quads, QUAD * samples_per_tile), jnp.float32
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        starts.reshape(-1),
        xcoords,
        ycoords,
        fdata_sorted,
    )

    # (B, NQ, QUAD*64) -> (B, Sy, Sx): tile t covers rows ty*8..+8, cols tx*8..+8.
    out = tile_depths.reshape(batch, tiles_y, tiles_x, TILE_S, TILE_S)
    return out.transpose(0, 1, 3, 2, 4).reshape(
        batch, tiles_y * TILE_S, tiles_x * TILE_S
    )
