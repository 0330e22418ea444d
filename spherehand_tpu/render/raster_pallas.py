"""Tile-binned Pallas z-buffer rasterizer — the production TPU render path.

Same coverage/depth semantics as :mod:`spherehand_tpu.render.raster` (which
replicates the reference CUDA kernel, depth_rasterization_cuda_kernel.cu), but
restructured for TPU speed-of-light:

1. **Binning (XLA pre-pass).** Each face's conservative bbox is mapped to the
   sparse sample grid and assigned to up to 4 sample-tiles (the 2x2 tiles
   containing its bbox corners, deduplicated); faces larger than a tile go to
   a shared overflow list every tile scans. Assignments are sorted by tile
   key (one ``lax.sort_key_val`` of 4F entries) so each tile's faces form ONE
   contiguous range of the sorted face-data buffer — per-tile work then
   scales with the faces actually overlapping that tile (~1.3F total visits)
   instead of all samples x all faces (the brute-force path tests ~40x more
   pairs on a hand render).

2. **Kernel (Pallas).** Grid (batch, tiles); per-tile face ranges arrive via
   scalar prefetch; face records stream HBM -> VMEM in 128-face chunks with
   explicit DMA and a dynamic ``fori_loop`` trip count (empty tiles cost one
   bounds check). Each chunk is a dense (64 samples x 128 faces) VPU block —
   exactly the 8x128-lane register shape — min-reduced into the tile z-buffer.
   No atomics anywhere: the z-test is a lane reduction (the CUDA original
   needs a CAS loop, .cu:6-16).

Face record layout (FREC=24 rows x entry columns, field-major so a chunk DMA
is a (24, 128) aligned block):
  0-2  p0x p1x p2x (x-sorted)     3-5  p0y p1y p2y
  6-8  s01 s12 s02 (edge slopes)  9-10 vert01 vert12 (vertical-edge flags)
  11-13 r0 r1 r2 (1/z)            14-22 barycentric inverse (row-major)
  23   valid
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spherehand_tpu.render.raster import face_setup

FREC = 24  # rows per face record
CHUNK = 128  # faces per kernel chunk (lane dimension)
TILE_S = 8  # tile edge in samples -> 64 samples/tile


def _build_face_records(p, face_inv, valid):
    """(B, F, 3, 3) sorted verts + inverse + valid -> (B, FREC, F) records."""
    px = p[..., 0]  # (B, F, 3)
    py = p[..., 1]
    pz = p[..., 2]

    def safe_slope(a, b):
        dx = px[..., b] - px[..., a]
        return jnp.where(dx == 0.0, 0.0, (py[..., b] - py[..., a]) / jnp.where(dx == 0.0, 1.0, dx))

    rows = [
        px[..., 0], px[..., 1], px[..., 2],
        py[..., 0], py[..., 1], py[..., 2],
        safe_slope(0, 1), safe_slope(1, 2), safe_slope(0, 2),
        (px[..., 1] == px[..., 0]).astype(jnp.float32),
        (px[..., 2] == px[..., 1]).astype(jnp.float32),
        1.0 / pz[..., 0], 1.0 / pz[..., 1], 1.0 / pz[..., 2],
    ]
    inv_flat = face_inv.reshape(face_inv.shape[:-2] + (9,))
    rows.extend(inv_flat[..., k] for k in range(9))
    rows.append(valid.astype(jnp.float32))
    return jnp.stack(rows, axis=-2)  # (B, FREC, F)


def _bin_faces(p, valid, sample_x, sample_y, tiles_x, tiles_y, width, height):
    """Assign faces to sample tiles. Returns (keys (B, 4F), num_tiles)."""
    num_tiles = tiles_x * tiles_y
    overflow, dump = num_tiles, num_tiles + 1

    px = p[..., 0]
    py = p[..., 1]
    xmin, xmax = px[..., 0], px[..., 2]
    ymin = jnp.min(py, axis=-1)
    ymax = jnp.max(py, axis=-1)
    # C-truncation quirk: a max bound in (-1, 0) truncates to -0.0, which a
    # sample at 0 still satisfies (raster.py handles the compare side).
    xmax_c = jnp.trunc(jnp.minimum(xmax, width - 1.0))
    ymax_c = jnp.trunc(jnp.minimum(ymax, height - 1.0))

    # method="compare_all": the default binary-search lowering is a while
    # loop that dominated the whole render (4 x ~26 ms per 128-batch call,
    # measured); a dense compare against the 128-entry grid is ~free.
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

    t00 = ty_lo * tiles_x + tx_lo
    t01 = ty_lo * tiles_x + tx_hi
    t10 = ty_hi * tiles_x + tx_lo
    t11 = ty_hi * tiles_x + tx_hi
    same_x = tx_hi == tx_lo
    same_y = ty_hi == ty_lo
    k0 = jnp.where(empty, dump, jnp.where(big, overflow, t00))
    k1 = jnp.where(empty | big | same_x, dump, t01)
    k2 = jnp.where(empty | big | same_y, dump, t10)
    k3 = jnp.where(empty | big | same_x | same_y, dump, t11)
    keys = jnp.concatenate([k0, k1, k2, k3], axis=-1).astype(jnp.int32)
    return keys, num_tiles


def _raster_kernel(
    starts_ref,  # scalar prefetch: (B*(NT+2),) int32
    xcoord_ref,  # (64, 1) tile sample x, via block index t
    ycoord_ref,  # (64, 1) tile sample y
    fdata_ref,   # (B, FREC, E) face records, HBM
    out_ref,     # (1, 64, 1) -> (B, NT*64, 1) tile depths
    scratch_ref,  # (FREC, CHUNK) VMEM
    sem,
    *,
    num_tiles: int,
    width: int,
    height: int,
):
    b = pl.program_id(0)
    t = pl.program_id(1)
    base = b * (num_tiles + 2)

    x = xcoord_ref[:, :]  # (64, 1)
    y = ycoord_ref[:, :]

    def process_range(rs, re, zbuf):
        # Lane-dim DMA offsets must be 128-aligned on TPU: round the range
        # start down to a CHUNK boundary and mask the leading entries.
        aligned_rs = (rs // CHUNK) * CHUNK

        def chunk_body(i, zbuf):
            off = pl.multiple_of(aligned_rs + i * CHUNK, CHUNK)
            dma = pltpu.make_async_copy(
                fdata_ref.at[b, :, pl.ds(off, CHUNK)], scratch_ref, sem
            )
            dma.start()
            dma.wait()
            f = scratch_ref  # (FREC, CHUNK); rows broadcast over samples
            p0x, p1x, p2x = f[0][None], f[1][None], f[2][None]
            p0y, p1y, p2y = f[3][None], f[4][None], f[5][None]
            s01, s12, s02 = f[6][None], f[7][None], f[8][None]
            vert01, vert12 = f[9][None] > 0.5, f[10][None] > 0.5
            r0, r1, r2 = f[11][None], f[12][None], f[13][None]
            valid = f[23][None] > 0.5

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

            w0 = jnp.clip(f[14][None] * x + f[15][None] * y + f[16][None], 0.0, 1.0)
            w1 = jnp.clip(f[17][None] * x + f[18][None] * y + f[19][None], 0.0, 1.0)
            w2 = jnp.clip(f[20][None] * x + f[21][None] * y + f[22][None], 0.0, 1.0)
            w_sum = w0 + w1 + w2
            depth = w_sum / (w0 * r0 + w1 * r1 + w2 * r2)

            entry = off + jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
            in_range = (entry >= rs) & (entry < re)
            cover = (
                valid
                & in_range
                & x_ok
                & (y >= y_lo)
                & (y <= y_hi)
                & (w_sum > 0.0)
                & ~jnp.isnan(depth)
            )
            depth = jnp.where(cover, depth, 1000.0)
            return jnp.minimum(zbuf, jnp.min(depth, axis=1, keepdims=True))

        n_chunks = jnp.where(
            re > rs, pl.cdiv(jnp.maximum(re - aligned_rs, 0), CHUNK), 0
        )
        return jax.lax.fori_loop(0, n_chunks, chunk_body, zbuf)

    zbuf = jnp.full((64, 1), 1000.0, jnp.float32)
    zbuf = process_range(starts_ref[base + t], starts_ref[base + t + 1], zbuf)
    zbuf = process_range(
        starts_ref[base + num_tiles], starts_ref[base + num_tiles + 1], zbuf
    )
    out_ref[0] = zbuf


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "tiles_x", "tiles_y", "interpret"),
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
) -> jnp.ndarray:
    """Tile-binned Pallas rasterization at integer sample positions.

    Same contract as :func:`spherehand_tpu.render.raster.rasterize_depth`;
    requires len(sample_x) == tiles_x * TILE_S and likewise for y.
    """
    batch, num_faces = face_vertices.shape[:2]
    assert sample_x.shape[0] == tiles_x * TILE_S
    assert sample_y.shape[0] == tiles_y * TILE_S

    p, face_inv, valid = face_setup(face_vertices)
    keys, num_tiles = _bin_faces(
        p, valid, sample_x, sample_y, tiles_x, tiles_y, width, height
    )
    face_ids = jnp.broadcast_to(
        jnp.tile(jnp.arange(num_faces, dtype=jnp.int32), 4)[None],
        keys.shape,
    )
    sorted_keys, order = jax.lax.sort_key_val(keys, face_ids, dimension=-1)

    # Per-tile start offsets: starts[b, t] .. starts[b, t+1] is tile t's
    # entry range; [num_tiles] .. [num_tiles+1] is the overflow range.
    # Per-tile range starts == histogram prefix sums of the (small-domain)
    # keys; a bincount via one-hot sum avoids searchsorted's while-loop
    # lowering on TPU.
    counts = jnp.sum(
        keys[:, :, None] == jnp.arange(num_tiles + 2, dtype=jnp.int32),
        axis=1,
        dtype=jnp.int32,
    )  # (B, NT+2)
    starts = jnp.concatenate(
        [
            jnp.zeros((keys.shape[0], 1), jnp.int32),
            jnp.cumsum(counts[:, :-1], axis=-1, dtype=jnp.int32),
        ],
        axis=-1,
    )  # (B, NT+2): starts[t]..starts[t+1] = tile t's range

    fdata = _build_face_records(p, face_inv, valid)  # (B, FREC, F)
    # Gather whole 96-byte records (rows of the transposed layout) instead of
    # 24 strided single-float gathers, then transpose back to field-major.
    rec_rows = fdata.transpose(0, 2, 1)  # (B, F, FREC)
    gathered = jnp.take_along_axis(rec_rows, order[:, :, None], axis=1)
    fdata_sorted = gathered.transpose(0, 2, 1)  # (B, FREC, E)
    pad = (-fdata_sorted.shape[-1]) % CHUNK + CHUNK
    fdata_sorted = jnp.pad(fdata_sorted, ((0, 0), (0, 0), (0, pad)))

    # Per-tile sample coordinate tables (NT*64, 1) — 64-sublane blocks per
    # tile, sample s = yi*TILE_S + xi (lane-dim-1 layout keeps Mosaic's
    # block-divisibility rules happy).
    shape4 = (tiles_y, tiles_x, TILE_S, TILE_S)
    xcoords = jnp.broadcast_to(
        sample_x.reshape(1, tiles_x, 1, TILE_S), shape4
    ).reshape(num_tiles * TILE_S * TILE_S, 1)
    ycoords = jnp.broadcast_to(
        sample_y.reshape(tiles_y, 1, TILE_S, 1), shape4
    ).reshape(num_tiles * TILE_S * TILE_S, 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(batch, num_tiles),
        in_specs=[
            pl.BlockSpec((64, 1), lambda b, t, s: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 1), lambda b, t, s: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, 64, 1), lambda b, t, s: (b, t, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((FREC, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kernel = functools.partial(
        _raster_kernel, num_tiles=num_tiles, width=width, height=height
    )
    tile_depths = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (batch, num_tiles * TILE_S * TILE_S, 1), jnp.float32
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        starts.reshape(-1),
        xcoords,
        ycoords,
        fdata_sorted,
    )

    # (B, NT*64, 1) -> (B, Sy, Sx): tile t covers rows ty*8..+8, cols tx*8..+8.
    out = tile_depths.reshape(batch, tiles_y, tiles_x, TILE_S, TILE_S)
    return out.transpose(0, 1, 3, 2, 4).reshape(
        batch, tiles_y * TILE_S, tiles_x * TILE_S
    )
