"""Tile-binned Pallas z-buffer rasterizer — the production TPU render path.

Same coverage/depth semantics as :mod:`spherehand_tpu.render.raster` (which
replicates the reference CUDA kernel, depth_rasterization_cuda_kernel.cu), but
restructured for TPU speed-of-light. Design, shaped by per-op profiling on a
v5e chip (history in PERF.md):

1. **Binning (XLA pre-pass).** Each face gets ONE sort key. Since the kernel
   quads span FULL TILE ROWS (quad == tiles_x, the production config), keys
   are TILE-ROW indices: the row containing the bbox LOW corner (faces
   spanning more than 2 tile rows go to a shared overflow bucket —
   horizontal extent never overflows; off-screen/back-facing/degenerate
   faces to a dump bucket at the end). Row r's relevant faces then live in
   ONE contiguous window [starts[r-1], starts[r+1]) of the sorted buffer,
   plus overflow. Per-bucket offsets come from an 18-column histogram +
   cumsum, and each quad's chunk-loop ranges (aligned start + chunk count)
   are precomputed here, vectorized — the kernel does four SMEM reads per
   quad and no scalar arithmetic. For custom tiles_x > quad configs the
   legacy tile-granular keys/windows remain (_quad_ranges docstring).
   With a known uniform ``bilinear_grid`` the bbox->sample-index mapping is
   closed-form integer math; otherwise searchsorted(method="compare_all")
   (the default binary-search lowering is a TPU while-loop that once
   dominated this pipeline).

2. **Payload sort, no gather.** The face records ride through the ONE
   ``jax.lax.sort`` as payload operands (the 9 sorted-vertex coordinates),
   replacing the former sort-then-``take_along_axis`` row gather that cost
   4.6 ms/call at B=128 (~10 ns/row, overhead-bound). Records are then built
   AFTER the sort from the 9 coordinate columns — pure elementwise, fused.
   Sort cost is ~linear in column count (measured 0.83 ms at key+1 to
   5.86 ms at key+9, B=1024 full mesh), so the production fast path packs
   the coordinates into 16-bit fixed point (1/32 px, 1/64 mm — far below
   fast mode's statistical contract) across FIVE total u32 sort columns,
   with the bucket key in the top bits of column 0 (the sorted key column
   is never read back, so it need not be a separate operand); exact mode
   keeps the bit-exact key + 9-column f32 sort.

3. **Truncation.** Only nondump faces (front-facing, on-screen) are ever
   addressed by the kernel windows, and for a closed mesh they are ~half the
   faces. ``valid_frac`` truncates the sorted record buffer to that bound,
   shrinking record build + kernel VMEM traffic. Callers must guarantee the
   nondump count never exceeds the bound (see ``render_depth_64``, which uses
   a statistically validated margin for the hand mesh).

4. **Mask-free overreads.** Chunk windows align down to the sublane tile (8)
   and read whole CHUNK blocks, so the kernel reads rows outside [rs, re).
   Every such row is either (a) a real face whose bin proves it cannot cover
   this quad — the geometric coverage test rejects it — or (b) covers it and
   is ALSO processed by its own window (min/max reductions are idempotent),
   or (c) a dump/padding row, whose record is ZEROED so its coverage term is
   inert. Hence no per-entry index masking at all (the former per-chunk iota
   + two compares + and are gone).

5. **Kernel.** Grid = (batch,): one program per image; the whole sorted
   record buffer rides into VMEM through the normal BlockSpec pipeline (auto
   double-buffered), FACES ON SUBLANES and SAMPLES ON LANES, full-row quads
   (16 tiles = 1024 lanes) per loop iteration with lanes ordered CANVAS
   ROW-MAJOR, so the kernel output is the canvas itself (no tile->canvas
   transpose). No atomics anywhere: the z-test is a lane reduction (the CUDA
   original needs a CAS loop, .cu:6-16).
   - *Fast mode* (production, training-data generation): half-plane coverage
     on raw barycentrics (w2 = 1 - w0 - w1 — true barycentrics sum to one),
     and depth comes from ONE precomputed affine form q = qa*x + qb*y + qc
     (= sum_k w_k/z_k fused at record-build time), so the per-(face, sample)
     work is three fused multiply-adds, a min-coverage test, one divide, and
     the min-reduction. (A reciprocal-space max-reduce was tried and rejected:
     orthographic camera z here is centered near zero, and 1/z is not
     monotone across the sign change.) On the production bilinear sample
     grid the affine evaluations are additionally PARITY-FACTORED and the
     2x2-mean pool fuses into the kernel epilogue — see
     :func:`_raster_kernel_fast_paired`.
   - *Exact mode* (CUDA-parity): scanline-span coverage with the reference's
     ceil/trunc semantics, clamped+renormalized barycentric depth; per-face
     column bounds ceil(p0.x) / trunc(min(p2.x, W-1)) are precomputed into
     the records.

Fast record layout (FREC_F=9): barycentric row 0 [a0 b0 c0], row 1
[a1 b1 c1] (w2 = 1 - w0 - w1), and the fused reciprocal-depth row
[qa qb qc] = sum_k r_k * row_k with r_k = 1/z_k; all sanitized finite.

**Shipped fast-mode contract** (the production training-data semantic; see
also README "Production render modes"). Fast mode is a deliberate
statistical contract vs the CUDA-exact coverage rules:

- packed-sort quantization: canvas coords at 1/32 px over [-1024, 1024),
  depth at 1/64 mm over [-256, 768) (structural margins for the hand mesh,
  see the constants below);
- interior depths: identical up to quantization noise (median diff 0.0 at
  output precision);
- silhouette: boundary SAMPLES may flip (half-plane vs scanline-span
  rules); on-chip vs the oracle: foreground IoU > 0.999, p99 depth diff
  < 0.5 mm including 2x2-pool-mixed boundary pixels
  (tests/goldens/tpu_kernel_parity.npz);
- adversarial geometry (slivers, spill, mixed winding): median 0,
  boundary-flip pixels < 1% (tests/test_raster_adversarial.py::
  test_packed_sort_quantization_bound_adversarial pins the bound).

Exact mode remains available everywhere bit-parity matters and is what the
golden captures use.

Exact record layout (FREC_E=24):
  0 p0x  1 p1x  2 xhi=trunc(min(p2x,W-1))   3 p0y  4 p1y  5 xlo=ceil(p0x)
  6-8  s01 s12 s02 (edge slopes)   9-10 vert01 vert12 (vertical-edge flags)
  11-13 r0 r1 r2 (1/z)             14-22 barycentric inverse (row-major)
  23   pad
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FREC_F = 9   # fields per fast-mode face record
FREC_E = 24  # fields per exact-mode face record
CHUNK = 32   # faces per compute chunk (sublane dimension)
# Packed-sort fixed-point ranges (paired fast path): canvas coords at
# 1/32 px over [-1024, 1024) px, depth at 1/64 mm over [-256, 768) mm.
# Nondump hand-mesh vertices measured x/y in [-194, 829] px and z in
# [-152, 221] mm over 4,096 sampler poses at focal jitter 0.85-1.15 (faces
# are <~40 px, and a nondump bbox must touch the [0, 640) canvas, so the
# margins are structural, not luck). Values outside CLAMP, so only geometry
# that is already off-screen or absurd could distort.
_XYQ_OFF, _XYQ_SCALE = 1024.0, 32.0
_ZQ_OFF, _ZQ_SCALE = 256.0, 64.0
# 4-column variant (_diag_pack4): key(6) + 3x z(12) + 6x xy(14) = 126 bits
# in FOUR u32 sort columns total (one fewer than the 16-bit scheme's five;
# sort cost is ~linear in column count). Coarser steps — 1/8 px over
# [-512, 1536), 1/4 mm over [-256, 768) — still sit inside fast mode's
# statistical contract (CPU-validated vs the 16-bit scheme below).
_XYQ4_OFF, _XYQ4_SCALE = 512.0, 8.0
_ZQ4_OFF, _ZQ4_SCALE = 256.0, 4.0
CHUNK_PAIRED = 48  # parity-factored kernel: half the vector work per face
#   shifts the chunk-quantization-vs-iteration-overhead balance up (measured
#   9.75 ms vs 10.66 at 32, 9.82 at 64, full mesh B=1024)
TILE_S = 8   # tile edge in samples -> 64 samples/tile
QUAD_FAST = 16   # tiles per loop iteration = full tile row (1024 lanes)
QUAD_EXACT = 16  # full-row quads for exact too, but with...
CHUNK_EXACT = 16  # ...smaller chunks: the ~2x live intermediates spill at 64


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


def _face_columns(face_vertices=None, planes=None):
    """Per-vertex coordinate columns (x, y, z) — each a 3-list of (B, F).

    ``planes`` is the gather-free front end: (u, v, z) each (B, 3F) in
    face-vertex order straight out of the fused LBS+projection matmul
    (skinning.project_faces_planes). Deriving columns from either input is
    pure slicing — no (B, F, 3, 3) tensor is ever materialized on this
    path (its layout copies cost ~3 ms/call at B=1024 on the full mesh)."""
    if planes is not None:
        u, v, z = planes
        batch, three_f = u.shape
        nf = three_f // 3

        def cols(a):
            a3 = a.reshape(batch, nf, 3)
            return [a3[..., 0], a3[..., 1], a3[..., 2]]

        return cols(u), cols(v), cols(z)
    x = face_vertices[..., 0]
    y = face_vertices[..., 1]
    z = face_vertices[..., 2]
    return (
        [x[..., 0], x[..., 1], x[..., 2]],
        [y[..., 0], y[..., 1], y[..., 2]],
        [z[..., 0], z[..., 1], z[..., 2]],
    )


def _face_setup_cols(xc, yc, zc):
    """Select-based vertex sort + validity from coordinate columns.

    Identical math to :func:`face_setup_fast` (same CUDA tie rules,
    .cu:38-45, same front-face/degeneracy tests) but operating on (B, F)
    columns throughout. Returns (px, py, pz) — 3-lists of SORTED columns —
    and the valid mask."""
    x0, x1, x2 = xc
    y0, y1, y2 = yc
    z0, z1, z2 = zc
    front = (y2 - y0) * (x1 - x0) >= (y1 - y0) * (x2 - x0)

    c01 = x0 < x1
    pi0 = jnp.where(c01, jnp.where(x2 < x0, 2, 0), jnp.where(x2 < x1, 2, 1))
    pi2 = jnp.where(c01, jnp.where(x1 < x2, 2, 1), jnp.where(x0 < x2, 2, 0))
    pi1 = 3 - pi0 - pi2

    def pick(idx, c0, c1, c2):
        return jnp.where(idx == 0, c0, jnp.where(idx == 1, c1, c2))

    px = [pick(pi, x0, x1, x2) for pi in (pi0, pi1, pi2)]
    py = [pick(pi, y0, y1, y2) for pi in (pi0, pi1, pi2)]
    pz = [pick(pi, z0, z1, z2) for pi in (pi0, pi1, pi2)]

    den = px[2] * (py[0] - py[1]) + px[0] * (py[1] - py[2]) + px[1] * (
        py[2] - py[0]
    )
    nondegenerate = (px[0] != px[2]) & (den != 0.0)
    return px, py, pz, front & nondegenerate


def _barycentric_rows(px, py):
    """Inverse-matrix rows (each a 3-list [x-coef, y-coef, const]) and the
    safe determinant from per-vertex coordinate columns (each (B, K))."""
    px0, px1, px2 = px
    py0, py1, py2 = py
    den = px2 * (py0 - py1) + px0 * (py1 - py2) + px1 * (py2 - py0)
    safe_den = jnp.where(den == 0.0, 1.0, den)
    rows = [
        [py1 - py2, px2 - px1, px1 * py2 - px2 * py1],
        [py2 - py0, px0 - px2, px2 * py0 - px0 * py2],
        [py0 - py1, px1 - px0, px0 * py1 - px1 * py0],
    ]
    return [[c / safe_den for c in row] for row in rows]


def _fast_record_cols(px, py, pz) -> list[jnp.ndarray]:
    """Sorted coordinate columns -> the nine (B, K) fast-mode field columns.

    All nine values are sanitized to finite (a near-degenerate face whose
    inverse overflows would otherwise propagate NaN through the kernel's
    unguarded max-reduction); zeroed rows are inert: w0=w1=0, w2=1, q=0."""
    rows = _barycentric_rows(px, py)
    r = [jnp.where(z == 0.0, 0.0, 1.0 / jnp.where(z == 0.0, 1.0, z)) for z in pz]
    qrow = [
        r[0] * rows[0][c] + r[1] * rows[1][c] + r[2] * rows[2][c]
        for c in range(3)
    ]
    cols = rows[0] + rows[1] + qrow
    fin = lambda v: jnp.where(jnp.isfinite(v), v, 0.0)
    return [fin(c) for c in cols]


def _build_records_fast(px, py, pz) -> jnp.ndarray:
    """Sorted coordinate columns -> (B, K, FREC_F) fast-mode records."""
    return _stack_records(_fast_record_cols(px, py, pz))


def _build_records_fast_panels(px, py, pz, target: int) -> jnp.ndarray:
    """Sorted coordinate columns -> (B, P, 16, 128) COMPACT record panels.

    The (B, K, FREC) record layout lane-pads FREC 9 -> 128 in HBM
    ((8, 128) tiling), so both the XLA build transpose and the kernel's
    per-image record DMA move ~14x more bytes than the records hold
    (measured 1.5 ms/call of padding writes at B=1024 full mesh, plus
    ~1.1 GB/call of hidden kernel DMA). Panel layout keeps every hop
    compact: panel p holds field k of face p*128 + j at [b, p, k, j] —
    last two dims (16, 128) are exactly one padding-free tile column, and
    the transpose below is a sublane permutation (lane dim untouched), so
    XLA writes compact bytes. The kernel can't slice faces from lanes
    directly (Mosaic's lane->sublane reshape is unsupported; dynamic lane
    offsets must be 128-aligned) — instead it transposes each (16, 128)
    panel ONCE per image into a (P*128, 16) VMEM scratch and chunk-slices
    that with the usual 8-aligned sublane offsets.

    ``target`` (the padded face-row count) is rounded up to panels by the
    caller; pad rows are zero records, inert in both kernels.
    """
    cols = _fast_record_cols(px, py, pz)
    cols += [jnp.zeros_like(cols[0])] * (16 - len(cols))
    b, k = cols[0].shape
    arr = jnp.stack(cols, axis=0)  # (16, B, K) — fuses with the field math
    arr = jnp.pad(arr, ((0, 0), (0, 0), (0, target - k)))
    return arr.reshape(16, b, target // 128, 128).transpose(1, 2, 0, 3)


def _build_records_exact(px, py, pz, width: int) -> jnp.ndarray:
    """Sorted coordinate columns -> (B, K, FREC_E) exact-mode records."""
    px0, px1, px2 = px
    py0, py1, py2 = py

    def safe_slope(xa, ya, xb, yb):
        dx = xb - xa
        return jnp.where(dx == 0.0, 0.0, (yb - ya) / jnp.where(dx == 0.0, 1.0, dx))

    rows = _barycentric_rows(px, py)
    cols = [
        px0, px1,
        jnp.trunc(jnp.minimum(px2, width - 1.0)),  # xhi
        py0, py1,
        jnp.ceil(px0),                             # xlo
        safe_slope(px0, py0, px1, py1),
        safe_slope(px1, py1, px2, py2),
        safe_slope(px0, py0, px2, py2),
        (px1 == px0).astype(jnp.float32),
        (px2 == px1).astype(jnp.float32),
        1.0 / pz[0], 1.0 / pz[1], 1.0 / pz[2],
    ]
    cols.extend(rows[0] + rows[1] + rows[2])
    cols.append(jnp.zeros_like(px0))
    return _stack_records(cols)


def _stack_records(cols) -> jnp.ndarray:
    """Stack per-field (B, K) columns into (B, K, FREC) records.

    ``jnp.stack(cols, axis=-1)`` lowers to a minor-dim concatenate that XLA
    materializes as one strided copy PER FIELD (~0.8 ms each at B=512 — the
    24-field exact build cost ~40 ms/call). Stacking on axis 0 is contiguous
    and fuses with the producers; the single (FREC, B, K) -> (B, K, FREC)
    transpose then runs near memory bandwidth.
    """
    return jnp.stack(cols, axis=0).transpose(1, 2, 0)


def _paired_grid_searchsorted(v, side: str, n_out: int, scale: int):
    """Closed-form ``searchsorted`` for the bilinear sample grid.

    The grid is ``n_out`` pairs ``{s*d + s/2 - 1, s*d + s/2}`` (see
    raster.bilinear_sample_positions). Every query here is integer-valued
    (ceil/trunc of bbox corners), so the insertion index is two clipped
    integer floor-divisions per residue class — replacing four
    ``compare_all`` reductions that cost ~1.3 ms/call at B=512.
    """
    h = scale // 2
    vi = jnp.clip(v, -1e6, 1e6).astype(jnp.int32)
    if side == "left":  # count grid entries < v
        ca = (vi - h) // scale + 1       # s*d + h - 1 < v
        cb = (vi - h - 1) // scale + 1   # s*d + h < v
    else:  # count grid entries <= v
        ca = (vi - h + 1) // scale + 1
        cb = (vi - h) // scale + 1
    return jnp.clip(ca, 0, n_out) + jnp.clip(cb, 0, n_out)


def _bin_faces(px, py, valid, sample_x, sample_y, tiles_x, tiles_y, width,
               height, rows: bool = False,
               bilinear_grid: tuple[int, int] | None = None):
    """Single low-corner bin key per face (px/py: sorted coordinate columns,
    3-lists of (B, F) from :func:`_face_setup_cols`).

    rows=False: tile-granular keys (num_buckets = tiles_x * tiles_y); a face
    whose bbox spans more than 2x2 tiles goes to overflow.

    rows=True: TILE-ROW keys (num_buckets = tiles_y). Kernel quads that span
    a full tile row only ever consume row-pair windows, so tile-granular keys
    buy nothing there — row keys shrink the histogram 14x and, crucially, a
    face goes to overflow only when its bbox spans >2 tile ROWS; horizontal
    extent never overflows, so the per-quad overflow scan almost vanishes.

    Returns (keys (B, F), num_buckets); overflow = num_buckets, dump = +1.
    """
    num_buckets = 2 * tiles_y if rows else tiles_x * tiles_y
    overflow, dump = num_buckets, num_buckets + 1

    px0, px1, px2 = px
    py0, py1, py2 = py
    xmin, xmax = px0, px2
    ymin = jnp.minimum(jnp.minimum(py0, py1), py2)
    ymax = jnp.maximum(jnp.maximum(py0, py1), py2)

    # CUDA column-0 quirk (.cu:68-69): xi_max casts min(p2x, W-1) with C
    # trunc-toward-zero, so a face entirely left of the canvas with
    # p2x in (-1, 0) still paints column 0 — and its scanline y bounds there
    # are EXTRAPOLATIONS of edges 1-2 and 0-2 beyond p2x, which can land far
    # outside the face's vertex y-bbox. Binning by bbox alone would file the
    # face in row buckets that never cover those samples (found by the .cu
    # derivation audit; tests/test_raster_adversarial.py pins it). Extend the
    # bbox by the column-0 scanline bounds for exactly those faces.
    quirk = (xmax < 0.0) & (xmax > -1.0)
    dx12 = px2 - px1
    y12 = jnp.where(
        dx12 == 0.0,
        py1,
        (py2 - py1) / jnp.where(dx12 == 0.0, 1.0, dx12) * (0.0 - px1) + py1,
    )
    dx02 = px2 - px0  # > 0 for every non-dumped face (px0 != px2 sorted)
    y02 = (py2 - py0) / jnp.where(dx02 == 0.0, 1.0, dx02) * (0.0 - px0) + py0
    ymin = jnp.where(quirk, jnp.minimum(ymin, jnp.minimum(y12, y02)), ymin)
    ymax = jnp.where(quirk, jnp.maximum(ymax, jnp.maximum(y12, y02)), ymax)

    xmax_c = jnp.trunc(jnp.minimum(xmax, width - 1.0))
    ymax_c = jnp.trunc(jnp.minimum(ymax, height - 1.0))

    # compare_all: the default binary-search lowering is a while loop that
    # once dominated the whole render (4 x ~26 ms per 128-batch call).
    # bilinear_grid short-circuits even that with closed-form index math.
    if bilinear_grid is not None:
        n_out, scale = bilinear_grid

        def srt(grid, v, side):
            return _paired_grid_searchsorted(v, side, n_out, scale)
    else:
        def srt(grid, v, side):
            return jnp.searchsorted(grid, v, side=side, method="compare_all")

    i_lo = srt(sample_x, jnp.ceil(xmin), "left")
    i_hi = srt(sample_x, xmax_c, "right") - 1
    j_lo = srt(sample_y, jnp.ceil(ymin), "left")
    j_hi = srt(sample_y, ymax_c, "right") - 1
    empty = (i_hi < i_lo) | (j_hi < j_lo) | ~valid

    ty_lo = jnp.clip(j_lo // TILE_S, 0, tiles_y - 1)
    ty_hi = jnp.clip(j_hi // TILE_S, 0, tiles_y - 1)
    if rows:
        # Two sub-buckets per row: (r, only) then (r, spans-into-r+1). Row
        # r's one contiguous window [(r-1, span), (r, only), (r, span)] then
        # touches each face 1 + spans times instead of 2 — most faces span a
        # single tile row, so ~35% of the kernel's face-window tests vanish.
        big = (ty_hi - ty_lo) > 1
        spans = (ty_hi > ty_lo).astype(ty_lo.dtype)
        low_corner = 2 * ty_lo + spans
        keys = jnp.where(empty, dump, jnp.where(big, overflow, low_corner))
        return keys.astype(jnp.int32), num_buckets, (ty_lo, ty_hi)
    else:
        tx_lo = jnp.clip(i_lo // TILE_S, 0, tiles_x - 1)
        tx_hi = jnp.clip(i_hi // TILE_S, 0, tiles_x - 1)
        big = ((tx_hi - tx_lo) > 1) | ((ty_hi - ty_lo) > 1)
        low_corner = ty_lo * tiles_x + tx_lo
    keys = jnp.where(empty, dump, jnp.where(big, overflow, low_corner))
    return keys.astype(jnp.int32), num_buckets, (ty_lo, ty_hi)


def nondump_counts(face_vertices, sample_x, sample_y, tiles_x=16, tiles_y=16,
                   width=640, height=640) -> jnp.ndarray:
    """Per-image count of faces the kernel windows can address (all faces not
    in the dump bucket). Used to validate a ``valid_frac`` truncation margin."""
    xc, yc, zc = _face_columns(face_vertices)
    px, py, _, valid = _face_setup_cols(xc, yc, zc)
    keys, num_tiles, _ = _bin_faces(
        px, py, valid, sample_x, sample_y, tiles_x, tiles_y, width, height
    )
    return jnp.sum(keys != num_tiles + 1, axis=-1)


def _quad_ranges(starts_ref, row, q, tiles_x, num_buckets, quad, chunk,
                 bin_rows):
    """Chunk-loop ranges ``(aligned_start, n_chunks)`` for the tiles
    [q*quad, (q+1)*quad).

    Row-granular binning (bin_rows=True, quads span full tile rows): the
    SMEM operand is a PRECOMPUTED quad table (B, NQ*4) int32 of
    [aligned_main, n_main, aligned_overflow, n_overflow] per quad — the
    same-row and row-above windows collapse into one contiguous range
    [starts[r-1], starts[r+1]), and all the alignment/count scalar math runs
    vectorized in XLA instead of 2x per quad per program (see
    rasterize_depth_binned). Four SMEM reads, zero in-kernel arithmetic.

    Tile-granular binning (bin_rows=False): the SMEM operand is the raw
    bucket-offset array (B, NB+2) and the three windows — same-row buckets
    {t0-1..t0+quad-1}, the row above, and overflow — are aligned/counted
    here.

    row: either the program id (scalar-prefetched whole array) or
    program id % 8 (streamed (8, .) SMEM blocks need >= 8 sublanes)."""
    if bin_rows:
        c = q * 4
        return [
            (starts_ref[row, c], starts_ref[row, c + 1]),
            (starts_ref[row, c + 2], starts_ref[row, c + 3]),
        ]

    def pre(rs, re):
        aligned = (rs // 8) * 8  # sublane tiling is 8
        n = jnp.where(re > rs, (re - aligned + chunk - 1) // chunk, 0)
        return aligned, n

    t0 = q * quad
    rs_a = starts_ref[row, jnp.maximum(t0 - 1, 0)]
    re_a = starts_ref[row, t0 + quad]
    up = t0 - tiles_x
    rs_b = starts_ref[row, jnp.maximum(up - 1, 0)]
    re_b = starts_ref[row, jnp.maximum(up + quad, 0)]
    over = (starts_ref[row, num_buckets], starts_ref[row, num_buckets + 1])
    return [pre(rs_a, re_a), pre(rs_b, re_b), pre(*over)]


def _fold8(depth: jnp.ndarray, chunk: int) -> jnp.ndarray:
    """(chunk, lanes) -> (8, lanes) min over whole sublane groups.

    Exact: min is associative and commutative (and never sees NaN here —
    records are sanitized), so folding to 8 partial rows per chunk and
    deferring the expensive cross-sublane shuffle reduce to once per quad
    computes the identical z-buffer."""
    if chunk == 8:
        return depth
    return jnp.min(depth.reshape(chunk // 8, 8, depth.shape[-1]), axis=0)


def _raster_kernel_fast(
    starts_ref,  # (8, NTpad) int32 bucket offsets, 8 images/block (SMEM)
    xcoord_ref,  # (NT/quad, quad*64) per-quad sample x (full array in VMEM)
    ycoord_ref,  # (NT/quad, quad*64)
    fdata_ref,   # (1, E, FREC_F) sorted fast records (block, auto-pipelined)
    out_ref,     # (1, NT/quad, quad*64)
    *,
    num_tiles: int,
    num_buckets: int,
    tiles_x: int,
    quad: int,
    chunk: int,
    smem_blocks: bool,
    bin_rows: bool,
    stub: bool = False,
):
    lanes = quad * TILE_S * TILE_S
    if smem_blocks:
        row = pl.program_id(0) % 8
    else:
        row = pl.program_id(0)

    # With row quads the x pattern repeats every row: read the (1, lanes)
    # table ONCE outside the quad loop.
    x_row = xcoord_ref[0, :][None, :] if bin_rows else None

    def quad_body(q, _):
        x = x_row if bin_rows else xcoord_ref[q, :][None, :]  # (1, lanes)
        y = ycoord_ref[q, :][None, :]

        # (An MXU formulation — one block-diagonal dot evaluating w0/w1/q for
        # all samples — measured 3x SLOWER: f32 fidelity needs 6-pass
        # Precision.HIGHEST, and the affine constants reach ~1e4 with
        # catastrophic cancellation, so lower precision is unusable. VPU fma
        # it is.)
        def process_range(rng, zbuf):
            aligned_rs, n_chunks = rng

            def chunk_fast(i, zbuf):
                off = pl.multiple_of(aligned_rs + i * chunk, 8)
                f = fdata_ref[0, pl.ds(off, chunk), :]  # (chunk, FREC_F)
                # (A software-pipelined variant carrying chunk i+1's load
                # through the loop measured WORSE — 13.1 vs 12.5 ms at
                # B=1024 — the extra live block outweighs any load-latency
                # hiding, so loads stay in-iteration.)

                def col(k):
                    return f[:, k][:, None]  # (CHUNK, 1), broadcasts over lanes

                if stub == "min":
                    # diagnostic: identical loops/reads, compute removed
                    return jnp.minimum(zbuf, _fold8(col(0) + x, chunk))
                elif stub == "cols":
                    # diagnostic: all 9 field loads/broadcasts + the 6 fma,
                    # but none of the tail ops (w2, cover, reciprocal, select)
                    s = (
                        col(0) * x + col(1) * y + col(2)
                        + col(3) * x + col(4) * y + col(5)
                        + col(6) * x + col(7) * y + col(8)
                    )
                    return jnp.minimum(zbuf, _fold8(s, chunk))

                w0 = col(0) * x + col(1) * y + col(2)
                w1 = col(3) * x + col(4) * y + col(5)
                qd = col(6) * x + col(7) * y + col(8)  # 1/depth
                w2 = 1.0 - w0 - w1
                cover = jnp.minimum(jnp.minimum(w0, w1), w2) >= 0.0
                # Records are sanitized finite, so qd is never NaN; zeroed
                # dump/pad rows give qd = +0 -> depth = +inf, inert in min.
                # Approximate reciprocal: ~2^-12 relative = ~0.02 mm at hand
                # depths — far below the sensor noise the synthesizer adds.
                depth = jnp.where(cover, pl.reciprocal(qd, approx=True), 1000.0)
                # Deferred reduction: fold only to 8 sublanes here (cheap
                # block mins); the cross-sublane shuffle reduce runs ONCE per
                # quad on the accumulated (8, lanes) zbuf, not per chunk.
                return jnp.minimum(zbuf, _fold8(depth, chunk))

            return jax.lax.fori_loop(0, n_chunks, chunk_fast, zbuf)

        wins = _quad_ranges(
            starts_ref, row, q, tiles_x, num_buckets, quad, chunk, bin_rows
        )

        if bin_rows:
            # Empty ranges have n_chunks == 0: the fori_loops fall through,
            # and the single unconditional write stores the 1000 background.
            zbuf = jnp.full((8, lanes), 1000.0, jnp.float32)
            for w in wins:
                zbuf = process_range(w, zbuf)
            out_ref[0, q, :] = jnp.min(zbuf, axis=0)
            return 0

        out_ref[0, q, :] = jnp.full((lanes,), 1000.0, jnp.float32)
        work = functools.reduce(
            lambda a, w: a | (w[1] > 0), wins, jnp.bool_(False)
        )

        @pl.when(work)
        def _():
            zbuf = jnp.full((8, lanes), 1000.0, jnp.float32)
            for w in wins:
                zbuf = process_range(w, zbuf)
            out_ref[0, q, :] = jnp.min(zbuf, axis=0)

        return 0

    jax.lax.fori_loop(0, num_tiles // quad, quad_body, 0)


def _raster_kernel_fast_paired(
    starts_ref,  # (8, NTpad) int32 quad table, 8 images/block (SMEM)
    xcoord_ref,  # (1, lanes4) even-column sample x (lane = rp*PAIRS_X + cp)
    ycoord_ref,  # (NQ, lanes4) even-row sample y per quad
    fdata_ref,   # (1, E, FREC_F) sorted fast records (block, auto-pipelined)
                 # rec_flat: (1, P, 16, 128) compact field-major panels
    out_ref,     # pooled: (1, NQ, lanes4); raw: (1, NQ, 4, lanes4)
    *scratch,    # rec_flat: one (P*128, 16) VMEM record scratch
    num_quads: int,
    quad: int,
    chunk: int,
    smem_blocks: bool,
    pool_clamp: float | None,
    split_main: int = 1,
    rec_flat: bool = False,
):
    """Parity-factored fast kernel (bin_rows row-quad layout only).

    The bilinear sample grid comes in +1 PAIRS on both axes
    (raster.bilinear_sample_positions: {10c+4, 10c+5} x {10r+4, 10r+5}), and
    every per-face quantity here is an affine form w = a*x + b*y + c, so
    w(x+1, y) = w + a and w(x, y+1) = w + b. The kernel therefore evaluates
    each affine ONCE on the (row-pair, col-pair) base grid — lanes//4 lanes,
    lane = rp * 64 + cp — and derives the other three parity variants with
    one broadcast add each: the 9 fma of the affine evaluations become 9 fma
    at quarter width plus 9 quarter-width adds (~half the FMA work). The
    coverage/depth tail still runs per parity (full sample count — those ops
    are irreducible), and the z-buffer is four quarter-width accumulators.

    Since the production postprocess is exactly the mean over the 4 parity
    samples of each output pixel (the reference's 640->64 bilinear resize,
    mesh/render.py:310-311), pool_clamp fuses to a per-quad epilogue:
    out[rp, cp] = mean_p(min(z_p, clamp)) — the kernel emits the pooled
    64x64 canvas directly and the XLA pool pass (plus 3/4 of the output
    write traffic) disappears. pool_clamp=None emits the 4 parity planes
    (1, NQ, 4, lanes4) for the caller to interleave (test/raw path).
    """
    lanes4 = quad * TILE_S * TILE_S // 4
    if smem_blocks:
        row = pl.program_id(0) % 8
    else:
        row = pl.program_id(0)

    x_row = xcoord_ref[0, :][None, :]  # (1, lanes4), same for every quad

    if rec_flat:
        # Relayout the compact record panels (field-major, faces on lanes)
        # into face-major scratch rows ONCE per image; every chunk then
        # slices (chunk, 16) rows at the usual 8-aligned offsets. The
        # (16, 128) vector transpose is Mosaic-native; P ~ E/128 of them
        # amortize over ~80 chunk iterations.
        (rec_scratch,) = scratch
        for p in range(fdata_ref.shape[1]):
            rec_scratch[pl.ds(p * 128, 128), :] = fdata_ref[0, p, :, :].T

    def quad_body(q, _):
        y = ycoord_ref[q, :][None, :]  # (1, lanes4) even-row y

        def process_range(rng, zbufs):
            aligned_rs, n_chunks = rng

            def chunk_fast(i, zbufs):
                off = pl.multiple_of(aligned_rs + i * chunk, 8)
                if rec_flat:
                    f = rec_scratch[pl.ds(off, chunk), :]  # (chunk, 16)
                else:
                    f = fdata_ref[0, pl.ds(off, chunk), :]  # (chunk, FREC_F)

                def col(k):
                    return f[:, k][:, None]  # (chunk, 1)

                a0, b0 = col(0), col(1)
                a1, b1 = col(3), col(4)
                aq, bq = col(6), col(7)
                w0b = a0 * x_row + b0 * y + col(2)
                w1b = a1 * x_row + b1 * y + col(5)
                qdb = aq * x_row + bq * y + col(8)

                out = []
                for p, zb in enumerate(zbufs):
                    py, px = p // 2, p % 2
                    w0 = w0b + a0 if px else w0b
                    w1 = w1b + a1 if px else w1b
                    qd = qdb + aq if px else qdb
                    if py:
                        w0, w1, qd = w0 + b0, w1 + b1, qd + bq
                    w2 = 1.0 - w0 - w1
                    cover = jnp.minimum(jnp.minimum(w0, w1), w2) >= 0.0
                    depth = jnp.where(
                        cover, pl.reciprocal(qd, approx=True), 1000.0
                    )
                    out.append(jnp.minimum(zb, _fold8(depth, chunk)))
                return tuple(out)

            return jax.lax.fori_loop(0, n_chunks, chunk_fast, zbufs)

        wins = _quad_ranges(starts_ref, row, q, 0, 0, quad, chunk, True)
        if split_main > 1:
            # Diagnostic: split the main window into N chunk-loop ranges
            # (same chunk total, N-1 extra fori setups) to price the kernel
            # cost of a segmented (split-sorted) record buffer.
            a, n = wins[0]
            n0 = (n + split_main - 1) // split_main
            wins = [
                (a + i * n0 * chunk, jnp.clip(n - i * n0, 0, n0))
                for i in range(split_main)
            ] + wins[1:]

        zbufs = tuple(jnp.full((8, lanes4), 1000.0, jnp.float32) for _ in range(4))
        for w in wins:
            zbufs = process_range(w, zbufs)
        planes = [jnp.min(z, axis=0) for z in zbufs]  # 4 x (lanes4,)
        if pool_clamp is not None:
            t = [jnp.minimum(p, pool_clamp) for p in planes]
            out_ref[0, q, :] = ((t[0] + t[1]) + (t[2] + t[3])) * 0.25
        else:
            for p in range(4):
                out_ref[0, q, p, :] = planes[p]
        return 0

    jax.lax.fori_loop(0, num_quads, quad_body, 0)


def _raster_kernel_exact(
    starts_ref,
    xcoord_ref,
    ycoord_ref,
    fdata_ref,   # (1, E, FREC_E)
    out_ref,
    *,
    num_tiles: int,
    num_buckets: int,
    tiles_x: int,
    height: int,
    quad: int,
    chunk: int,
    smem_blocks: bool,
    bin_rows: bool,
    stub: bool | str = False,
):
    lanes = quad * TILE_S * TILE_S
    if smem_blocks:
        row = pl.program_id(0) % 8
    else:
        row = pl.program_id(0)

    x_row = xcoord_ref[0, :][None, :] if bin_rows else None

    def quad_body(q, _):
        x = x_row if bin_rows else xcoord_ref[q, :][None, :]
        y = ycoord_ref[q, :][None, :]

        def process_range(rng, zbuf):
            aligned_rs, n_chunks = rng

            def chunk_exact(i, zbuf):
                """CUDA scanline-span semantics (the parity mode)."""
                off = pl.multiple_of(aligned_rs + i * chunk, 8)
                f = fdata_ref[0, pl.ds(off, chunk), :]  # (chunk, FREC_E)

                def col(k):
                    return f[:, k][:, None]

                if stub == "min":
                    # diagnostic: identical loops/reads, compute removed
                    return jnp.minimum(zbuf, _fold8(col(0) + x, chunk))
                elif stub == "cols":
                    # diagnostic: all 23 field loads/broadcasts + the six
                    # affine evaluations (3 scanline edges + 3 barycentric
                    # planes), but none of the span tail (selects,
                    # ceil/trunc, clips, compares, divide, isnan)
                    s = (
                        col(6) * (x - col(0)) + col(3)
                        + col(7) * (x - col(1)) + col(4)
                        + col(8) * (x - col(0)) + col(3)
                        + (col(14) * x + col(15) * y + col(16))
                        + (col(17) * x + col(18) * y + col(19))
                        + (col(20) * x + col(21) * y + col(22))
                        + col(2) + col(5) + col(9) + col(10)
                        + col(11) + col(12) + col(13)
                    )
                    return jnp.minimum(zbuf, _fold8(s, chunk))

                p0x, p1x = col(0), col(1)
                vert01, vert12 = col(9) > 0.5, col(10) > 0.5
                r0, r1, r2 = col(11), col(12), col(13)

                e01 = col(6) * (x - p0x) + col(3)
                e12 = col(7) * (x - p1x) + col(4)
                yi1 = jnp.where(
                    x <= p1x,
                    jnp.where(vert01, col(4), e01),
                    jnp.where(vert12, col(4), e12),
                )
                yi2 = col(8) * (x - p0x) + col(3)
                y_lo = jnp.ceil(jnp.minimum(yi1, yi2))
                y_hi = jnp.trunc(jnp.minimum(jnp.maximum(yi1, yi2), height - 1.0))
                x_ok = (x >= col(5)) & (x <= col(2))  # precomputed bounds

                w0 = jnp.clip(col(14) * x + col(15) * y + col(16), 0.0, 1.0)
                w1 = jnp.clip(col(17) * x + col(18) * y + col(19), 0.0, 1.0)
                w2 = jnp.clip(col(20) * x + col(21) * y + col(22), 0.0, 1.0)
                w_sum = w0 + w1 + w2
                depth = w_sum / (w0 * r0 + w1 * r1 + w2 * r2)

                cover = (
                    x_ok
                    & (y >= y_lo)
                    & (y <= y_hi)
                    & (w_sum > 0.0)
                    & ~jnp.isnan(depth)
                )
                depth = jnp.where(cover, depth, 1000.0)  # (CHUNK, lanes)
                return jnp.minimum(zbuf, _fold8(depth, chunk))

            return jax.lax.fori_loop(0, n_chunks, chunk_exact, zbuf)

        wins = _quad_ranges(
            starts_ref, row, q, tiles_x, num_buckets, quad, chunk, bin_rows
        )

        if bin_rows:
            zbuf = jnp.full((8, lanes), 1000.0, jnp.float32)
            for w in wins:
                zbuf = process_range(w, zbuf)
            out_ref[0, q, :] = jnp.min(zbuf, axis=0)
            return 0

        out_ref[0, q, :] = jnp.full((lanes,), 1000.0, jnp.float32)
        work = functools.reduce(
            lambda a, w: a | (w[1] > 0), wins, jnp.bool_(False)
        )

        @pl.when(work)
        def _():
            zbuf = jnp.full((8, lanes), 1000.0, jnp.float32)
            for w in wins:
                zbuf = process_range(w, zbuf)
            out_ref[0, q, :] = jnp.min(zbuf, axis=0)

        return 0

    jax.lax.fori_loop(0, num_tiles // quad, quad_body, 0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "tiles_x", "tiles_y", "interpret", "exact",
        "valid_frac", "pool_clamp", "smem_block_starts", "bilinear_grid",
        "chunk_override", "_diag_stub", "_diag_split_main", "_diag_pack4",
        "_diag_rec_flat",
    ),
)
def rasterize_depth_binned(
    face_vertices: jnp.ndarray | None,
    sample_x: jnp.ndarray,
    sample_y: jnp.ndarray,
    width: int = 640,
    height: int = 640,
    tiles_x: int = 16,
    tiles_y: int = 16,
    interpret: bool = False,
    exact: bool = True,
    valid_frac: float = 1.0,
    pool_clamp: float | None = None,
    smem_block_starts: bool | None = None,
    bilinear_grid: tuple[int, int] | None = None,
    chunk_override: int | None = None,
    _diag_stub: bool = False,
    _diag_split_main: int = 1,
    _diag_pack4: bool = False,
    _diag_rec_flat: bool = False,
    planes: tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray] | None = None,
) -> jnp.ndarray:
    """Tile-binned Pallas rasterization at integer sample positions.

    Same contract as :func:`spherehand_tpu.render.raster.rasterize_depth`;
    requires len(sample_x) == tiles_x * TILE_S and likewise for y.

    valid_frac: truncate the sorted face buffer to this fraction of the mesh
    (rounded up to the compute chunk). Callers must guarantee the per-image
    nondump face count (see :func:`nondump_counts`) never exceeds the bound;
    faces beyond it would silently vanish. 1.0 = no truncation.

    bilinear_grid: when (out_size, scale) is given, sample_x/sample_y are
    promised to be ``bilinear_sample_positions(out_size, scale)`` and binning
    uses closed-form integer index math instead of searchsorted reductions.

    pool_clamp: when set, clamp depths to this value and 2x2-mean-pool,
    returning (B, Sy/2, Sx/2) — the fused production postprocess (the
    reference clamps to 100 mm then bilinear-downsamples, mesh/render.py:
    286,310-311). None returns the raw (B, Sy, Sx) buffer, background 1000.

    planes: alternative gather-free geometry input — (u, v, z), each
    (B, 3F) in face-vertex order (skinning.project_faces_planes). Pass
    face_vertices=None with it; the pre-pass then runs column-wise without
    ever materializing a (B, F, 3, 3) tensor (~3 ms/call of layout copies
    at B=1024 on the full mesh).
    """
    if planes is not None:
        assert face_vertices is None
        batch, num_faces = planes[0].shape[0], planes[0].shape[1] // 3
    else:
        batch, num_faces = face_vertices.shape[:2]
    assert sample_x.shape[0] == tiles_x * TILE_S
    assert sample_y.shape[0] == tiles_y * TILE_S
    num_tiles = tiles_x * tiles_y
    if _diag_stub is True:  # back-compat: bool selects the minimal stub
        _diag_stub = "min"

    # Full-tile-row quads only ever consume row-pair face windows, so bin at
    # tile-ROW granularity when the quad spans a full row (smaller histogram,
    # ONE contiguous window, near-empty overflow — _bin_faces docstring).
    quad = QUAD_EXACT if exact else QUAD_FAST
    # chunk_override is a real static argument (part of the jit cache key) so
    # chunk probes recompile instead of silently reusing the stale trace —
    # patching the module constants from outside has no effect on a jitted fn.
    bin_rows = quad == tiles_x
    paired = (
        (not exact) and bin_rows and bilinear_grid is not None
        and not _diag_stub
    )
    chunk = chunk_override or (
        CHUNK_EXACT if exact else (CHUNK_PAIRED if paired else CHUNK)
    )
    assert chunk % 8 == 0, "chunk must be a multiple of the sublane tile (8)"
    assert tiles_x % quad == 0

    xc, yc, zc = _face_columns(face_vertices, planes)
    spx, spy, spz, valid = _face_setup_cols(xc, yc, zc)
    keys, num_buckets, (ty_lo, ty_hi) = _bin_faces(
        spx, spy, valid, sample_x, sample_y, tiles_x, tiles_y, width, height,
        rows=bin_rows, bilinear_grid=bilinear_grid,
    )
    dump = num_buckets + 1

    # Per-bucket range starts: histogram prefix sums of the small-domain keys
    # (searchsorted's while-loop lowering is slow on TPU). The compare-all
    # reduction re-reads the key array once per bucket (34x at row
    # granularity), so hand it u8 keys materialized behind an optimization
    # barrier — without the barrier XLA fuses the convert into the loop and
    # reads the s32 originals 34x (measured 0.48 -> ~0.15 ms at B=1024).
    small_t = jnp.uint8 if num_buckets + 2 <= 255 else jnp.uint16
    keys_small = jax.lax.optimization_barrier(keys.astype(small_t))
    counts = jnp.sum(
        keys_small[:, :, None] == jnp.arange(num_buckets + 2, dtype=small_t),
        axis=1,
        dtype=jnp.int32,
    )
    starts = jnp.concatenate(
        [
            jnp.zeros((batch, 1), jnp.int32),
            jnp.cumsum(counts[:, :-1], axis=-1, dtype=jnp.int32),
        ],
        axis=-1,
    )  # (B, NB+2)

    if bin_rows:
        # Precompute each quad's chunk-loop ranges (aligned start + count)
        # here, vectorized, instead of twice per quad per kernel program —
        # the kernel then does four SMEM reads and no scalar arithmetic
        # (see _quad_ranges). Quad q == tile row r; its one contiguous face
        # window is [starts[(r-1, span)], starts[(r+1, only)]) over the
        # (only, span) sub-bucket layout (_bin_faces), plus overflow.
        def pre(lo, hi):
            aligned = (lo // 8) * 8  # sublane tiling is 8
            n = jnp.where(hi > lo, (hi - aligned + chunk - 1) // chunk, 0)
            return aligned, n

        a_m, n_m = pre(
            jnp.concatenate(
                [starts[:, :1], starts[:, 1 : 2 * tiles_y - 2 : 2]], axis=1
            ),
            starts[:, 2 : 2 * tiles_y + 1 : 2],
        )
        a_o, n_o = pre(
            starts[:, num_buckets, None], starts[:, num_buckets + 1, None]
        )
        # Overflow holds ~0.5% of faces, but each quad scans it: gate its
        # chunk count to the rows the overflow faces actually span (their
        # union bounds) — measured ~15% of all chunk iterations reclaimed.
        ovf = keys == num_buckets
        ov_lo = jnp.min(jnp.where(ovf, ty_lo, tiles_y), axis=1)  # (B,)
        ov_hi = jnp.max(jnp.where(ovf, ty_hi, -1), axis=1)
        r = jnp.arange(tiles_y, dtype=ty_lo.dtype)[None, :]
        ov_rows = (r >= ov_lo[:, None]) & (r <= ov_hi[:, None])
        starts = jnp.stack(
            [
                a_m,
                n_m,
                jnp.broadcast_to(a_o, a_m.shape),
                jnp.where(ov_rows, n_o, 0),
            ],
            axis=-1,
        ).reshape(batch, tiles_y * 4)

    # The 9 vertex-coordinate columns ride the sort as payload operands (a
    # post-sort row gather was ~10 ns/row, the single largest pre-pass cost).
    # Dump-bucket rows are zeroed BEFORE the sort: they are never legitimately
    # addressed, but chunk-aligned overreads may touch them, and a zero record
    # is inert in both kernels (module docstring, point 4).
    #
    # Measured sort cost is ~linear in payload count (0.83 ms for key+1 to
    # 5.86 ms for key+9 at B=1024 — the round-2 "payload count irrelevant"
    # note was a broken wall-clock measurement; device traces disagree). The
    # PAIRED production path therefore quantizes the coordinates to 16-bit
    # fixed point and packs them into FIVE u32 payloads: (x|y) per sorted
    # vertex plus (z0|z1) and (z2|-). Quantization steps (1/32 px, 1/64 mm)
    # sit far below fast mode's statistical contract (silhouette shifts
    # ~0.06 px; exact mode keeps the bit-exact 9-column f32 sort). A packed
    # dump row decodes to three identical vertices -> zero record, inert.
    # The sorted key column is never read back (bucket starts come from the
    # pre-pass histogram), so the paired schemes pack the bucket key into the
    # TOP bits of sort column 0 — the lexicographic u32 order is then bucket
    # order, the within-bucket order is a harmless z tiebreak, and the sort
    # moves one whole column less.
    dumpw = keys == dump
    keys_u = keys.astype(jnp.uint32)
    if paired and _diag_pack4:
        # FOUR total sort columns: an MSB-first 126-bit stream
        #   key(6) z0(12) z1(12) z2(12) x0(14) y0(14) x1(14) y1(14)
        #   x2(14) y2(14)
        # (6 + 36 + 84 = 126). Key in the top 6 bits of word 0.
        assert dump < 64, dump
        def q(v, off, scale, top):
            return jnp.clip(
                jnp.round((v + off) * scale), 0.0, float(top)
            ).astype(jnp.uint32)

        z_zero4 = int(round(_ZQ4_OFF * _ZQ4_SCALE))
        fields = (
            [(q(z, _ZQ4_OFF, _ZQ4_SCALE, 4095), 12, z_zero4) for z in spz]
            + [
                fx
                for k in range(3)
                for fx in (
                    (q(spx[k], _XYQ4_OFF, _XYQ4_SCALE, 16383), 14, 0),
                    (q(spy[k], _XYQ4_OFF, _XYQ4_SCALE, 16383), 14, 0),
                )
            ]
        )
        words = [jnp.zeros_like(keys_u) for _ in range(4)]
        dump_words = [0, 0, 0, 0]
        s = 6  # stream offset; bits [0, 6) are the key
        for f, wd, df in fields:
            a, r = s // 32, s % 32
            if r + wd <= 32:
                sh = 32 - r - wd
                words[a] = words[a] | (f << sh)
                dump_words[a] |= (df << sh) & 0xFFFFFFFF
            else:
                wd2 = r + wd - 32  # low bits spilling into word a+1
                words[a] = words[a] | (f >> wd2)
                dump_words[a] |= df >> wd2
                lo_sh = 32 - wd2
                words[a + 1] = words[a + 1] | (f << lo_sh)
                dump_words[a + 1] |= (df << lo_sh) & 0xFFFFFFFF
            s += wd
        assert s == 126, s
        sort_cols = [
            jnp.where(dumpw, jnp.uint32(dw), w)
            for w, dw in zip(words, dump_words)
        ]
        sort_cols[0] = sort_cols[0] | (keys_u << 26)
    elif paired:
        def q16(v, off, scale):
            return jnp.clip(
                jnp.round((v + off) * scale), 0.0, 65535.0
            ).astype(jnp.uint32)

        def pk(a, b, dump_val=0):
            return jnp.where(dumpw, jnp.uint32(dump_val), (a << 16) | b)

        # Dump rows must decode to z == 0 exactly (the record builder's
        # 1/z sanitization then yields r = +0, so qrow = +0 and the kernel
        # sees +inf depth, inert in min; a nonzero z would give r < 0 and
        # qrow = -0.0 -> reciprocal = -inf, which POISONS the min).
        z_zero = int(round(_ZQ_OFF * _ZQ_SCALE))
        z_dump = (z_zero << 16) | z_zero
        zq = [q16(z, _ZQ_OFF, _ZQ_SCALE) for z in spz]
        # FIVE total sort columns: key|z2 then (x|y) per vertex and z0|z1.
        sort_cols = [
            (keys_u << 16) | jnp.where(dumpw, jnp.uint32(z_zero), zq[2])
        ] + [
            pk(
                q16(spx[k], _XYQ_OFF, _XYQ_SCALE),
                q16(spy[k], _XYQ_OFF, _XYQ_SCALE),
            )
            for k in range(3)
        ] + [
            pk(zq[0], zq[1], z_dump),
        ]
    else:
        coord_cols = [
            jnp.where(dumpw, 0.0, col)
            for cols in (spx, spy, spz)
            for col in cols
        ]  # px0 px1 px2 py0 py1 py2 pz0 pz1 pz2
        sort_cols = [keys] + coord_cols
    sorted_ops = jax.lax.sort(
        sort_cols, dimension=-1, num_keys=1, is_stable=False
    )

    if valid_frac < 1.0:
        keep = min(num_faces, -(-int(num_faces * valid_frac) // chunk) * chunk)
    else:
        keep = num_faces
    # Chunk overreads may run up to chunk-1 rows past the last window end
    # (plus the down-alignment), so the buffer needs one extra chunk of inert
    # rows. When the mesh has that many faces to spare, slice them instead of
    # padding: rows past the nondump count are dump rows, already zeroed.
    target = keep + (-keep) % chunk + chunk
    if paired and _diag_rec_flat:
        target = -(-target // 128) * 128  # whole (16, 128) record panels
    take = min(target, num_faces)
    sc = [op[:, :take] for op in sorted_ops]
    if paired and _diag_pack4:
        def unq4(s, wd, off, scale):
            a, r = s // 32, s % 32
            if r + wd <= 32:
                v = (sc[a] >> (32 - r - wd)) & jnp.uint32((1 << wd) - 1)
            else:
                wd2 = r + wd - 32
                hi = sc[a] & jnp.uint32((1 << (32 - r)) - 1)
                v = (hi << wd2) | (sc[a + 1] >> (32 - wd2))
            return v.astype(jnp.float32) * (1.0 / scale) - off

        zs = [unq4(6 + 12 * j, 12, _ZQ4_OFF, _ZQ4_SCALE) for j in range(3)]
        xy = [unq4(42 + 14 * j, 14, _XYQ4_OFF, _XYQ4_SCALE) for j in range(6)]
        px, py, pz = xy[0::2], xy[1::2], zs
    elif paired:
        def unq(q, off, scale):
            return q.astype(jnp.float32) * (1.0 / scale) - off

        lo = jnp.uint32(0xFFFF)
        px = [unq(sc[1 + k] >> 16, _XYQ_OFF, _XYQ_SCALE) for k in range(3)]
        py = [unq(sc[1 + k] & lo, _XYQ_OFF, _XYQ_SCALE) for k in range(3)]
        pz = [
            unq(sc[4] >> 16, _ZQ_OFF, _ZQ_SCALE),
            unq(sc[4] & lo, _ZQ_OFF, _ZQ_SCALE),
            unq(sc[0] & lo, _ZQ_OFF, _ZQ_SCALE),
        ]
    else:
        px, py, pz = sc[1:4], sc[4:7], sc[7:10]
    if exact:
        fdata = _build_records_exact(px, py, pz, width)
    elif paired and _diag_rec_flat:
        fdata = _build_records_fast_panels(px, py, pz, target)
    else:
        fdata = _build_records_fast(px, py, pz)
    if not (paired and _diag_rec_flat) and target > num_faces:
        fdata = jnp.pad(fdata, ((0, 0), (0, target - num_faces), (0, 0)))

    # Per-quad sample coordinate tables (NT/quad, quad*64). The kernel's
    # coverage/depth math is lane-order-agnostic (driven entirely by these
    # tables), so full-row quads order lanes CANVAS ROW-MAJOR (sy, tx, sx):
    # the kernel output is then the canvas itself — the former tile->canvas
    # transpose (~1 ms/call at B=512) becomes a free reshape. Tile-granular
    # quads keep the tile-major order (tx, sy, sx).
    samples_per_tile = TILE_S * TILE_S
    num_quads = num_tiles // quad
    lanes = quad * samples_per_tile
    # The parity-factored fast kernel requires the +1-paired bilinear grid
    # (see _raster_kernel_fast_paired); bilinear_grid is the caller's promise.
    if paired:
        lanes4 = lanes // 4
        pairs_x = tiles_x * TILE_S // 2
        xe = sample_x[::2]  # even columns; odd = even + 1
        ye = sample_y[::2]
        xcoords = jnp.broadcast_to(
            xe.reshape(1, 1, pairs_x), (1, 4, pairs_x)
        ).reshape(1, lanes4)
        ycoords = jnp.broadcast_to(
            ye.reshape(tiles_y, 4, 1), (tiles_y, 4, pairs_x)
        ).reshape(num_quads, lanes4)
    elif bin_rows:
        # The x pattern repeats every row: ship ONE (1, lanes) row, read once.
        width_s = tiles_x * TILE_S
        xcoords = jnp.broadcast_to(
            sample_x.reshape(1, 1, width_s), (1, TILE_S, width_s)
        ).reshape(1, lanes)
        ycoords = jnp.broadcast_to(
            sample_y.reshape(tiles_y, TILE_S, 1), (tiles_y, TILE_S, width_s)
        ).reshape(num_quads, lanes)
    else:
        shape4 = (tiles_y, tiles_x, TILE_S, TILE_S)
        xcoords = jnp.broadcast_to(
            sample_x.reshape(1, tiles_x, 1, TILE_S), shape4
        ).reshape(num_quads, lanes)
        ycoords = jnp.broadcast_to(
            sample_y.reshape(tiles_y, 1, TILE_S, 1), shape4
        ).reshape(num_quads, lanes)

    # Bucket offsets / quad table: scalar-prefetch the whole (B, .) array
    # while it fits the 1 MB SMEM budget (slightly faster); above that (huge
    # batches, or fine tile-granular bins) stream 8-image SMEM blocks instead.
    # (threshold leaves headroom: the prefetched array appears to be
    # double-buffered against the 1 MB SMEM budget — 512 KB exactly OOMs)
    smem_blocks = batch * starts.shape[1] * 4 > 300 * 1024
    if smem_block_starts is not None:  # test override
        smem_blocks = smem_block_starts
    if smem_blocks:
        starts_in = jnp.pad(
            starts,
            ((0, (-batch) % 8), (0, (-starts.shape[1]) % 128)),
        )
        starts_spec = pl.BlockSpec(
            (8, starts_in.shape[1]),
            lambda b, *_: (b // 8, 0),
            memory_space=pltpu.SMEM,
        )
        num_prefetch = 0
    else:
        starts_in = starts
        starts_spec = None
        num_prefetch = 1
    if paired and pool_clamp is not None:
        out_block = (1, num_quads, lanes // 4)
    elif paired:
        out_block = (1, num_quads, 4, lanes // 4)
    else:
        out_block = (1, num_quads, lanes)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=num_prefetch,
        grid=(batch,),
        in_specs=([starts_spec] if starts_spec is not None else []) + [
            pl.BlockSpec(
                xcoords.shape,
                lambda b, *_: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                ycoords.shape,
                lambda b, *_: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1,) + fdata.shape[1:],
                (lambda b, *_: (b, 0, 0, 0))
                if fdata.ndim == 4
                else (lambda b, *_: (b, 0, 0)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            out_block,
            (lambda b, *_: (b, 0, 0, 0))
            if len(out_block) == 4
            else (lambda b, *_: (b, 0, 0)),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=(
            [pltpu.VMEM((target, 16), jnp.float32)]
            if paired and _diag_rec_flat
            else []
        ),
    )
    if exact:
        kernel = functools.partial(
            _raster_kernel_exact,
            num_tiles=num_tiles,
            num_buckets=num_buckets,
            tiles_x=tiles_x,
            height=height,
            quad=quad,
            chunk=chunk,
            smem_blocks=smem_blocks,
            bin_rows=bin_rows,
            stub=_diag_stub,
        )
    elif paired:
        kernel = functools.partial(
            _raster_kernel_fast_paired,
            num_quads=num_quads,
            quad=quad,
            chunk=chunk,
            smem_blocks=smem_blocks,
            pool_clamp=pool_clamp,
            split_main=_diag_split_main,
            rec_flat=_diag_rec_flat,
        )
    else:
        kernel = functools.partial(
            _raster_kernel_fast,
            num_tiles=num_tiles,
            num_buckets=num_buckets,
            tiles_x=tiles_x,
            quad=quad,
            chunk=chunk,
            smem_blocks=smem_blocks,
            bin_rows=bin_rows,
            stub=_diag_stub,
        )
    tile_depths = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((batch,) + out_block[1:], jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        starts_in,
        xcoords,
        ycoords,
        fdata,
    )

    h_s, w_s = tiles_y * TILE_S, tiles_x * TILE_S
    if paired:
        pairs_x = w_s // 2
        if pool_clamp is not None:
            # Kernel emitted the pooled canvas: (B, NQ, (rp, cp)) where the
            # pooled row index is q*4 + rp — a pure reshape.
            return tile_depths.reshape(batch, h_s // 2, pairs_x)
        # Raw path: interleave the four parity planes back into the canvas.
        t = tile_depths.reshape(batch, num_quads, 2, 2, 4, pairs_x)
        t = t.transpose(0, 1, 4, 2, 5, 3)  # (B, q, rp, py, cp, px)
        return t.reshape(batch, h_s, w_s)
    if bin_rows:
        # Canvas-row-major lanes: the kernel output IS the canvas.
        out = tile_depths.reshape(batch, h_s, w_s)
        if pool_clamp is not None:
            t = jnp.minimum(out, pool_clamp)
            return t.reshape(batch, h_s // 2, 2, w_s // 2, 2).mean(axis=(2, 4))
        return out

    # (B, NQ, QUAD*64) -> tile grid; tile t covers rows ty*8..+8, cols tx*8..+8.
    out = tile_depths.reshape(batch, tiles_y, tiles_x, TILE_S, TILE_S)
    if pool_clamp is not None:
        # Clamp-then-pool in tile layout: the transpose back to canvas order
        # then moves 16x less data than pooling the assembled canvas.
        t = jnp.minimum(out, pool_clamp)
        t = t.reshape(
            batch, tiles_y, tiles_x, TILE_S // 2, 2, TILE_S // 2, 2
        ).mean(axis=(4, 6))
        return t.transpose(0, 1, 3, 2, 4).reshape(batch, h_s // 2, w_s // 2)
    return out.transpose(0, 1, 3, 2, 4).reshape(batch, h_s, w_s)
