"""Adversarial exact-mode rasterizer cases, pinned against the numpy oracle.

VERDICT r2 asked for hostile edge cases plus a derivation audit of the CUDA
kernel's scanline loop (`depth_rasterization_cuda_kernel.cu:68-112`) against
our implementations. Audit map (cu line -> oracle line -> library):

- .cu:68  ``xi_min = max(ceil(p0x), 0.)``
    -> raster_oracle.py:58; raster.py ``x_ok: sx >= ceil(px0)`` (samples are
    >= 0, so the max is implicit); pallas exact records col 5 (xlo).
- .cu:69  ``xi_max = min(p2x, W-1.)`` **cast to int32 = C trunc toward 0**
    -> raster_oracle.py:59 ``int(min(...))``; raster.py ``trunc(min(...))``.
    QUIRK: for a face entirely left of the canvas with p2x in (-1, 0) the
    cast yields 0, so column 0 is still painted, with y bounds EXTRAPOLATED
    beyond p2x (xi=0 > p2x). raster.py evaluates every (face, sample) pair so
    it inherits this for free; the pallas binner files faces by vertex bbox
    and needed an explicit bbox extension (_bin_faces "column-0 quirk") —
    found by this audit, pinned by test_column0_extrapolation_quirk.
- .cu:73-86 two-segment polyline yi1 (edge 0-1 for xi <= p1x else 1-2, with
    the vertical-edge fallback yi1 = p1y)
    -> raster_oracle.py:61-70; raster.py edge_y/where; pallas exact records
    cols 6-10 (slopes + vertical flags), kernel yi1 select.
- .cu:87  yi2 = edge 0-2 (never vertical: p0x != p2x guaranteed)
    -> raster_oracle.py:71; pallas col 8.
- .cu:90-91 ``yi_min = max(0., ceil(min(yi1, yi2)))``,
    ``yi_max = min(max(yi1, yi2), H-1.)`` int32 casts (same trunc rule; the
    negative-y variant of the quirk fills ROW 0 — test_raster.py covers it
    for raster.py, test_negative_y_bound here for pallas)
    -> raster_oracle.py:72-73.
- .cu:97-106 w = face_inv @ (xi, yi, 1), clamped to [0,1], renormalized by
    w_sum (w_sum == 0 -> 0/0 = NaN)
    -> raster_oracle.py:75-79; pallas exact cols 14-22 + w_sum > 0 guard.
- .cu:109  zp = 1 / sum(w_k / p_k z); NaN (from w_sum=0 or z=0) is dropped
    because fminf returns the non-NaN operand
    -> raster_oracle.py:80-82 ``if not isnan``; pallas `~isnan(depth)` term.
- .cu:112  atomicMin z-test -> min-reductions everywhere (race-free).

All comparisons here run the pallas kernel in interpret mode on a DENSE
128x128 integer grid (every canvas pixel sampled, tiles 16x16) so no quirk
pixel can hide between sparse samples.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from raster_oracle import rasterize_oracle
from spherehand_tpu.render.raster import rasterize_depth
from spherehand_tpu.render.raster_pallas import rasterize_depth_binned

SIZE = 128  # dense canvas: tiles 16x16, one sample per pixel
SAMPLES = jnp.arange(SIZE, dtype=jnp.float32)


def _both_windings(tri):
    """The face and its 0/1-swapped copy: exactly one is front-facing."""
    tri = np.asarray(tri, np.float32)
    return [tri, tri[[1, 0, 2]]]


def _run_exact(faces):
    fv = jnp.asarray(np.asarray(faces, np.float32)[None])
    ours = np.asarray(
        rasterize_depth_binned(
            fv, SAMPLES, SAMPLES, width=SIZE, height=SIZE,
            interpret=True, exact=True,
        )
    )
    oracle = rasterize_oracle(np.asarray(fv), SIZE, SIZE)
    return ours, oracle


def _assert_parity(ours, oracle, max_flip_frac=0.0):
    cov_ours, cov_orc = ours < 999, oracle < 999
    flips = (cov_ours != cov_orc).mean()
    assert flips <= max_flip_frac, f"coverage flips: {(cov_ours != cov_orc).sum()}"
    both = cov_ours & cov_orc
    if both.any():
        np.testing.assert_allclose(ours[both], oracle[both], atol=1e-3)


def test_column0_extrapolation_quirk():
    """Face entirely left of the canvas, p2x in (-1, 0): the C int cast of
    xi_max paints column 0 with scanline bounds extrapolated far OUTSIDE the
    face's vertex y-bbox (rows ~31-50 for a bbox spanning rows 20-30)."""
    faces = _both_windings(
        [[-6.0, 25.0, 50.0], [-0.6, 20.0, 50.0], [-0.4, 30.0, 50.0]]
    )
    ours, oracle = _run_exact(faces)
    # the quirk must actually fire: painted rows beyond the vertex bbox
    painted_rows = np.nonzero(oracle[0, :, 0] < 999)[0]
    assert painted_rows.size > 0, "quirk not exercised"
    assert painted_rows.max() > 31, painted_rows
    assert (oracle[0, :, 1:] == 1000.0).all()  # only column 0
    _assert_parity(ours, oracle)


def test_column0_quirk_vertical_edge12():
    """Same quirk with a vertical 1-2 edge (yi1 falls back to p1y)."""
    faces = _both_windings(
        [[-7.0, 90.0, 40.0], [-0.5, 60.0, 40.0], [-0.5, 95.0, 40.0]]
    )
    # p1x == p2x == -0.5: sorted order keeps a vertical right edge
    ours, oracle = _run_exact(faces)
    _assert_parity(ours, oracle)


def test_negative_y_bound_row0():
    """ymax in (-1, 0): the row-bound int cast fills row 0 (pallas path)."""
    faces = _both_windings(
        [[20.0, -6.0, 50.0], [32.0, -6.0, 50.0], [26.0, -0.4, 50.0]]
    )
    ours, oracle = _run_exact(faces)
    assert (oracle[0, 0] < 999).any(), "row-0 quirk not exercised"
    _assert_parity(ours, oracle)


def test_shared_edge_no_cracks():
    """A quad split along its diagonal: the shared edge may not leave cracks
    or double-flip pixels; depths resolve by the min rule."""
    quad = [
        [[10.0, 10.0, 50.0], [90.0, 12.0, 60.0], [12.0, 88.0, 70.0]],
        [[90.0, 12.0, 60.0], [92.0, 90.0, 80.0], [12.0, 88.0, 70.0]],
    ]
    faces = [w for t in quad for w in _both_windings(t)]
    ours, oracle = _run_exact(faces)
    assert (oracle < 999).mean() > 0.1  # big coverage
    _assert_parity(ours, oracle)


def test_exact_integer_x_vertices_and_ties():
    """Integer-x vertices exercise the sort tie ladder (.cu:38-45) and the
    ceil/trunc bounds landing exactly on sample columns."""
    tris = [
        [[10.0, 20.0, 50.0], [10.0, 60.0, 50.0], [40.0, 40.0, 50.0]],  # x-tie 0-1
        [[50.0, 20.0, 45.0], [80.0, 20.0, 45.0], [80.0, 50.0, 45.0]],  # x-tie 1-2
        [[20.0, 70.0, 42.0], [56.0, 70.0, 42.0], [38.0, 110.0, 42.0]],  # int bounds
        [[100.0, 100.0, 30.0], [100.0, 100.0, 30.0], [110.0, 105.0, 30.0]],  # dup vertex
    ]
    faces = [w for t in tris for w in _both_windings(t)]
    ours, oracle = _run_exact(faces)
    # integer-x geometry puts scanline bounds exactly on pixel centers where
    # FMA ordering can flip ceil results; allow a sliver of boundary flips
    _assert_parity(ours, oracle, max_flip_frac=2e-4)


def test_sliver_faces_across_tile_rows():
    """Sub-pixel-wide slivers spanning many tile rows (tall) and columns
    (wide): coverage is a sparse dotted line; bins must still route them."""
    tris = [
        [[30.0, 5.0, 50.0], [30.3, 5.0, 50.0], [30.15, 120.0, 50.0]],  # tall
        [[5.0, 64.2, 60.0], [120.0, 64.5, 60.0], [5.0, 64.4, 60.0]],   # wide
        [[60.0, 7.9, 70.0], [60.2, 8.1, 70.0], [60.1, 72.2, 70.0]],    # crosses
    ]
    faces = [w for t in tris for w in _both_windings(t)]
    ours, oracle = _run_exact(faces)
    assert (oracle < 999).any()
    _assert_parity(ours, oracle, max_flip_frac=2e-4)


def test_overflow_bucket_tall_faces():
    """Faces spanning >2 tile rows go to the shared overflow bucket; their
    row-gating union must cover every painted row."""
    tris = [
        [[8.0, 8.0, 50.0], [24.0, 8.0, 50.0], [16.0, 120.0, 50.0]],    # 15 rows
        [[40.0, 30.0, 45.0], [70.0, 30.0, 45.0], [55.0, 90.0, 45.0]],  # 8 rows
        [[100.0, 100.0, 40.0], [112.0, 100.0, 40.0], [106.0, 126.0, 40.0]],
    ]
    faces = [w for t in tris for w in _both_windings(t)]
    ours, oracle = _run_exact(faces)
    assert (oracle < 999).mean() > 0.02
    _assert_parity(ours, oracle, max_flip_frac=2e-4)


def test_valid_frac_exact_boundary():
    """nondump count exactly AT the truncation bound: nothing may vanish."""
    rng = np.random.RandomState(7)
    # 64 faces; fill with a mix of front/back so nondump lands near half
    tris = []
    for _ in range(32):
        base = rng.uniform(10, 110, 2)
        tri = np.stack([
            np.array([base[0], base[1], 50.0]),
            np.array([base[0] + 8, base[1], 50.0]),
            np.array([base[0] + 4, base[1] + 8, 50.0]),
        ])
        tris.extend(_both_windings(tri))  # one of each pair is nondump
    fv = jnp.asarray(np.asarray(tris, np.float32)[None])
    from spherehand_tpu.render.raster_pallas import nondump_counts

    counts = np.asarray(
        nondump_counts(fv, SAMPLES, SAMPLES, 16, 16, SIZE, SIZE)
    )
    # chunk 16: keep = ceil(64 * 0.5 / 16) * 16 = 32 == nondump count exactly
    assert counts[0] == 32, counts
    full = np.asarray(
        rasterize_depth_binned(fv, SAMPLES, SAMPLES, width=SIZE, height=SIZE,
                               interpret=True, exact=True)
    )
    trunc = np.asarray(
        rasterize_depth_binned(fv, SAMPLES, SAMPLES, width=SIZE, height=SIZE,
                               interpret=True, exact=True, valid_frac=0.5)
    )
    np.testing.assert_array_equal(full, trunc)


def test_random_fuzz_exact_vs_oracle():
    """200 random triangles (mixed winding, sizes, off-screen spill)."""
    rng = np.random.RandomState(3)
    verts = rng.uniform(-12, SIZE + 12, (1, 200, 3, 2)).astype(np.float32)
    z = rng.uniform(20, 90, (1, 200, 3, 1)).astype(np.float32)
    fv = np.concatenate([verts, z], axis=-1)
    ours = np.asarray(
        rasterize_depth_binned(
            jnp.asarray(fv), SAMPLES, SAMPLES, width=SIZE, height=SIZE,
            interpret=True, exact=True,
        )
    )
    oracle = rasterize_oracle(fv, SIZE, SIZE)
    _assert_parity(ours, oracle, max_flip_frac=2e-4)


def test_fast_mode_interior_depths_on_adversarial_set():
    """Fast mode has no parity contract at boundaries, but interior depths
    (both modes covered) must agree to interpolation-identity level."""
    rng = np.random.RandomState(5)
    verts = rng.uniform(-12, SIZE + 12, (1, 100, 3, 2)).astype(np.float32)
    z = rng.uniform(20, 90, (1, 100, 3, 1)).astype(np.float32)
    fv = jnp.asarray(np.concatenate([verts, z], axis=-1))
    exact = np.asarray(
        rasterize_depth_binned(fv, SAMPLES, SAMPLES, width=SIZE, height=SIZE,
                               interpret=True, exact=True)
    )
    fast = np.asarray(
        rasterize_depth_binned(fv, SAMPLES, SAMPLES, width=SIZE, height=SIZE,
                               interpret=True, exact=False)
    )
    both = (exact < 999) & (fast < 999)
    assert both.any()
    diff = np.abs(exact - fast)[both]
    assert np.percentile(diff, 95) < 1.0, np.percentile(diff, 95)


def test_packed_sort_quantization_bound_adversarial():
    """Pins the SHIPPED fast-mode contract on hostile geometry.

    The production fast path (render_depth_64: paired kernel + packed
    5-column sort) quantizes sort payloads to 16-bit fixed point — canvas
    coords at 1/32 px, depth at 1/64 mm (raster_pallas.py header). This
    asserts the resulting error bound against the unpacked f32 fast path on
    adversarial random geometry: slivers, off-screen spill, mixed winding,
    near-degenerate faces — not just the well-behaved hand mesh
    (test_raster_pallas.py::test_bilinear_grid_flag_changes_nothing).

    Contract (also stated in README + the kernel docstring): interior
    depths within quantization noise (median 0 at output precision, p99
    <= 0.5 mm including pool-mixed boundary samples), boundary sample
    flips < 1% of pixels, foreground IoU > 0.99.
    """
    from spherehand_tpu.render.raster import bilinear_sample_positions

    rng = np.random.RandomState(17)
    n = 300
    verts = rng.uniform(-12.0, 652.0, (1, n, 3, 2)).astype(np.float32)
    # squash a third of the faces into slivers (tiny y extent, long x)
    n_sliver = verts[0, ::3].shape[0]
    verts[0, ::3, :, 1] = (
        verts[0, ::3, :1, 1] + rng.uniform(-0.6, 0.6, (n_sliver, 3))
    ).astype(np.float32)
    z = rng.uniform(20.0, 90.0, (1, n, 3, 1)).astype(np.float32)
    fv = np.concatenate([verts, z], axis=-1)
    swap = rng.rand(n) < 0.5  # mixed winding
    fv[0, swap] = fv[0, swap][:, [1, 0, 2]]
    fv = jnp.asarray(fv)

    samples = jnp.asarray(bilinear_sample_positions(64, 10))
    kw = dict(interpret=True, exact=False, pool_clamp=100.0)
    unpacked = np.asarray(rasterize_depth_binned(fv, samples, samples, **kw))
    packed = np.asarray(
        rasterize_depth_binned(fv, samples, samples,
                               bilinear_grid=(64, 10), **kw)
    )
    d = np.abs(packed - unpacked)
    assert np.median(d) == 0.0, np.median(d)
    assert np.percentile(d, 99) <= 0.5, np.percentile(d, 99)
    assert (d > 0.5).mean() < 0.01, (d > 0.5).mean()
    fg_u, fg_p = unpacked < 99.9, packed < 99.9
    iou = (fg_u & fg_p).sum() / max((fg_u | fg_p).sum(), 1)
    assert iou > 0.99, iou
