"""Tile-binned Pallas rasterizer vs the brute-force XLA oracle (interpret)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spherehand_tpu.data.sampler import sample_poses
from spherehand_tpu.hand.kinematics import forward_kinematics
from spherehand_tpu.hand.skinning import lbs_mesh, orthographic_project
from spherehand_tpu.render.raster import bilinear_sample_positions, rasterize_depth
from spherehand_tpu.render.raster_pallas import rasterize_depth_binned


def _hand_faces(hand_model, key, batch):
    params = sample_poses(key, batch)
    tr = forward_kinematics(hand_model, params)
    verts = lbs_mesh(hand_model, tr)
    proj = orthographic_project(verts, 640.0)
    fv = proj[:, np.asarray(hand_model.faces).reshape(-1), :3]
    return fv.reshape(batch, hand_model.num_faces, 3, 3)


@pytest.mark.slow
def test_binned_matches_bruteforce_on_hand(hand_model):
    fv = _hand_faces(hand_model, jax.random.key(11), 2)
    samples = jnp.asarray(bilinear_sample_positions(64, 10))
    ref = np.asarray(rasterize_depth(fv, samples, samples))
    ours = np.asarray(
        rasterize_depth_binned(fv, samples, samples, interpret=True)
    )
    diff = np.abs(ref - ours)
    # identical coverage; a handful of boundary samples may differ by FMA order
    assert ((ref < 999) == (ours < 999)).mean() > 0.9995
    assert (diff > 1.0).mean() < 1e-3
    assert np.median(diff) == 0.0


def test_binned_handles_offscreen_and_degenerate(hand_model):
    # faces fully offscreen, tiny, and a giant face spanning many tiles
    fv = np.asarray(
        [
            [
                [[-900, -900, 50], [-800, -900, 50], [-850, -800, 50]],  # offscreen
                [[103, 103, 40], [116, 103, 40], [103, 116, 40]],  # 1 tile
                [[4, 4, 70], [600, 4, 70], [4, 600, 70]],  # overflow (giant)
            ]
        ],
        np.float32,
    )
    samples = jnp.asarray(bilinear_sample_positions(64, 10))
    ref = np.asarray(rasterize_depth(jnp.asarray(fv), samples, samples))
    ours = np.asarray(
        rasterize_depth_binned(jnp.asarray(fv), samples, samples, interpret=True)
    )
    np.testing.assert_allclose(ours, ref, atol=1e-3)
    assert (ref == 70.0).any() and (ref == 40.0).any()


def test_fast_mode_statistically_matches_exact(hand_model):
    """Half-plane fast coverage: identical depths away from triangle edges."""
    fv = _hand_faces(hand_model, jax.random.key(21), 2)
    samples = jnp.asarray(bilinear_sample_positions(64, 10))
    exact = np.asarray(
        rasterize_depth_binned(fv, samples, samples, interpret=True, exact=True)
    )
    fast = np.asarray(
        rasterize_depth_binned(fv, samples, samples, interpret=True, exact=False)
    )
    fg_exact = exact < 999
    fg_fast = fast < 999
    # coverage agrees except boundary samples
    iou = (fg_exact & fg_fast).sum() / max((fg_exact | fg_fast).sum(), 1)
    assert iou > 0.97, iou
    # matched foreground depths are identical interpolations
    both = fg_exact & fg_fast
    diff = np.abs(exact - fast)[both]
    assert np.percentile(diff, 99) < 0.5, np.percentile(diff, 99)


def test_valid_frac_truncation_is_lossless(hand_model):
    """Truncating the sorted buffer above the nondump count changes nothing."""
    from spherehand_tpu.render.raster_pallas import nondump_counts

    fv = _hand_faces(hand_model, jax.random.key(31), 2)
    samples = jnp.asarray(bilinear_sample_positions(64, 10))
    full = np.asarray(
        rasterize_depth_binned(fv, samples, samples, interpret=True, exact=False)
    )
    trunc = np.asarray(
        rasterize_depth_binned(
            fv, samples, samples, interpret=True, exact=False, valid_frac=0.62
        )
    )
    counts = np.asarray(nondump_counts(fv, samples, samples))
    assert counts.max() <= 0.62 * fv.shape[1]
    np.testing.assert_array_equal(full, trunc)


def test_pool_clamp_matches_manual_postprocess(hand_model):
    """Fused clamp+2x2 pool == clamp then block-mean of the raw buffer."""
    fv = _hand_faces(hand_model, jax.random.key(41), 2)
    samples = jnp.asarray(bilinear_sample_positions(64, 10))
    raw = np.asarray(
        rasterize_depth_binned(fv, samples, samples, interpret=True, exact=False)
    )
    fused = np.asarray(
        rasterize_depth_binned(
            fv, samples, samples, interpret=True, exact=False, pool_clamp=100.0
        )
    )
    manual = np.minimum(raw, 100.0).reshape(2, 64, 2, 64, 2).mean(axis=(2, 4))
    np.testing.assert_allclose(fused, manual, atol=1e-4)


def test_truncation_margin_vs_sampler_poses(hand_model):
    """The production valid_frac=0.62 margin holds over sampled poses
    (a 10,240-pose sweep measured max 48.4%; this is the fast regression)."""
    from spherehand_tpu.data.sampler import sample_poses
    from spherehand_tpu.render.raster_pallas import nondump_counts

    fv = _hand_faces(hand_model, jax.random.key(51), 64)
    samples = jnp.asarray(bilinear_sample_positions(64, 10))
    counts = np.asarray(nondump_counts(fv, samples, samples))
    frac = counts.max() / fv.shape[1]
    assert frac < 0.55, frac


def test_truncation_margin_lite_mesh():
    """Same sweep for the lite mesh's 0.70 bound (131k-pose TPU sweep
    measured max 53.9%; overflow would silently drop faces, so the lite
    production path carries a wider bound than its measured max)."""
    from spherehand_tpu.data.sampler import sample_poses
    from spherehand_tpu.hand.assets import load_hand_model
    from spherehand_tpu.render.raster_pallas import nondump_counts

    lite = load_hand_model(lite=True)
    fv = _hand_faces(lite, jax.random.key(52), 64)
    samples = jnp.asarray(bilinear_sample_positions(64, 10))
    counts = np.asarray(nondump_counts(fv, samples, samples))
    frac = counts.max() / fv.shape[1]
    assert frac < 0.62, frac  # production bound is 0.70


def test_closed_form_grid_matches_searchsorted():
    """bilinear_grid's integer index math == searchsorted on every integer
    query the binner can produce (ceil/trunc of bbox corners)."""
    from spherehand_tpu.render.raster_pallas import _paired_grid_searchsorted

    grid = jnp.asarray(bilinear_sample_positions(64, 10))
    v = jnp.arange(-1200, 1900).astype(jnp.float32)
    for side in ("left", "right"):
        ref = jnp.searchsorted(grid, v, side=side, method="compare_all")
        ours = _paired_grid_searchsorted(v, side, 64, 10)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(ours))


def test_bilinear_grid_flag_changes_nothing(hand_model):
    """The closed-form binning path renders identically to searchsorted.

    Exact mode runs the same kernel under both flags, so the comparison is
    bit-exact and isolates the binning index math. Fast mode additionally
    switches to the parity-factored kernel + packed 16-bit-quantized sort
    payloads when bilinear_grid is given, so it gets fast mode's statistical
    contract: interior depths within quantization noise (~1/64 mm steps),
    and only a small fraction of pixels may flip a boundary sample."""

    def flips_ok(a, b):
        d = np.abs(a - b)
        assert np.median(d) < 0.05, np.median(d)
        assert (d > 0.5).mean() < 0.01, (d > 0.5).mean()

    fv = _hand_faces(hand_model, jax.random.key(61), 2)
    samples = jnp.asarray(bilinear_sample_positions(64, 10))
    for exact, assert_fn in (
        (True, np.testing.assert_array_equal),
        (False, flips_ok),
    ):
        base = np.asarray(
            rasterize_depth_binned(fv, samples, samples, interpret=True,
                                   exact=exact, pool_clamp=100.0)
        )
        closed = np.asarray(
            rasterize_depth_binned(fv, samples, samples, interpret=True,
                                   exact=exact, pool_clamp=100.0,
                                   bilinear_grid=(64, 10))
        )
        assert_fn(base, closed)


def test_pack4_payload_variant_within_fast_contract(hand_model):
    """The 4-column packed-sort diagnostic (_diag_pack4: key+z0..z2+xy in
    126 bits) vs the 5-column 16-bit production packing: coarser
    quantization (1/8 px, 1/4 mm) stays inside fast mode's statistical
    contract — zero median depth change, p99 well under the 0.5 mm oracle
    budget, <1% boundary-flip pixels. (Kept as a measured sort-cost lever:
    one fewer sort column ~= -0.6 ms at B=1024; promote to default only if
    the stock-mesh north star needs it.)
    """
    fv = _hand_faces(hand_model, jax.random.key(67), 2)
    samples = jnp.asarray(bilinear_sample_positions(64, 10))
    kw = dict(interpret=True, exact=False, pool_clamp=100.0,
              bilinear_grid=(64, 10))
    p16 = np.asarray(rasterize_depth_binned(fv, samples, samples, **kw))
    p4 = np.asarray(
        rasterize_depth_binned(fv, samples, samples, _diag_pack4=True, **kw)
    )
    d = np.abs(p16 - p4)
    assert np.median(d) == 0.0
    assert np.percentile(d, 99) < 0.35, np.percentile(d, 99)
    assert (d > 0.5).mean() < 0.01, (d > 0.5).mean()
    fg16, fg4 = p16 < 99.0, p4 < 99.0
    assert (fg16 & fg4).sum() / (fg16 | fg4).sum() > 0.995


def test_tpu_compiled_parity_artifact():
    """On-chip Mosaic-compiled kernel vs the XLA oracle (captured artifact).

    CPU tests run the Pallas kernel interpret-mode only; Mosaic layout rules
    have diverged from interpret semantics before. tools/tpu_kernel_parity.py
    captured both modes + the oracle on the real chip; this asserts the
    recorded agreement and the shipped raw buffers."""
    import os

    path = os.path.join(
        os.path.dirname(__file__), "goldens", "tpu_kernel_parity.npz"
    )
    art = np.load(path)
    assert b"TPU" in bytes(art["backend"])
    assert float(art["exact_coverage_match"]) == 1.0
    assert float(art["exact_median_diff"]) == 0.0
    assert float(art["exact_big_diff_frac"]) < 1e-4
    assert float(art["fast_iou"]) > 0.999
    assert float(art["fast_p99_diff"]) < 0.5
    # The production fast configuration (parity-factored kernel + packed
    # 16-bit-quantized sort + truncation, as used by render_depth_64).
    if "fastp_iou" in art:
        assert float(art["fastp_iou"]) > 0.999
        assert float(art["fastp_p99_diff"]) < 0.5
    if "fastpool_median" in art:
        # The pooled epilogue the production path ships: interior pixels at
        # quantization noise; boundary-flip pixels (a sample crossing the
        # fg/bg clamp inside the 2x2 mean) must stay rare.
        assert float(art["fastpool_median"]) < 0.05
        assert float(art["fastpool_big_frac"]) < 0.005
    oracle, exact = art["oracle"], art["exact"]
    assert ((oracle < 999) == (exact < 999)).all()
    assert np.median(np.abs(oracle - exact)) == 0.0


def test_planes_front_end_matches_face_verts_on_hand(hand_model):
    """The gather-free planes input (project_faces_planes) reproduces the
    face_verts render: bit-identical raster given identical coordinates, and
    sub-pixel-boundary-only differences through the fused-projection front
    end (~1e-5 relative fp association change)."""
    from spherehand_tpu.hand.skinning import project_faces_planes

    params = sample_poses(jax.random.key(5), 2)
    tr = forward_kinematics(hand_model, params)
    fv = _hand_faces(hand_model, jax.random.key(5), 2)
    samples = jnp.asarray(bilinear_sample_positions(64, 10))
    kw = dict(exact=False, interpret=True, pool_clamp=100.0,
              bilinear_grid=(64, 10), valid_frac=0.62)
    base = np.asarray(rasterize_depth_binned(fv, samples, samples, **kw))

    # (a) identical coordinates via planes -> bit-identical output
    u = fv[..., 0].reshape(2, -1)
    v = fv[..., 1].reshape(2, -1)
    z = fv[..., 2].reshape(2, -1)
    same = np.asarray(
        rasterize_depth_binned(None, samples, samples, planes=(u, v, z), **kw)
    )
    np.testing.assert_array_equal(base, same)

    # (b) the fused-projection front end: interior depths match, boundary
    # pixels may flip (same tolerance class as the lite-mesh fidelity gate)
    planes = project_faces_planes(hand_model, tr, 640.0)
    fused = np.asarray(
        rasterize_depth_binned(None, samples, samples, planes=planes, **kw)
    )
    fg_a, fg_b = base < 99.9, fused < 99.9
    iou = (fg_a & fg_b).sum() / (fg_a | fg_b).sum()
    assert iou > 0.995, iou
    inter = fg_a & fg_b
    diff = np.abs(base - fused)[inter]
    assert np.median(diff) < 1e-3
    # p99 rides the silhouette: one flipped boundary SAMPLE inside a 2x2
    # pool block mixes background into the mean — same tolerance class as
    # the on-chip fast-vs-exact artifact (fast_p99 < 0.5 mm).
    assert np.percentile(diff, 99) < 0.5


def test_panel_records_bit_identical(hand_model):
    """The compact panel-record layout (_diag_rec_flat: (B, P, 16, 128)
    field-major panels + in-kernel per-panel transpose) is a pure layout
    change: the paired fast kernel must produce bit-identical output (also
    verified compiled on-chip — PERF.md round 4)."""
    fv = _hand_faces(hand_model, jax.random.key(9), 2)
    samples = jnp.asarray(bilinear_sample_positions(64, 10))
    kw = dict(exact=False, interpret=True, pool_clamp=100.0,
              bilinear_grid=(64, 10), valid_frac=0.62)
    base = np.asarray(rasterize_depth_binned(fv, samples, samples, **kw))
    flat = np.asarray(
        rasterize_depth_binned(
            fv, samples, samples, _diag_rec_flat=True, **kw
        )
    )
    np.testing.assert_array_equal(base, flat)
