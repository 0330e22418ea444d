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
