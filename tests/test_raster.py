"""XLA rasterizer vs the numpy scanline oracle (CUDA-kernel semantics)."""
import numpy as np
import pytest

import jax.numpy as jnp

from raster_oracle import downsample_2x2_mean, rasterize_oracle
from spherehand_tpu.hand.kinematics import forward_kinematics
from spherehand_tpu.hand.skinning import lbs_mesh, orthographic_project
from spherehand_tpu.render.raster import (
    bilinear_sample_positions,
    rasterize_depth,
    render_depth_64,
)


def _random_faces(rng, batch, num_faces, size, z_range=(20.0, 90.0)):
    verts = rng.uniform(-10, size + 10, (batch, num_faces, 3, 2)).astype(np.float32)
    z = rng.uniform(*z_range, (batch, num_faces, 3, 1)).astype(np.float32)
    return np.concatenate([verts, z], axis=-1)


def test_raster_matches_oracle_random_triangles():
    rng = np.random.RandomState(0)
    fv = _random_faces(rng, 2, 64, 64)
    oracle = rasterize_oracle(fv, 64, 64)
    samples = jnp.arange(64, dtype=jnp.float32)
    ours = rasterize_depth(jnp.asarray(fv), samples, samples, width=64, height=64)
    np.testing.assert_allclose(np.asarray(ours), oracle, atol=1e-4, rtol=1e-5)


def test_raster_degenerate_and_culled_faces():
    # One back-facing, one zero-area (vertical line), one flat-z triangle.
    fv = np.asarray(
        [
            [
                [[10, 10, 50], [10, 30, 50], [30, 10, 50]],  # back-facing (cw)
                [[20, 5, 40], [20, 25, 40], [20, 15, 40]],  # x-degenerate line
                [[5, 5, 30], [25, 5, 30], [5, 25, 30]],  # valid ccw
            ]
        ],
        np.float32,
    )
    oracle = rasterize_oracle(fv, 40, 40)
    samples = jnp.arange(40, dtype=jnp.float32)
    ours = rasterize_depth(jnp.asarray(fv), samples, samples, width=40, height=40)
    np.testing.assert_allclose(np.asarray(ours), oracle, atol=1e-4)
    assert (np.asarray(ours) == 30.0).any()  # the valid face rendered


def test_raster_negative_bound_truncation():
    # max y in (-1, 0): C int truncation makes the CUDA kernel fill row 0.
    fv = np.asarray(
        [[[[2.0, -6.0, 50.0], [14.0, -6.0, 50.0], [8.0, -0.4, 50.0]]]], np.float32
    )
    oracle = rasterize_oracle(fv, 20, 20)
    samples = jnp.arange(20, dtype=jnp.float32)
    ours = rasterize_depth(jnp.asarray(fv), samples, samples, width=20, height=20)
    np.testing.assert_allclose(np.asarray(ours), oracle, atol=1e-4)
    assert (oracle[0, 0] != 1000.0).any()  # quirk actually exercised


@pytest.mark.slow
def test_hand_render_matches_oracle_640(hand_model):
    """Full-mesh parity: sparse-sample raster == 640 canvas render + resize."""
    params = jnp.zeros((1, 26))
    transforms = forward_kinematics(hand_model, params)
    verts = lbs_mesh(hand_model, transforms)
    projected = orthographic_project(verts, 640.0)
    fv = np.asarray(projected[:, np.asarray(hand_model.faces).reshape(-1), :3]).reshape(
        1, hand_model.num_faces, 3, 3
    )
    oracle640 = rasterize_oracle(fv, 640, 640)
    oracle640 = np.minimum(oracle640, 100.0)
    sample_pos = bilinear_sample_positions(64, 10)
    expected = downsample_2x2_mean(oracle640, sample_pos)

    ours = render_depth_64(hand_model, transforms)
    assert np.asarray(ours).shape == (1, 64, 64)
    mismatch = np.abs(np.asarray(ours) - expected)
    # FMA/rounding differences between XLA and numpy flip a handful of
    # triangle-boundary pixels; require statistical agreement, not bit parity.
    assert (mismatch > 1e-2).mean() < 0.01, f"{(mismatch > 1e-2).sum()} pixels off"
    assert (mismatch > 1.0).mean() < 0.002, f"gross outliers: {(mismatch > 1.0).sum()}"
    assert mismatch.mean() < 0.01
    # sanity: the hand actually covers a nontrivial foreground region
    assert (expected < 99.0).mean() > 0.05
