"""Sphere render, heatmap render, soft-argmax, and loss parity vs goldens."""
import numpy as np

import jax.numpy as jnp

from spherehand_tpu.losses.geometric import bone_length_loss, collision_loss
from spherehand_tpu.losses.multiview import (
    multiview_consistency_loss,
    mutual_projection_loss,
)
from spherehand_tpu.ops.softargmax import heatmap_variance, recover_xyz
from spherehand_tpu.render.heatmap import render_heatmaps, render_joint_heatmaps
from spherehand_tpu.render.sphere import (
    data_to_model_distance,
    render_sphere_hand,
    render_spheres,
)


def test_sphere_render_matches_golden(goldens):
    g = goldens("sphere_render")
    maps = render_spheres(jnp.asarray(g["centers"]), jnp.asarray(g["radii"]), 64)
    np.testing.assert_allclose(np.asarray(maps), g["maps"], atol=1e-3, rtol=1e-5)


def test_sphere_hand_min_reduce(goldens):
    g = goldens("sphere_render")
    part, dm = render_sphere_hand(
        jnp.asarray(g["joints"]), jnp.asarray(g["radii_41"]), 64
    )
    assert part.shape == (3, 41, 64, 64)
    np.testing.assert_allclose(np.asarray(dm), g["dms"], atol=1e-3, rtol=1e-5)


def test_data_to_model_matches_golden(goldens):
    g = goldens("sphere_render")
    loss = data_to_model_distance(
        jnp.asarray(g["dms"]), jnp.asarray(g["query"]), jnp.asarray(g["radii_41"])
    )
    np.testing.assert_allclose(float(loss), float(g["d2m_loss"]), atol=2e-3, rtol=1e-4)


def test_heatmap_render_matches_golden(goldens):
    g = goldens("heatmap_render")
    uv, d = render_heatmaps(jnp.asarray(g["uvd"]), 16)
    np.testing.assert_allclose(np.asarray(uv), g["uv_hms"], atol=1e-5)
    np.testing.assert_allclose(np.asarray(d), g["d_hms"], atol=1e-5)


def test_joint_heatmap_render_matches_golden(hand_model, goldens):
    g = goldens("heatmap_render")
    uv, d, xyz = render_joint_heatmaps(
        hand_model, jnp.asarray(g["transforms"]), 16, jnp.asarray(g["rand_f"])
    )
    np.testing.assert_allclose(np.asarray(uv), g["hand_uv_hms"], atol=2e-3)
    np.testing.assert_allclose(np.asarray(d), g["hand_d_hms"], atol=2e-3)
    np.testing.assert_allclose(np.asarray(xyz), g["hand_xyz"], atol=2e-3, rtol=1e-4)


def test_recover_xyz_matches_golden(goldens):
    g = goldens("softargmax")
    xyz = recover_xyz(jnp.asarray(g["uv_hms"]), jnp.asarray(g["d_hms"]))
    np.testing.assert_allclose(np.asarray(xyz), g["xyz"], atol=2e-3, rtol=1e-4)


def test_heatmap_variance_matches_golden(goldens):
    g = goldens("softargmax")
    var = heatmap_variance(jnp.asarray(g["uv_hms"]))
    np.testing.assert_allclose(np.asarray(var), g["variance"], atol=1e-5, rtol=1e-4)


def test_collision_loss_matches_golden(goldens):
    g = goldens("geometric_losses")
    loss = collision_loss(jnp.asarray(g["joints"]))
    np.testing.assert_allclose(float(loss), float(g["collision"]), rtol=1e-5)


def test_bone_length_loss_matches_golden(goldens):
    g = goldens("geometric_losses")
    # Pair tables and thresholds agree with the reference's buffers.
    from spherehand_tpu import constants as C

    np.testing.assert_array_equal(C.BONE_PAIRS_J1, g["bl_joint_1"])
    np.testing.assert_array_equal(C.BONE_PAIRS_J2, g["bl_joint_2"])
    np.testing.assert_allclose(
        (C.BONE_MEDIAN_LENGTH * 0.80) ** 2, g["bl_min_sq"][0], rtol=1e-6
    )
    loss = bone_length_loss(jnp.asarray(g["joints"]))
    np.testing.assert_allclose(float(loss), float(g["bone_length"]), rtol=1e-4)


def test_mutual_projection_loss_matches_golden(goldens):
    g = goldens("multiview")
    radii = goldens("sphere_render")["radii_41"]
    loss_mv, proj = mutual_projection_loss(
        jnp.asarray(g["poses"]),
        jnp.asarray(g["inv_poses"]),
        jnp.asarray(g["joints"]),
        jnp.asarray(g["dms"]),
        jnp.asarray(radii),
        is_mv=True,
    )
    np.testing.assert_allclose(np.asarray(proj), g["projected_dms"], atol=1e-2, rtol=1e-5)
    np.testing.assert_allclose(float(loss_mv), float(g["mv_loss"]), rtol=2e-4)
    loss_sv, _ = mutual_projection_loss(
        jnp.asarray(g["poses"]),
        jnp.asarray(g["inv_poses"]),
        jnp.asarray(g["joints"]),
        jnp.asarray(g["dms"]),
        jnp.asarray(radii),
        is_mv=False,
    )
    np.testing.assert_allclose(float(loss_sv), float(g["sv_loss"]), rtol=2e-4)


def test_multiview_consistency_matches_golden(goldens):
    g = goldens("multiview")
    loss = multiview_consistency_loss(jnp.asarray(g["poses"]), jnp.asarray(g["joints"]))
    np.testing.assert_allclose(float(loss), float(g["consistency"]), rtol=1e-4)
