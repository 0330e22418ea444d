"""FK and skinning parity against reference-generated goldens (tools/make_goldens.py)."""
import numpy as np

import jax
import jax.numpy as jnp

from spherehand_tpu.hand.kinematics import forward_kinematics, rotation_about_axis
from spherehand_tpu.hand.skinning import (
    apply_random_scale,
    inverse_orthographic,
    lbs_faces,
    lbs_keypoints,
    lbs_mesh,
    orthographic_project,
    orthographic_project_xyz,
)


def test_rotation_about_axis_basics():
    x = jnp.asarray([1.0, 0.0, 0.0])
    r = rotation_about_axis(x, jnp.asarray(np.pi / 2))
    expected = np.asarray([[1, 0, 0], [0, 0, -1], [0, 1, 0]], np.float32)
    np.testing.assert_allclose(np.asarray(r), expected, atol=1e-6)
    # Identity at zero angle for an arbitrary axis.
    a = jnp.asarray([0.6, 0.0, 0.8])
    np.testing.assert_allclose(
        np.asarray(rotation_about_axis(a, jnp.asarray(0.0))), np.eye(3), atol=1e-7
    )


def test_fk_rest_pose_is_identity(hand_model):
    params = jnp.zeros((2, 26))
    mats = forward_kinematics(hand_model, params)
    np.testing.assert_allclose(
        np.asarray(mats), np.tile(np.eye(4, dtype=np.float32), (2, 17, 1, 1)), atol=1e-4
    )


def test_fk_matches_reference_golden(hand_model, goldens):
    g = goldens("fk")
    mats = forward_kinematics(hand_model, jnp.asarray(g["params"]))
    np.testing.assert_allclose(np.asarray(mats), g["transforms"], atol=2e-4, rtol=1e-5)


def test_lbs_matches_reference_golden(hand_model, goldens):
    g = goldens("lbs")
    transforms = jnp.asarray(g["transforms"])
    kp = lbs_keypoints(hand_model, transforms)
    np.testing.assert_allclose(np.asarray(kp), g["keypoints"], atol=2e-3, rtol=1e-5)
    mesh_pts = lbs_mesh(hand_model, transforms)
    np.testing.assert_allclose(np.asarray(mesh_pts), g["mesh_points"], atol=5e-3, rtol=1e-4)


def test_projection_matches_reference_golden(goldens):
    g = goldens("lbs")
    pts = jnp.asarray(g["mesh_points"])
    proj = orthographic_project(pts, 640.0, jnp.asarray(g["rand_f"]))
    np.testing.assert_allclose(np.asarray(proj), g["projected"], atol=2e-3, rtol=1e-5)
    proj_plain = orthographic_project(pts, 640.0)
    np.testing.assert_allclose(np.asarray(proj_plain), g["projected_plain"], atol=2e-3, rtol=1e-5)


def test_inverse_orthographic_roundtrip():
    rng = np.random.RandomState(0)
    pts = jnp.asarray(
        np.concatenate(
            [rng.uniform(-140, 140, (2, 9, 3)), np.ones((2, 9, 1))], axis=-1
        ).astype(np.float32)
    )
    uvd = orthographic_project(pts, 64.0)
    back = inverse_orthographic(uvd, 64.0)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-4)


def test_random_scale_range_and_application(hand_model):
    transforms = forward_kinematics(hand_model, jnp.zeros((4, 26)))
    scaled = apply_random_scale(jax.random.key(0), transforms, 0.1)
    diag = np.asarray(scaled)[:, 0, [0, 1, 2], [0, 1, 2]]
    assert ((diag >= 0.85 - 1e-6) & (diag <= 0.95 + 1e-6)).all()
    # Same scale premultiplied on every bone of a batch element.
    s = np.asarray(scaled)
    np.testing.assert_allclose(s[:, 3, [0, 1, 2], [0, 1, 2]], diag, atol=1e-6)


def test_lbs_faces_matches_gather_path(hand_model):
    """Fused face-order LBS == lbs_mesh + faces gather (same dot products)."""
    rng = np.random.RandomState(3)
    pose = jnp.asarray(rng.uniform(-0.4, 0.4, (2, 26)).astype(np.float32))
    transforms = forward_kinematics(hand_model, pose)
    via_gather = lbs_mesh(hand_model, transforms)[
        :, hand_model.faces.reshape(-1)
    ]
    fused = lbs_faces(hand_model, transforms)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(via_gather), atol=1e-4, rtol=1e-6
    )
    # Projection without the homogeneous column matches bit for bit.
    rand_f = jnp.asarray(rng.uniform(0.9, 1.1, (2,)).astype(np.float32))
    ref = orthographic_project(via_gather, 640.0, rand_f)[..., :3]
    got = orthographic_project_xyz(fused, 640.0, rand_f)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_project_faces_planes_matches_unfused(hand_model):
    """Fused LBS+projection planes == lbs_faces -> orthographic_project_xyz
    (associativity differs, so tolerance is fp-roundoff at canvas scale)."""
    from spherehand_tpu.hand.skinning import project_faces_planes

    rng = np.random.RandomState(11)
    pose = jnp.asarray(rng.uniform(-0.4, 0.4, (2, 26)).astype(np.float32))
    transforms = forward_kinematics(hand_model, pose)
    rand_f = jnp.asarray(rng.uniform(0.9, 1.1, (2,)).astype(np.float32))
    u, v, z = project_faces_planes(hand_model, transforms, 640.0, rand_f)
    ref = orthographic_project_xyz(
        lbs_faces(hand_model, transforms), 640.0, rand_f
    )
    np.testing.assert_allclose(np.asarray(u), np.asarray(ref[..., 0]), atol=5e-3)
    np.testing.assert_allclose(np.asarray(v), np.asarray(ref[..., 1]), atol=5e-3)
    np.testing.assert_allclose(np.asarray(z), np.asarray(ref[..., 2]), atol=5e-3)
    # And without the focal jitter.
    u2, v2, z2 = project_faces_planes(hand_model, transforms, 640.0)
    ref2 = orthographic_project_xyz(lbs_faces(hand_model, transforms), 640.0)
    np.testing.assert_allclose(np.asarray(u2), np.asarray(ref2[..., 0]), atol=5e-3)
