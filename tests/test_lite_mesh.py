"""Quality/regression checks for the decimated "lite" hand mesh artifact.

The lite mesh (assets/hand_model_lite.npz, built by tools/make_lite_mesh.py)
is the fast synthetic-render path: ~half the triangles, ~12x fewer LBS
columns, identical bones/keypoints/spheres. These tests pin the shipped
artifact's structural invariants cheaply, and its render fidelity vs the
full mesh under the slow marker.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

ASSET_DIR = os.path.join(os.path.dirname(__file__), "..", "assets")


@pytest.fixture(scope="module")
def raw():
    return (
        np.load(os.path.join(ASSET_DIR, "hand_model.npz")),
        np.load(os.path.join(ASSET_DIR, "hand_model_lite.npz")),
    )


def test_schema_and_shared_tables(raw):
    """Same npz schema; every non-mesh table is byte-identical to the full
    model, so losses/metrics/keypoints are unaffected by mesh choice."""
    full, lite = raw
    assert set(lite.files) == set(full.files) - {"skin_matrix"} or set(
        lite.files
    ) == set(full.files)
    for k in ("offset_mats", "bone_names", "kp_local", "kp_bone", "kp_radius"):
        np.testing.assert_array_equal(lite[k], full[k])


def test_budget_and_compactness(raw):
    full, lite = raw
    f = lite["faces"]
    assert f.shape[0] <= 1700
    assert f.shape[0] >= 1200  # not over-decimated
    used = np.unique(f)
    assert used.shape[0] == lite["vertices"].shape[0]  # fully compacted
    assert used.min() == 0 and used.max() == used.shape[0] - 1


def test_vertices_are_exact_subset(raw):
    """Endpoint folds only: every lite vertex is an original vertex with its
    original skinning weights (LBS exact for survivors)."""
    full, lite = raw
    fv = full["vertices"][:, :3]
    lv = lite["vertices"][:, :3]
    # match lite vertices to full rows by position
    key_full = {tuple(p): i for i, p in enumerate(map(tuple, fv))}
    idx = np.array([key_full[tuple(p)] for p in map(tuple, lv)])
    np.testing.assert_array_equal(full["skin_weights"][:, idx], lite["skin_weights"])


def test_no_degenerate_or_duplicate_faces(raw):
    _, lite = raw
    f = lite["faces"]
    assert ((f[:, 0] != f[:, 1]) & (f[:, 1] != f[:, 2]) & (f[:, 0] != f[:, 2])).all()
    key = np.sort(f, axis=1)
    assert np.unique(key, axis=0).shape[0] == f.shape[0]
    v = lite["vertices"][:, :3]
    a, b, c = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    area2 = np.linalg.norm(np.cross(b - a, c - a), axis=1)
    assert area2.min() > 1e-9


def test_loader_lite_flag(raw):
    from spherehand_tpu.hand.assets import load_hand_model

    full = load_hand_model()
    lite = load_hand_model(lite=True)
    assert lite.num_faces < full.num_faces
    np.testing.assert_array_equal(
        np.asarray(lite.kp_local), np.asarray(full.kp_local)
    )
    # right-hand winding swap (columns 0/1) applied to the lite mesh too
    _, lite_npz = raw
    np.testing.assert_array_equal(
        np.asarray(lite.faces), lite_npz["faces"][:, [1, 0, 2]]
    )


def test_e2e_artifact_lite_matches_full_training():
    """The TPU-run end-to-end gate (tools/lite_mesh_e2e.py, 75k steps):
    an estimator trained on lite renders must land within 0.5 mm of one
    trained on full renders, both evaluated on full-mesh held-out renders."""
    import json

    with open(os.path.join(os.path.dirname(__file__), "goldens",
                           "lite_mesh_e2e.json")) as f:
        art = json.load(f)
    assert art["steps"] >= 50_000
    gap = art["lite"]["heldout_mm"] - art["full"]["heldout_mm"]
    assert gap < 0.5, art
    assert art["full"]["heldout_mm"] < 8.0, art  # reproduces the baseline


def test_synt_step_trains_with_lite_mesh():
    """The full synthetic train step (sampler -> lite raster -> hourglass ->
    losses -> Adam) runs and is finite with --mesh lite."""
    from spherehand_tpu.hand.assets import load_hand_model
    from spherehand_tpu.train.config import EngineConfig
    from spherehand_tpu.train.steps import build_steps

    cfg = EngineConfig(synt_batch=2, real_batch=2, num_stacks=1, mesh="lite")
    hand = load_hand_model(lite=True)
    steps = build_steps(cfg, hand)
    state = steps.init_state(jax.random.key(0))
    state, metrics = jax.jit(steps.synt_step)(
        state, jax.random.key(1), jnp.asarray(1e-3)
    )
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["synt_uv"]) > 0


@pytest.mark.slow
def test_render_fidelity_vs_full():
    """Lite renders match full renders away from occlusion boundaries.

    At 64x64 most hand pixels neighbour a depth discontinuity, where a
    sub-pixel silhouette shift legitimately flips which surface a sample
    hits — so fidelity is asserted on coverage IoU and on interior pixels
    (3x3 neighbourhood depth range < 10mm in the full render)."""
    from spherehand_tpu.data.sampler import sample_poses
    from spherehand_tpu.hand.assets import load_hand_model
    from spherehand_tpu.hand.kinematics import forward_kinematics
    from spherehand_tpu.render.raster import render_depth_64

    full = load_hand_model()
    lite = load_hand_model(lite=True)
    params = sample_poses(jax.random.key(7), 4)

    def render(model):
        tr = forward_kinematics(model, params)
        return np.asarray(render_depth_64(model, tr, backend="xla"))

    df, dl = render(full), render(lite)
    fg_f, fg_l = df < 99.9, dl < 99.9
    iou = (fg_f & fg_l).sum() / (fg_f | fg_l).sum()
    assert iou > 0.97, iou

    from scipy.ndimage import maximum_filter, minimum_filter

    interior = (
        (maximum_filter(df, size=3, axes=(1, 2))
         - minimum_filter(df, size=3, axes=(1, 2))) < 10.0
    )
    sel = fg_f & fg_l & interior
    d = np.abs(df - dl)[sel]
    assert np.percentile(d, 50) < 0.5, np.percentile(d, 50)
    assert np.percentile(d, 95) < 5.0, np.percentile(d, 95)
