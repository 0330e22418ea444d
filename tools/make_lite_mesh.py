"""Build the decimated "lite" hand mesh for the fast synthetic-render path.

At the production 64x64 output resolution the rasterizer samples the 640
canvas every 5 px (~1.3 mm on the hand), so the full 3,382-triangle mesh
carries far more geometry than a depth map can resolve — and the raster
pre-pass (the per-face sort is comparator-bound, PERF.md) plus the kernel
scale with face count. This tool half-edge-collapses the mesh to a target
face budget and writes ``assets/hand_model_lite.npz`` with the SAME schema
as ``hand_model.npz`` (tools/convert_assets.py), so
``load_hand_model(lite=True)`` is a drop-in for synthetic data generation.

The source asset is a triangle soup (per-face private vertices); a weld
pass first merges duplicate positions into ~1,721 shared vertices — exact,
since duplicates carry identical skin weights — so collapses actually
stitch neighbouring triangles instead of punching holes.

Decimation = quadric-error-metric edge collapse (tools/_qem_decimate.py;
lowest-error-first endpoint folds, so kept
vertices keep their exact positions AND skinning weights — no interpolation,
so LBS stays exact for every surviving vertex), guarded by:
  - normal-flip rejection: a collapse may not rotate any surviving incident
    face normal by more than 60 degrees (rest pose);
  - degenerate rejection: no zero-area faces, no duplicate faces;
  - skinning guard: endpoints must have similar bone weights (L1 < 0.6), so
    geometry is never dragged across a joint.

Validation (CPU, XLA oracle renderer): renders sampled poses with full and
lite meshes and reports coverage IoU and matched-foreground depth error.
The quality regression test asserts the shipped artifact's budget
(tests/test_lite_mesh.py).

Usage: python tools/make_lite_mesh.py [--target 1700] [--validate 32]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from _qem_decimate import qem_decimate


def weld(vertices: np.ndarray, faces: np.ndarray, weights: np.ndarray):
    """Merge duplicate-position vertices (exact byte match).

    The source asset is a triangle soup — ~10,144 stored vertices for 3,382
    faces, every vertex private to one face (verified: 10,144 of 10,145
    undirected edges belong to exactly one face). Welding is EXACT: duplicate
    positions carry identical skin weights (checked here), so renders and LBS
    are bit-identical. Returns (vertices', faces', weights') with ~1,721
    shared vertices and real adjacency, which edge collapse requires.
    """
    pos = np.ascontiguousarray(vertices[:, :3])
    key = pos.view([("", pos.dtype)] * 3).ravel()
    uniq, first, inv = np.unique(key, return_index=True, return_inverse=True)
    grp_w = weights[:, first]
    chk = np.abs(grp_w[:, inv] - weights).max()
    if chk != 0.0:
        raise ValueError(f"weld not exact: weight diff {chk}")
    return vertices[first], inv[faces].astype(faces.dtype), grp_w


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--target", type=int, default=1700)
    ap.add_argument("--validate", type=int, default=32,
                    help="poses for the full-vs-lite render comparison")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    asset_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "..", "assets")
    src = np.load(os.path.join(asset_dir, "hand_model.npz"))
    vertices, faces, weights = weld(
        src["vertices"], src["faces"], src["skin_weights"]
    )
    print(f"welded {src['vertices'].shape[0]} -> {vertices.shape[0]} vertices")

    lite_faces, used = qem_decimate(vertices, faces, weights, args.target)
    print(f"faces {faces.shape[0]} -> {lite_faces.shape[0]}, "
          f"used vertices {used.shape[0]} (of {vertices.shape[0]})")

    # compact vertices to the used subset and remap faces
    remap = np.full(vertices.shape[0], -1, np.int64)
    remap[used] = np.arange(used.shape[0])
    out = {
        "vertices": vertices[used],
        "faces": remap[lite_faces].astype(faces.dtype),
        "skin_weights": weights[:, used],
    }
    # unchanged model tables ride along so the schema matches hand_model.npz
    # (the loader rebuilds the fused skin_matrix from weights x vertices)
    for k in src.files:
        if k not in out and k != "skin_matrix":
            out[k] = src[k]
    # Lite-mesh truncation bound (see HandModel.raster_valid_frac): max
    # nondump fraction 53.9% over 131k poses, swept in tests.
    out["raster_valid_frac"] = np.float32(0.70)

    path = args.out or os.path.join(asset_dir, "hand_model_lite.npz")
    np.savez_compressed(path, **out)
    print(f"wrote {path}")

    if args.validate:
        validate(args.validate, path)


def validate(num_poses: int, path: str | None = None) -> None:
    """Full vs lite depth renders (XLA oracle, CPU-safe): IoU + depth error."""
    import jax
    import jax.numpy as jnp

    from spherehand_tpu.data.sampler import sample_poses
    from spherehand_tpu.hand.assets import load_hand_model
    from spherehand_tpu.hand.kinematics import forward_kinematics
    from spherehand_tpu.render.raster import render_depth_64

    full = load_hand_model()
    lite = load_hand_model(path=path) if path else load_hand_model(lite=True)
    params = sample_poses(jax.random.key(123), num_poses)

    def render(model):
        tr = forward_kinematics(model, params)
        return np.asarray(render_depth_64(model, tr, backend="xla"))

    df, dl = render(full), render(lite)
    fg_f, fg_l = df < 99.9, dl < 99.9
    iou = (fg_f & fg_l).sum() / max((fg_f | fg_l).sum(), 1)
    both = fg_f & fg_l
    diff = np.abs(df - dl)[both]
    print(f"validation over {num_poses} poses: coverage IoU {iou:.4f}, "
          f"matched-fg |dz| p50 {np.percentile(diff, 50):.3f} "
          f"p99 {np.percentile(diff, 99):.3f} max {diff.max():.2f}")


if __name__ == "__main__":
    main()
