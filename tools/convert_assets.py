"""Convert reference model assets (pickles / torch checkpoints) into framework-native .npz files.

The reference ships its hand model as a Python pickle of numpy arrays plus
per-bone dicts (see /root/reference/mesh/preprocess.py:217-226 for the writer)
and its frozen prior networks as torch ``.pth`` state dicts
(/root/reference/network/pose_vae.py:19-23, /root/reference/network/pose_denoiser.py:39-43).
This tool flattens those into plain ``.npz`` archives so the TPU framework has
zero pickle/torch dependencies at runtime.

Outputs (written to ``assets/``):
  hand_model.npz      — mesh vertices/faces, bone offset matrices, dense skinning
                        weights, sphere keypoints (local offset, owning bone, radius)
  pose_prior_pca.npz  — PCA mean + components (reference mesh/model/pose_prior.pkl)
  pose_vae.npz        — VAE weights, flattened key->array
  pose_denoiser.npz   — denoiser MLP weights

Usage:  python tools/convert_assets.py [--reference /root/reference] [--out assets/]
"""
from __future__ import annotations

import argparse
import os
import pickle

import numpy as np


def convert_hand_model(mesh: dict) -> dict:
    """Flatten the preprocessed hand pickle into dense arrays.

    Pickle layout (reference mesh/preprocess.py:217-226): dict with
      vertices (V,4) float64 homogeneous, faces (F,3) int32,
      bones: list of 17 dicts {name, offset_matrix (4,4), weight_coeff,
      weight_vertexid, keypoint: [(xyz, radius), ...]}.
    """
    vertices = np.asarray(mesh["vertices"], np.float32)
    faces = np.asarray(mesh["faces"], np.int32)
    bones = mesh["bones"]
    num_bones = len(bones)
    num_verts = vertices.shape[0]

    offset_mats = np.stack(
        [np.asarray(b["offset_matrix"], np.float32) for b in bones], axis=0
    )
    bone_names = np.asarray([b["name"] for b in bones])

    # Dense skinning weight matrix (num_bones, V). The pickle stores sparse
    # per-bone (coeff, vertex_id) lists; most vertices have <=4 influences.
    skin_weights = np.zeros((num_bones, num_verts), np.float32)
    for j, b in enumerate(bones):
        coeffs = np.asarray(b["weight_coeff"], np.float32)
        vids = np.asarray(b["weight_vertexid"], np.int64)
        skin_weights[j, vids] = coeffs

    # Sphere keypoints: 41 total, each owned by exactly one bone, stored in
    # bone order (metacarpals first: indices 0-10, then 2 per finger joint).
    kp_local, kp_bone, kp_radius = [], [], []
    for j, b in enumerate(bones):
        for pt, radius in b.get("keypoint", []):
            kp_local.append([pt[0], pt[1], pt[2], 1.0])
            kp_bone.append(j)
            kp_radius.append(radius)
    return dict(
        vertices=vertices,
        faces=faces,
        offset_mats=offset_mats,
        bone_names=bone_names,
        skin_weights=skin_weights,
        kp_local=np.asarray(kp_local, np.float32),
        kp_bone=np.asarray(kp_bone, np.int32),
        kp_radius=np.asarray(kp_radius, np.float32),
        # Rasterizer truncation bound (see HandModel.raster_valid_frac):
        # max nondump fraction 48.8% over 1,024,000 sampler poses incl.
        # RandScale + focal jitter (tests/test_raster_pallas.py sweeps it).
        raster_valid_frac=np.float32(0.62),
    )


def convert_torch_state_dict(path: str) -> dict:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["network_state_dict"] if "network_state_dict" in ckpt else ckpt
    out = {}
    for k, v in sd.items():
        out[k.replace(".", "/")] = np.asarray(v.detach().cpu().numpy())
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--out", default=os.path.join(os.path.dirname(__file__), "..", "assets"))
    args = ap.parse_args()
    model_dir = os.path.join(args.reference, "mesh", "model")
    os.makedirs(args.out, exist_ok=True)

    with open(os.path.join(model_dir, "preprocessed_hand.pkl"), "rb") as f:
        mesh = pickle.load(f)
    np.savez_compressed(os.path.join(args.out, "hand_model.npz"), **convert_hand_model(mesh))
    print("wrote hand_model.npz")

    with open(os.path.join(model_dir, "pose_prior.pkl"), "rb") as f:
        pca = pickle.load(f)
    np.savez_compressed(
        os.path.join(args.out, "pose_prior_pca.npz"),
        mean=np.asarray(pca["mean"], np.float32),
        components=np.asarray(pca["components"], np.float32),
    )
    print("wrote pose_prior_pca.npz")

    for name in ("pose_vae", "pose_denoiser"):
        src = os.path.join(model_dir, name + ".pth")
        np.savez_compressed(os.path.join(args.out, name + ".npz"), **convert_torch_state_dict(src))
        print(f"wrote {name}.npz")


if __name__ == "__main__":
    main()
