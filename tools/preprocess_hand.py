"""Regenerate the hand-model asset from the raw Blender export.

Re-design of the reference's ``mesh/preprocess.py:1-226``: scale the raw mesh
to mm (x58, z flipped), center it, merge the 4 extra palm bones into the
metacarpals (21 -> 17 bones), attach the 41 sphere keypoints (offsets in
bone-local units x58, radii x80), and emit our ``hand_model.npz`` (and
optionally a reference-compatible ``preprocessed_hand.pkl``).

Usage:
    python tools/preprocess_hand.py --raw /root/reference/mesh/model/hand.pkl \
        --out assets/hand_model.npz [--pkl-out preprocessed_hand.pkl]
"""
from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SCALE = 58.0  # Blender units -> mm (reference mesh/preprocess.py:5)
RADIUS_SCALE = 80.0  # keypoint radius multiplier (preprocess.py:211)

# 41 sphere keypoints: bone-local offset (Blender units), owning bone name,
# radius (Blender units). Physical model constants (preprocess.py:70-197).
KEYPOINT_TABLE = [
    # (offset xyz, bone, radius)
    ([-0.1355, -0.00849999, -0.2875], "finger1joint3", 0.100),
    ([0.002, 0.007, -0.1205], "finger1joint3", 0.120),
    ([-0.13, 0.0305, -0.1975], "finger1joint2", 0.140),
    ([0.0295, 0.00149996, -0.0615], "finger1joint2", 0.160),
    ([-0.3195, 0.0315, -0.211], "finger1joint1", 0.170),
    ([0.0115, -0.0235, -0.1275], "finger1joint1", 0.210),
    ([-0.2615, -0.1135, -0.3965], "finger2joint3", 0.120),
    ([-0.126, -0.0245, -0.131], "finger2joint3", 0.140),
    ([-0.144, -0.00450001, -0.0855], "finger2joint2", 0.170),
    ([0.0705, 0.00400001, 0.03], "finger2joint2", 0.180),
    ([-0.3505, -0.0275, -0.281], "finger2joint1", 0.190),
    ([-0.002, -0.0635, -0.1945], "finger2joint1", 0.200),
    ([-0.157, -0.0285, -0.279], "finger3joint3", 0.150),
    ([-0.0195, 0.0375, 0.001], "finger3joint3", 0.170),
    ([-0.1665, 0.022, -0.205], "finger3joint2", 0.180),
    ([0.029, 0.0545, -0.0535], "finger3joint2", 0.200),
    ([-0.419, 0.0565, -0.044], "finger3joint1", 0.200),
    ([-0.0095, 0.0005, 0.0085], "finger3joint1", 0.210),
    ([-0.343, 0.012, -0.3445], "finger4joint3", 0.140),
    ([-0.144, 0.0295, -0.189], "finger4joint3", 0.160),
    ([-0.2485, 0.008, -0.172], "finger4joint2", 0.170),
    ([0.0, 0.0335, -0.0125], "finger4joint2", 0.180),
    ([-0.5595, -0.035, -0.0315], "finger4joint1", 0.200),
    ([-0.0325, -0.0405, 0.0], "finger4joint1", 0.210),
    ([-0.432, 0.0775, -0.104], "finger5joint3", 0.170),
    ([-0.066, 0.0950001, -0.038], "finger5joint3", 0.190),
    ([-0.341, 0.017, 0.0175], "finger5joint2", 0.200),
    ([-0.0335, 0.0585, 0.044], "finger5joint2", 0.250),
    ([-0.4485, -0.343, -0.115], "finger5joint1", 0.280),
    ([0.0, 0.0, 0.0], "finger5joint1", 0.280),
    ([-0.1, 0.305, -0.064], "metacarpals", 0.250),
    ([-0.1, -0.305, -0.064], "metacarpals", 0.250),
    ([-1.467, 0.0, 0.0], "metacarpals", 0.280),
    ([-1.307, 0.4095, -0.2], "metacarpals", 0.280),
    ([-0.986, 0.0, 0.0], "metacarpals", 0.300),
    ([0.0, 0.0, 0.0], "metacarpals", 0.280),
    ([-0.4, 0.0, 0.0], "metacarpals", 0.250),
    ([-0.4, 0.20, -0.1], "metacarpals", 0.250),
    ([-0.8, 0.30, -0.1], "metacarpals", 0.250),
    ([-1.307, -0.305, -0.06], "metacarpals", 0.250),
    ([-0.956, -0.305, -0.05], "metacarpals", 0.250),
]


def scale_and_center(mesh: dict) -> np.ndarray:
    """Scale vertices x58 / flip z / center; rewrite offset matrices to match.

    An offset matrix maps world -> bone-local at rest; its inverse carries the
    bone's rest placement, whose translation is scaled/flipped/centered like
    the vertices (preprocess.py:8-35, fused into one pass here).
    """
    verts = np.asarray(mesh["vertices"], np.float64) * SCALE
    verts[:, 2] *= -1.0
    center = verts.mean(axis=0)
    verts -= center
    for bone in mesh["bones"]:
        placement = np.linalg.inv(np.asarray(bone["offset_matrix"], np.float64))
        placement[0, 3] *= SCALE
        placement[1, 3] *= SCALE
        placement[2, 3] *= -SCALE
        placement[0:3, 3] -= center
        bone["offset_matrix"] = np.linalg.inv(placement)
    mesh["vertices"] = verts
    return center


def merge_palm_bones(bones: list) -> list:
    """Swap bones 0/1 (metacarpals first) and fold the last 4 palm helper
    bones' skinning weights into the metacarpals (preprocess.py:45-66)."""
    bones[0], bones[1] = bones[1], bones[0]
    root = bones[0]
    weights = dict(zip(root["weight_vertexid"], root["weight_coeff"]))
    for _ in range(4):
        extra = bones.pop()
        for w, vid in zip(extra["weight_coeff"], extra["weight_vertexid"]):
            weights[vid] = weights.get(vid, 0.0) + w
    root["weight_vertexid"] = np.asarray(list(weights.keys()), np.int64)
    root["weight_coeff"] = np.asarray(list(weights.values()), np.float64)
    return bones


def attach_keypoints(bones: list) -> None:
    """Place the 41 spheres in world rest coordinates on their owning bones
    (preprocess.py:199-214)."""
    by_name = {bone["name"]: bone for bone in bones}
    for offset, name, radius in KEYPOINT_TABLE:
        bone = by_name[name]
        bone.setdefault("keypoint", [])
        rest = np.linalg.inv(np.asarray(bone["offset_matrix"], np.float64))
        local = np.asarray(offset, np.float64) * SCALE
        local[2] *= -1.0
        bone["keypoint"].append((rest[0:3, 3] + local, radius * RADIUS_SCALE))


def preprocess(raw_path: str) -> dict:
    with open(raw_path, "rb") as f:
        mesh = pickle.load(f, encoding="latin1")
    scale_and_center(mesh)
    mesh["bones"] = merge_palm_bones(mesh["bones"])
    attach_keypoints(mesh["bones"])
    verts = mesh["vertices"]
    mesh["vertices"] = np.hstack([verts, np.ones((verts.shape[0], 1))])
    return mesh


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--raw", default="/root/reference/mesh/model/hand.pkl")
    parser.add_argument("--out", default="assets/hand_model.npz")
    parser.add_argument("--pkl-out", default=None,
                        help="also write a reference-compatible pickle")
    args = parser.parse_args()

    mesh = preprocess(args.raw)
    if args.pkl_out:
        with open(args.pkl_out, "wb") as f:
            pickle.dump(mesh, f, protocol=pickle.HIGHEST_PROTOCOL)

    from convert_assets import convert_hand_model

    np.savez_compressed(args.out, **convert_hand_model(mesh))
    print(f"wrote {args.out}: {len(mesh['bones'])} bones, "
          f"{mesh['vertices'].shape[0]} verts")


if __name__ == "__main__":
    main()
