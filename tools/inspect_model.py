"""Hand-model inspection aids: keypoint order, 3D scatter, synt<->real check.

Compact replacement for the reference's three dev scripts:
- ``mesh/joint_order.py`` (print the keypoint/bone ordering),
- ``mesh/vis_utils.py`` (3D scatter of mesh vertices + bone joints),
- ``mesh/scale_test.py`` (overlay synthesized keypoints on an NYU sample to
  eyeball the 14-point synt<->real correspondence).

Usage:
    python tools/inspect_model.py order            # print keypoint table
    python tools/inspect_model.py scatter          # 3D vertex/joint scatter
    python tools/inspect_model.py align <npy_dir>  # synt vs NYU overlay
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

import jax.numpy as jnp

from spherehand_tpu import constants as C
from spherehand_tpu.hand.assets import load_hand_model
from spherehand_tpu.hand.kinematics import forward_kinematics
from spherehand_tpu.hand.skinning import lbs_keypoints, lbs_mesh

FINGERS = ["index(f1)", "middle(f2)", "ring(f3)", "pinky(f4)", "thumb(f5)"]


def print_order() -> None:
    model = load_hand_model()
    kp_bone = np.asarray(model.kp_bone)
    radii = np.asarray(model.kp_radius)
    print("keypoint -> owning bone (41 spheres; 11 palm + 6 per finger):")
    for k in range(model.num_keypoints):
        bone = int(kp_bone[k])
        label = "palm" if bone < 2 else f"{FINGERS[(bone - 2) // 3]} j{(bone - 2) % 3 + 1}"
        print(f"  kp {k:2d}: bone {bone:2d} ({label}), radius {radii[k]:.1f} mm")
    print("\n14-point synt<->NYU correspondence (constants.py):")
    for s, r in zip(C.SYNT_KEY_POINTS, C.REAL_KEY_POINTS):
        print(f"  synt {s:2d} <-> nyu {r:2d}")


def scatter() -> None:
    import matplotlib.pyplot as plt

    model = load_hand_model()
    transforms = forward_kinematics(model, jnp.zeros((1, 26)))
    verts = np.asarray(lbs_mesh(model, transforms))[0]
    kps = np.asarray(lbs_keypoints(model, transforms))[0]
    fig = plt.figure()
    ax = fig.add_subplot(projection="3d")
    ax.scatter(verts[::5, 0], verts[::5, 1], verts[::5, 2], c="b", s=2)
    ax.scatter(kps[:, 0], kps[:, 1], kps[:, 2], c="r", s=30)
    print(f"vertex z range: {verts[:, 2].min():.1f} .. {verts[:, 2].max():.1f} mm")
    plt.show()


def align(npy_dir: str) -> None:
    import matplotlib.pyplot as plt

    from spherehand_tpu.data.nyu import NyuDataset

    model = load_hand_model()
    ds = NyuDataset(npy_dir)
    dms, joints, _, _ = ds.gather(np.asarray([0]))
    transforms = forward_kinematics(model, jnp.zeros((1, 26)))
    synt_kps = np.asarray(lbs_keypoints(model, transforms))[0]

    fig, axes = plt.subplots(1, 2, figsize=(10, 5))
    size = dms.shape[-1]

    def to_px(pts):
        return pts[:, :2] * size / C.Constants().cube_mm + size / 2

    axes[0].imshow(dms[0, 0])
    real = to_px(joints[0, 0][list(C.REAL_KEY_POINTS)])
    axes[0].scatter(real[:, 0], real[:, 1], c="r")
    axes[0].set_title("NYU GT keypoints (view 0)")
    axes[1].imshow(np.zeros((size, size)))
    synt = to_px(synt_kps[list(C.SYNT_KEY_POINTS)])
    axes[1].scatter(synt[:, 0], synt[:, 1], c="g")
    axes[1].set_title("synthesized keypoints (rest pose)")
    plt.show()


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "order"
    if cmd == "order":
        print_order()
    elif cmd == "scatter":
        scatter()
    elif cmd == "align":
        align(sys.argv[2])
    else:
        raise SystemExit(__doc__)
