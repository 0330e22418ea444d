"""Interactive hand-model viewer: pose sliders -> live sphere + mesh renders.

Re-design of the reference's ``mesh/interactive_viewer.py:13-80``: matplotlib
sliders over the 26 pose parameters (+ global scale), re-rendering the sphere
primitive depth map and the triangle-raster depth map side by side on every
change. Runs on CPU or TPU (the render functions are jitted once).

Usage:  python tools/interactive_viewer.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

import jax
import jax.numpy as jnp

from spherehand_tpu.hand.assets import load_hand_model
from spherehand_tpu.hand.kinematics import forward_kinematics
from spherehand_tpu.hand.skinning import lbs_keypoints
from spherehand_tpu.render.raster import render_depth_64
from spherehand_tpu.render.sphere import render_sphere_hand

PARAM_NAMES = (
    ["palm_rx", "palm_ry", "palm_rz", "palm_tx", "palm_ty", "palm_tz"]
    + [
        f"{finger}_{dof}"
        for finger in ["index", "middle", "ring", "pinky", "thumb"]
        for dof in ["abduct", "flex1", "flex2", "flex3"]
    ]
)


def main() -> None:
    import matplotlib.pyplot as plt
    from matplotlib.widgets import Slider

    model = load_hand_model()

    @jax.jit
    def render(params):
        transforms = forward_kinematics(model, params[None])
        centers = lbs_keypoints(model, transforms)[..., :3]
        _, sphere_dm = render_sphere_hand(centers, model.kp_radius, 64)
        mesh_dm = render_depth_64(model, transforms)
        return sphere_dm[0], mesh_dm[0]

    params = np.zeros(26, np.float32)
    sphere_dm, mesh_dm = map(np.asarray, render(jnp.asarray(params)))

    fig = plt.figure(figsize=(10, 12))
    ax_sphere = fig.add_axes([0.08, 0.55, 0.4, 0.4])
    ax_mesh = fig.add_axes([0.55, 0.55, 0.4, 0.4])
    ax_sphere.set_title("sphere primitives")
    ax_mesh.set_title("triangle raster")
    im_sphere = ax_sphere.imshow(sphere_dm, vmin=-100, vmax=100, cmap="gray")
    im_mesh = ax_mesh.imshow(mesh_dm, vmin=-100, vmax=100, cmap="gray")

    sliders = []
    for i, name in enumerate(PARAM_NAMES):
        ax = fig.add_axes([0.15, 0.5 - i * 0.018, 0.55, 0.012])
        lo, hi = (-40, 40) if 3 <= i < 6 else (-3.2, 3.2)
        sliders.append(Slider(ax, name, lo, hi, valinit=0.0))

    def update(_):
        p = np.asarray([s.val for s in sliders], np.float32)
        s_dm, m_dm = map(np.asarray, render(jnp.asarray(p)))
        im_sphere.set_data(s_dm)
        im_mesh.set_data(m_dm)
        fig.canvas.draw_idle()

    for s in sliders:
        s.on_changed(update)
    plt.show()


if __name__ == "__main__":
    main()
