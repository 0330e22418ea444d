"""Measure the pack4 (4-column packed sort) lever on the full mesh, on-chip.

Compares production fast mode (5-column packed sort) against the
``_diag_pack4`` 4-column scheme at B=1024, plus the accuracy delta of the
coarser quantization (1/8 px, 1/4 mm) against the 16-bit production
renders on the same poses.

Usage: python tools/probe_pack4.py [batch]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax.numpy as jnp

from bench_lite import measure_render_fps

from spherehand_tpu.data.sampler import sample_poses
from spherehand_tpu.hand.assets import load_hand_model
from spherehand_tpu.hand.kinematics import forward_kinematics
from spherehand_tpu.render.raster import render_depth_64


def main() -> None:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    full = load_hand_model()

    # Accuracy: pack16 vs pack4 production pooled renders on the same poses.
    key = jax.random.key(123)
    params = sample_poses(key, 64)
    tr = forward_kinematics(full, params)
    rf = jnp.ones((64,))
    base = np.asarray(render_depth_64(full, tr, rf, exact=False))
    p4 = np.asarray(
        render_depth_64(
            full, tr, rf, exact=False, _diag=(("_diag_pack4", True),)
        )
    )
    fg = (base < 99.9) & (p4 < 99.9)
    diff = np.abs(base - p4)[fg]
    print(
        "accuracy vs pack16 pooled: median",
        float(np.median(diff)),
        "p99",
        float(np.percentile(diff, 99)),
        "fg_iou",
        float(fg.sum() / max(((base < 99.9) | (p4 < 99.9)).sum(), 1)),
    )

    for name, diag in (
        ("pack16-5col", ()),
        ("pack4-4col", (("_diag_pack4", True),)),
    ):
        fps = measure_render_fps(full, batch, exact=False, diag=diag)
        print(f"full fast {name}: {fps:.0f} fps")


if __name__ == "__main__":
    main()
