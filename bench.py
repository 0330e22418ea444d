"""Headline benchmark: synthetic depth-render throughput on one chip.

Measures the full synthesis path the training loop uses — FK -> LBS ->
orthographic projection -> triangle z-buffer rasterization -> 64x64 depth
maps — in frames/sec on the default JAX device. The reference never measured
this (its render bench is commented out, mesh/render.py:341-372); the
driver's north-star target is 50k frames/sec/chip (BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np

TARGET_FPS = 50_000.0


def main() -> None:
    import jax

    # Persistent compilation cache: the Pallas kernel's first compile through
    # the TPU tunnel is minutes; subsequent runs are seconds.
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from spherehand_tpu.data.sampler import sample_poses
    from spherehand_tpu.hand.assets import load_hand_model
    from spherehand_tpu.hand.kinematics import forward_kinematics
    from spherehand_tpu.render.raster import render_depth_64

    model = load_hand_model()
    batch = 128

    @jax.jit
    def render(key):
        params = sample_poses(key, batch)
        transforms = forward_kinematics(model, params)
        rand_f = jax.random.uniform(jax.random.fold_in(key, 1), (batch,), minval=0.9, maxval=1.1)
        return render_depth_64(model, transforms, rand_f)

    # Warmup / compile.
    out = render(jax.random.key(0))
    jax.block_until_ready(out)

    iters = 20
    t0 = time.perf_counter()
    for i in range(iters):
        out = render(jax.random.key(i + 1))
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    fps = batch * iters / dt

    print(
        json.dumps(
            {
                "metric": "depth_render_throughput",
                "value": round(float(fps), 2),
                "unit": "frames/sec",
                "vs_baseline": round(float(fps) / TARGET_FPS, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
