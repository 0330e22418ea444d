"""Headline benchmark: synthetic depth-render throughput on one chip.

Measures the full synthesis path the training loop uses — FK -> LBS ->
orthographic projection -> triangle z-buffer rasterization -> 64x64 depth
maps — in frames/sec on the default JAX device. The reference never measured
this (its render bench is commented out, mesh/render.py:341-372); the
driver's north-star target is 50k frames/sec/chip (BASELINE.md).

Reports BOTH raster modes: ``value`` is the production fast mode (half-plane
coverage — identical depths, boundary pixels may differ from the CUDA span
rules), ``exact_fps`` is the CUDA-parity scanline-exact mode.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "exact_fps",
"batch"}.
"""
from __future__ import annotations

import json
import os
import time

TARGET_FPS = 50_000.0
BATCH = 1024
ITERS = 20


def main() -> None:
    import jax

    # Persistent compilation cache: the Pallas kernel's first compile through
    # the TPU tunnel is minutes; subsequent runs are seconds.
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import functools

    import jax.numpy as jnp

    from spherehand_tpu.data.sampler import sample_poses
    from spherehand_tpu.hand.assets import load_hand_model
    from spherehand_tpu.hand.kinematics import forward_kinematics
    from spherehand_tpu.render.raster import render_depth_64

    model = load_hand_model()

    @functools.partial(jax.jit, static_argnames=("exact",))
    def render(key, exact):
        params = sample_poses(key, BATCH)
        transforms = forward_kinematics(model, params)
        rand_f = jax.random.uniform(
            jax.random.fold_in(key, 1), (BATCH,), minval=0.9, maxval=1.1
        )
        return render_depth_64(model, transforms, rand_f, exact=exact)

    def measure(exact: bool) -> float:
        out = render(jax.random.key(0), exact)
        jax.block_until_ready(out)  # compile/warmup
        t0 = time.perf_counter()
        for i in range(ITERS):
            out = render(jax.random.key(i + 1), exact)
        jax.block_until_ready(out)
        return BATCH * ITERS / (time.perf_counter() - t0)

    fast_fps = measure(exact=False)
    exact_fps = measure(exact=True)

    # Secondary metric: the full self-supervised combined training step
    # (48 synthetic + 25 real x 3 views, 9-term loss, fwd+bwd+Adam, one
    # jitted program — reference logs imply single-digit steps/sec on GPU).
    from tools.profile_train import measure_combined_steps_per_sec

    train_sps = measure_combined_steps_per_sec()

    print(
        json.dumps(
            {
                "metric": "depth_render_throughput",
                "value": round(float(fast_fps), 2),
                "unit": "frames/sec",
                "vs_baseline": round(float(fast_fps) / TARGET_FPS, 4),
                "exact_fps": round(float(exact_fps), 2),
                "train_combined_steps_per_sec": round(float(train_sps), 2),
                "batch": BATCH,
            }
        )
    )


if __name__ == "__main__":
    main()
