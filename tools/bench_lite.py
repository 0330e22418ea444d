"""Render-throughput comparison: full vs lite hand mesh (one TPU chip).

Same measurement as bench.py (sample -> FK -> LBS -> project -> rasterize ->
2x2 mean, B=1024), run for both meshes and both raster modes. The lite mesh
(tools/make_lite_mesh.py) halves the face count, which shrinks the
comparator-bound sort and the kernel windows together.

Usage: python tools/bench_lite.py [batch]
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from spherehand_tpu.data.sampler import sample_poses
from spherehand_tpu.hand.assets import load_hand_model
from spherehand_tpu.hand.kinematics import forward_kinematics
from spherehand_tpu.render.raster import render_depth_64


def main() -> None:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    iters = 20
    for lite in (False, True):
        model = load_hand_model(lite=lite)

        @functools.partial(jax.jit, static_argnames=("exact",))
        def render(key, exact, model=model):
            params = sample_poses(key, batch)
            transforms = forward_kinematics(model, params)
            rand_f = jax.random.uniform(
                jax.random.fold_in(key, 1), (batch,), minval=0.9, maxval=1.1
            )
            return render_depth_64(model, transforms, rand_f, exact=exact)

        for exact in (False, True):
            t0 = time.perf_counter()
            out = render(jax.random.key(0), exact)
            jax.block_until_ready(out)
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            for i in range(iters):
                out = render(jax.random.key(i + 1), exact)
            jax.block_until_ready(out)
            fps = batch * iters / (time.perf_counter() - t0)
            name = "lite" if lite else "full"
            mode = "exact" if exact else "fast"
            print(f"{name} {mode}: {fps:,.0f} fps  (compile {compile_s:.0f}s)",
                  flush=True)


if __name__ == "__main__":
    main()
