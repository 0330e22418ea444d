"""Profile the cached production render with jax.profiler (no recompiles).

Remote TPU compiles take ~25 min in this environment, so component-level
re-jitting is impractical; instead this traces the already-compiled
``render_depth_64`` program (same shapes as bench.py) and the trace breaks
the time into fusions / sort / gather / Pallas kernel.

Usage: python tools/trace_render.py [batch] [outdir] [exact] [lite]
"""
from __future__ import annotations

import glob
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


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/jaxtrace"
    exact = len(sys.argv) > 3 and sys.argv[3] not in ("0", "false", "fast")
    lite = len(sys.argv) > 4 and sys.argv[4] == "lite"
    model = load_hand_model(lite=lite)

    @jax.jit
    def render(key):
        params = sample_poses(key, batch)
        transforms = forward_kinematics(model, params)
        rand_f = jax.random.uniform(
            jax.random.fold_in(key, 1), (batch,), minval=0.9, maxval=1.1
        )
        return render_depth_64(model, transforms, rand_f, exact=exact)

    out = render(jax.random.key(0))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    iters = 10
    for i in range(iters):
        out = render(jax.random.key(i))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"per-render: {dt * 1e3:.2f} ms  ({batch / dt:.0f} frames/sec)")

    with jax.profiler.trace(outdir):
        for i in range(3):
            out = render(jax.random.key(100 + i))
        jax.block_until_ready(out)
    print("trace files:")
    for f in glob.glob(outdir + "/**/*", recursive=True):
        if os.path.isfile(f):
            print(" ", f, os.path.getsize(f))


if __name__ == "__main__":
    main()
