"""Probe kernel CHUNK sizes for the lite mesh's ~half-size face windows.

The production CHUNK (32 fast / 16 exact) was tuned on the full mesh's
window sizes; the lite mesh halves every window, so smaller chunks may cut
quantization waste. Patches the module constants before trace (they are
read at trace time) and measures like tools/bench_lite.py.

Usage: python tools/probe_lite_chunk.py
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
from spherehand_tpu.render import raster_pallas
from spherehand_tpu.render.raster import render_depth_64

BATCH, ITERS = 1024, 20


def measure(model, exact: bool) -> float:
    @functools.partial(jax.jit, static_argnames=("exact",))
    def render(key, exact):
        params = sample_poses(key, BATCH)
        transforms = forward_kinematics(model, params)
        rand_f = jax.random.uniform(
            jax.random.fold_in(key, 1), (BATCH,), minval=0.9, maxval=1.1
        )
        return render_depth_64(model, transforms, rand_f, exact=exact)

    out = render(jax.random.key(0), exact)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(ITERS):
        out = render(jax.random.key(i + 1), exact)
    jax.block_until_ready(out)
    return BATCH * ITERS / (time.perf_counter() - t0)


def main() -> None:
    model = load_hand_model(lite=True)
    for chunk in (32, 16, 8):
        raster_pallas.CHUNK = chunk
        print(f"lite fast  CHUNK={chunk}: {measure(model, False):,.0f} fps",
              flush=True)
    raster_pallas.CHUNK = 32
    for chunk in (16, 8):
        raster_pallas.CHUNK_EXACT = chunk
        print(f"lite exact CHUNK={chunk}: {measure(model, True):,.0f} fps",
              flush=True)


if __name__ == "__main__":
    main()
