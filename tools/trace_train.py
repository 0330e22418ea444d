"""jax.profiler trace of the combined train step (cached program).

Same setup as tools/profile_train.measure_combined_steps_per_sec; traces a
few iterations so tools/parse_trace.py can split device time per op.

Usage: python tools/trace_train.py [outdir=/tmp/tr_train] [bf16]
"""
from __future__ import annotations

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

from profile_train import _fake_real_batch

from spherehand_tpu.hand.assets import load_hand_model
from spherehand_tpu.train.config import EngineConfig
from spherehand_tpu.train.steps import build_steps


def main() -> None:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tr_train"
    bf16 = "bf16" in sys.argv[2:]
    cfg = EngineConfig(synt_batch=48, real_batch=25, num_stacks=1, bf16=bf16)
    steps = build_steps(cfg, load_hand_model())
    state = steps.init_state(jax.random.key(0))
    batch = _fake_real_batch(25)
    lr = jnp.asarray(1e-3)
    combined = jax.jit(steps.combined_step, donate_argnums=0)
    state, m, _ = combined(state, jax.random.key(100), lr, batch, jnp.asarray(True))
    jax.block_until_ready(m["loss"])

    t0 = time.perf_counter()
    iters = 20
    for i in range(iters):
        state, m, _ = combined(
            state, jax.random.key(i + 101), lr, batch, jnp.asarray(True)
        )
    jax.block_until_ready(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    print(f"combined step: {dt * 1e3:.2f} ms ({1 / dt:.1f} steps/s)")

    with jax.profiler.trace(outdir):
        for i in range(3):
            state, m, _ = combined(
                state, jax.random.key(i + 200), lr, batch, jnp.asarray(True)
            )
        jax.block_until_ready(m["loss"])
    print("trace written to", outdir)


if __name__ == "__main__":
    main()
