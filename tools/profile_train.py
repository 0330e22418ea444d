"""Train-step throughput on the attached device (synt-only and combined).

The reference never measured steps/sec (engine.py prints wall time per 100
iterations only). Reports steps/sec and synthetic-frames/sec for the two
training modes with reference batch geometry (48 synt + 25 real x 3 views).

Usage: python tools/profile_train.py [synt_batch] [real_batch]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from spherehand_tpu.hand.assets import load_hand_model
from spherehand_tpu.train.config import EngineConfig
from spherehand_tpu.train.steps import RealBatch, build_steps


def _fake_real_batch(real_batch: int) -> RealBatch:
    rng = np.random.RandomState(0)
    dms = np.full((real_batch, 3, 64, 64), 100.0, np.float32)
    dms[:, :, 20:44, 20:44] = rng.uniform(20, 60, (real_batch, 3, 24, 24))
    return RealBatch(
        dms=jnp.asarray(dms),
        gt_joints=jnp.asarray(rng.uniform(-80, 80, (real_batch, 3, 36, 3)).astype(np.float32)),
        poses=jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (real_batch, 3, 1, 1))),
        inv_poses=jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (real_batch, 3, 1, 1))),
    )


def measure_combined_steps_per_sec(iters: int = 50, repeats: int = 3,
                                   bf16: bool = False) -> float:
    """Steps/sec of the full combined self-supervised step at the reference
    batch geometry (48 synt + 25 real x 3 views) — bench.py's second metric.

    The ``iters`` steps run under ONE lax.scan dispatch (the engine's
    --steps_per_call path works the same way) and the best of ``repeats``
    dispatches is reported: the measurement environment's per-dispatch
    tunnel latency is volatile, and per-call timing measures the tunnel,
    not the chip. iters=50: at 20 the one ~26-40 ms RTT per dispatch still
    cost the reported rate 15-25% vs the device-trace rate (5.49 ms/step
    bf16 = 182/s device; BENCH_r04 recorded 134.9) — the root of the
    "numbers disagree across artifacts" finding (VERDICT r4). 50 amortizes
    the RTT below ~5%; the separately-traced device rate is the referee.

    bf16=True measures the recommended production training dtype (conv
    compute in bfloat16, params/losses f32 — converges equivalently to f32
    at the 75k-step scale, tests/goldens/lite_mesh_e2e.json)."""
    cfg = EngineConfig(synt_batch=48, real_batch=25, num_stacks=1, bf16=bf16)
    steps = build_steps(cfg, load_hand_model())
    state = steps.init_state(jax.random.key(0))
    batch = _fake_real_batch(25)
    lr = jnp.asarray(1e-3)

    def many(state, key0):
        def body(st, i):
            st, m, _ = steps.combined_step(
                st, jax.random.fold_in(key0, i), lr, batch, jnp.asarray(True)
            )
            return st, m["loss"]
        return jax.lax.scan(body, state, jnp.arange(iters, dtype=jnp.int32))

    many = jax.jit(many, donate_argnums=0)
    state, losses = many(state, jax.random.key(100))
    jax.block_until_ready(losses)
    best = 0.0
    for r in range(repeats):
        t0 = time.perf_counter()
        state, losses = many(state, jax.random.key(101 + r))
        jax.block_until_ready(losses)
        best = max(best, iters / (time.perf_counter() - t0))
    return best


def main():
    synt_batch = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    real_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    bf16 = "bf16" in sys.argv[3:]
    cfg = EngineConfig(
        synt_batch=synt_batch, real_batch=real_batch, num_stacks=1, bf16=bf16
    )
    hand = load_hand_model()
    steps = build_steps(cfg, hand)
    state = steps.init_state(jax.random.key(0))
    print(f"device: {jax.devices()[0]}, synt={synt_batch}, real={real_batch}x3, bf16={bf16}")

    batch = _fake_real_batch(real_batch)
    lr = jnp.asarray(1e-3)

    synt_step = jax.jit(steps.synt_step, donate_argnums=0)
    state, m = synt_step(state, jax.random.key(1), lr)
    jax.block_until_ready(m["loss"])
    iters = 20
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = synt_step(state, jax.random.key(i + 2), lr)
    jax.block_until_ready(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    print(f"synt_step:     {dt * 1e3:8.2f} ms/step  "
          f"({synt_batch / dt:8.1f} synthetic frames/sec)")

    combined = jax.jit(steps.combined_step, donate_argnums=0)
    state, m, _ = combined(state, jax.random.key(100), lr, batch, jnp.asarray(True))
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for i in range(iters):
        state, m, _ = combined(
            state, jax.random.key(i + 101), lr, batch, jnp.asarray(True)
        )
    jax.block_until_ready(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    print(f"combined_step: {dt * 1e3:8.2f} ms/step  ({1 / dt:8.2f} steps/sec)")


if __name__ == "__main__":
    main()
