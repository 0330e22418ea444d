"""Short on-device synthetic pretraining run — end-to-end learning proof.

Runs N synthetic-supervision steps (the reference's `_epoch_with_synt` path,
engine.py:265-316) on the attached device and reports the loss and synthetic
joint-error trajectory. With no NYU data or released checkpoints available in
this environment, this is the strongest executable evidence that the whole
pipeline (sampler -> FK -> rasterizer -> CNN -> losses -> optimizer) learns.

Usage: python tools/train_synthetic_demo.py [steps] [batch]
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

from spherehand_tpu.hand.assets import load_hand_model
from spherehand_tpu.train.config import EngineConfig
from spherehand_tpu.train.steps import build_steps


def main():
    steps_n = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 48
    cfg = EngineConfig(synt_batch=batch, num_stacks=1)
    hand = load_hand_model()
    steps = build_steps(cfg, hand)
    state = steps.init_state(jax.random.key(0))
    step = jax.jit(steps.synt_step, donate_argnums=0)
    lr = jnp.asarray(1e-3)
    print(f"device: {jax.devices()[0]}, {steps_n} steps @ batch {batch}")

    t0 = time.perf_counter()
    first_err = None
    for i in range(steps_n):
        state, metrics = step(state, jax.random.key(i + 1), lr)
        if i % 50 == 0 or i == steps_n - 1:
            loss = float(metrics["loss"])
            err = float(metrics["synt_joint_err"])
            if first_err is None:
                first_err = err
            print(f"step {i:4d}: loss {loss:12.2f}  synt_joint_err {err:7.2f} mm")
    jax.block_until_ready(state.params)
    dt = time.perf_counter() - t0
    final_err = float(metrics["synt_joint_err"])
    print(f"\n{steps_n} steps in {dt:.1f}s ({steps_n / dt:.2f} steps/s)")
    print(f"synthetic joint error: {first_err:.2f} -> {final_err:.2f} mm")
    assert final_err < first_err * 0.8, "no learning progress!"
    print("LEARNING OK")


if __name__ == "__main__":
    main()
