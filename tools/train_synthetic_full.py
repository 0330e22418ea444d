"""Full synthetic pretraining on-device + Orbax checkpoint.

Reproduces the reference's synthetic-init stage (`--mv_projection
--mv_consistency --prior --collision --bone_length` off; engine.py:265-316):
75 epochs x 1000 iterations at batch 128//num_stacks in the reference; here
the step count and batch are arguments and the LR follows the same StepLR
(x0.1 at 1/3 and 2/3 of the run).

Usage: python tools/train_synthetic_full.py [steps=75000] [batch=48] [out=runs/synthetic_full]
"""
from __future__ import annotations

import json
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
    steps_n = int(sys.argv[1]) if len(sys.argv) > 1 else 75_000
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 48
    out_dir = sys.argv[3] if len(sys.argv) > 3 else "runs/synthetic_full"
    bf16 = "bf16" in sys.argv[4:]
    cfg = EngineConfig(synt_batch=batch, num_stacks=1, epoch=75, bf16=bf16)
    hand = load_hand_model()
    steps = build_steps(cfg, hand)
    state = steps.init_state(jax.random.key(0))
    print(f"device: {jax.devices()[0]}, {steps_n} steps @ batch {batch}, bf16={bf16}")

    # K steps per dispatch via lax.scan: one host round trip per K instead of
    # per step. Keys (jax.random.key(i+1)) and the StepLR-thirds values are
    # derived inside the scan exactly as the per-step loop derived them, so
    # the run is bit-identical to K=1.
    K = 100
    while steps_n % K:
        K -= 1

    def k_steps(state, idx):
        def body(st, i):
            tier = (3 * i) // steps_n
            lr = jnp.select(
                [tier == 0, tier == 1],
                [jnp.float32(1e-3), jnp.float32(1e-4)], jnp.float32(1e-5),
            )
            st, metrics = steps.synt_step(st, jax.random.key(i + 1), lr)
            return st, (metrics["loss"], metrics["synt_joint_err"])
        return jax.lax.scan(body, state, idx)

    k_steps = jax.jit(k_steps, donate_argnums=0)

    t0 = time.perf_counter()
    history = []
    log_every = max(1, round(1000 / K))  # chunks between log records
    for start in range(0, steps_n, K):
        state, (losses, errs) = k_steps(
            state, jnp.arange(start, start + K, dtype=jnp.int32)
        )
        last = start + K >= steps_n
        if (start // K) % log_every == 0 or last:
            # log the chunk's LAST step so the final record is the final loss
            step_i = start + K - 1
            lr = 1e-3 * (0.1 ** (3 * step_i // steps_n))
            rec = {
                "step": step_i,
                "loss": float(losses[-1]),
                "synt_joint_err_mm": float(errs[-1]),
                "lr": lr,
            }
            history.append(rec)
            print(f"step {step_i:6d}: loss {rec['loss']:10.2f}  "
                  f"err {rec['synt_joint_err_mm']:6.2f} mm  lr {lr:.1e}",
                  flush=True)
    jax.block_until_ready(state.params)
    dt = time.perf_counter() - t0
    print(f"{steps_n} steps in {dt:.0f}s ({steps_n / dt:.1f} steps/s)")

    import orbax.checkpoint as ocp

    os.makedirs(out_dir, exist_ok=True)
    path = os.path.abspath(os.path.join(out_dir, "model_final"))
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)
    with open(os.path.join(out_dir, "history.json"), "w") as f:
        json.dump(history, f, indent=1)
    print(f"checkpoint: {path}")


if __name__ == "__main__":
    main()
