"""End-to-end quality gate for the lite mesh: train on lite, eval on full.

The lite mesh's purpose is synthetic training-data generation, so the
decisive quality metric is not per-pixel render fidelity but whether an
estimator trained on lite renders matches one trained on full renders when
BOTH are evaluated on full-mesh held-out renders (the "real" distribution
stand-in). Run both arms and compare.

Usage: python tools/lite_mesh_e2e.py [--steps N] [--arms lite,full]
                                     [--artifact PATH]

The committed golden (tests/goldens/lite_mesh_e2e.json) is the 75k-step
convergence artifact; --artifact defaults to runs/lite_mesh_e2e.json and the
tool refuses to overwrite the golden with a shorter run.
"""
from __future__ import annotations

import argparse
import json
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

from spherehand_tpu.data.sampler import sample_poses
from spherehand_tpu.data.synthesizer import synthesize
from spherehand_tpu.hand.assets import load_hand_model
from spherehand_tpu.models.estimator import forward, make_network
from spherehand_tpu.train.config import EngineConfig
from spherehand_tpu.train.steps import build_steps


def train_arm(mesh: str, steps_n: int, bf16: bool = False):
    """Train `steps_n` synthetic steps on the given mesh; return params.

    100 steps are scanned per dispatch with the key chain
    (``jax.random.key(i + 1)``) and StepLR-thirds values derived inside the
    scan exactly as the former per-step loop derived them — bit-identical
    training, but the wall time no longer measures the tunnel's volatile
    per-dispatch latency (CLAUDE.md), which once recorded lite as "2x slower
    to train" purely from a degraded-dispatch window.
    """
    cfg = EngineConfig(num_stacks=1, mesh=mesh, bf16=bf16)
    hand = load_hand_model(lite=mesh == "lite")
    steps = build_steps(cfg, hand)
    state = steps.init_state(jax.random.key(0))

    K = 100
    while steps_n % K:
        K -= 1

    def k_steps(state, idx):
        def body(st, i):
            lr = jnp.where(i < steps_n // 3, jnp.float32(1e-3),
                           jnp.where(i < (2 * steps_n) // 3, jnp.float32(1e-4),
                                     jnp.float32(1e-5)))
            st, metrics = steps.synt_step(st, jax.random.key(i + 1), lr)
            return st, None
        st, _ = jax.lax.scan(body, state, idx)
        return st

    k_steps = jax.jit(k_steps, donate_argnums=0)
    t0 = time.perf_counter()
    for start in range(0, steps_n, K):
        state = k_steps(state, jnp.arange(start, start + K, dtype=jnp.int32))
    jax.block_until_ready(state.params)
    dt = time.perf_counter() - t0
    print(f"[{mesh}] {steps_n} steps in {dt:.0f}s ({steps_n / dt:.1f} steps/s)",
          flush=True)
    return state.params, dt


def eval_on_full(params, num_samples: int = 2048, batch: int = 128) -> float:
    """Mean joint error (mm) on held-out FULL-mesh noisy renders."""
    hand = load_hand_model()  # always the full mesh
    network = make_network(1)

    @jax.jit
    def eval_batch(params, key):
        poses = sample_poses(key, batch)
        synt = synthesize(hand, jax.random.fold_in(key, 1), poses, add_noise=True)
        out = forward(network, params, synt_dms=synt.dms)
        return jnp.linalg.norm(out.synt_xyz[-1] - synt.xyz, axis=-1)

    errs = []
    for i in range(num_samples // batch):
        errs.append(np.asarray(eval_batch(params, jax.random.key(10_000 + i))))
    return float(np.concatenate(errs).mean())


GOLDEN = os.path.abspath(os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..",
    "tests", "goldens", "lite_mesh_e2e.json"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10_000)
    ap.add_argument("--arms", default="lite,full")
    ap.add_argument("--artifact", default=os.path.join("runs", "lite_mesh_e2e.json"),
                    help="output path; pass the tests/goldens path explicitly "
                         "(only accepted for runs >= 50k steps) to refresh "
                         "the committed convergence golden")
    args = ap.parse_args()
    steps_n = args.steps
    arms = args.arms.split(",")
    art = os.path.abspath(args.artifact)
    if art == GOLDEN and steps_n < 50_000:
        sys.exit("refusing to overwrite the 75k-step convergence golden with "
                 f"a {steps_n}-step run; use --artifact elsewhere")
    result = {"steps": steps_n}
    for arm in arms:
        # Arm syntax: "lite", "full", or "<mesh>_bf16" (bf16 conv compute —
        # the convergence A/B for the recommended training dtype).
        mesh, _, suffix = arm.partition("_")
        bf16 = suffix == "bf16"
        params, dt = train_arm(mesh, steps_n, bf16=bf16)
        err = eval_on_full(params, num_samples=2048)
        print(f"[{arm}] held-out joint error on FULL-mesh renders: {err:.2f} mm",
              flush=True)
        result[arm] = {"train_secs": round(dt, 1), "heldout_mm": round(err, 3)}
    os.makedirs(os.path.dirname(art), exist_ok=True)
    with open(art, "w") as f:
        json.dump(result, f, indent=1)
    print("wrote", art)


if __name__ == "__main__":
    main()
