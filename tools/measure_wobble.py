"""Measure the eval-numerics batch-composition wobble, default vs parity mode.

TPU's default f32 convs run bf16 passes; XLA compiles different layouts for
different batch sizes, so the SAME crop produces different joints depending
on which program processed it — measured up to ~5 mm on ambiguous samples
(infer.py). That swamps the 0.5 mm NYU parity bar, which is why
`tools/parity_eval.py` pins ``eval_precision="highest"`` (true-f32 passes).

This tool quantifies both modes on-chip: it renders 1024 synthetic crops,
computes per-sample joints through a monolithic B=1024 program and through
8 separate B=128 programs, and reports the per-sample |Δ| (mm) plus the
DEVICE cost of the parity mode: forwards are timed under one lax.scan
dispatch (best of 3) at B=128 and B=1024, so the number is chip time, not
the volatile per-dispatch tunnel latency that poisoned the round-4 capture
(387 ms for a forward the serving bench runs in ~1 ms — that measurement
timed the tunnel; see CLAUDE.md dispatch-weather notes). Writes the artifact
``tests/goldens/precision_wobble.json`` (asserted by
tests/test_precision_artifact.py) when run with --artifact.

Reference semantics at stake: eval is network/engine.py:203-207 — a
deterministic function of the crop; the parity mode restores that on TPU.

Usage (TPU): python tools/measure_wobble.py [--artifact]
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

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

BIG = 1024
SMALL = 128


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--artifact", action="store_true",
                    help="write tests/goldens/precision_wobble.json")
    ap.add_argument("--iters", type=int, default=20,
                    help="timing iterations per mode")
    args = ap.parse_args()

    from spherehand_tpu.constants import Constants
    from spherehand_tpu.data.sampler import sample_poses
    from spherehand_tpu.data.synthesizer import synthesize
    from spherehand_tpu.hand.assets import load_hand_model
    from spherehand_tpu.infer import load_params_npz
    from spherehand_tpu.models.estimator import forward, make_network

    _C = Constants()
    hand = load_hand_model()
    params = load_params_npz("assets/pretrained/synthetic_params.npz")

    # Realistic crops: the trained network on its own synthetic distribution.
    chunks = []
    for i in range(BIG // 256):
        poses = sample_poses(jax.random.fold_in(jax.random.key(0), i), 256)
        synt = synthesize(
            hand, jax.random.fold_in(jax.random.key(1), i), poses,
            add_noise=False,
        )
        chunks.append(np.asarray(synt.dms))
    dms = jnp.asarray(np.concatenate(chunks))  # (1024, 64, 64) scaled units

    results = {}
    for label, precision in [("default", None), ("highest", "highest")]:
        network = make_network(1, precision=precision)

        @jax.jit
        def joints_of(params, dms):
            out = forward(network, params, real_dms=dms[:, None], train=False)
            return out.real_xyz[-1][:, 0]  # (B, 41, 3) mm

        big = np.asarray(joints_of(params, dms))
        small = np.concatenate([
            np.asarray(joints_of(params, dms[i * SMALL:(i + 1) * SMALL]))
            for i in range(BIG // SMALL)
        ])
        d = np.linalg.norm(big - small, axis=-1)  # (1024, 41) per-joint mm

        def scanned_ms(dms_b) -> float:
            """Per-forward device ms: args.iters forwards chained under ONE
            scan dispatch (optimization_barrier defeats loop hoisting of the
            loop-invariant forward), best of 3 dispatches."""
            @jax.jit
            def many(params, dms):
                def body(acc, _):
                    d_in = jax.lax.optimization_barrier(dms + 0.0 * acc)
                    j = forward(
                        network, params, real_dms=d_in[:, None], train=False
                    ).real_xyz[-1]
                    return acc + jnp.mean(j) * 1e-6, None
                acc, _ = jax.lax.scan(
                    body, jnp.zeros(()), None, length=args.iters
                )
                return acc
            many(params, dms_b).block_until_ready()  # compile/warm
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                many(params, dms_b).block_until_ready()
                best = min(best, time.perf_counter() - t0)
            return best / args.iters * 1e3

        ms128 = scanned_ms(dms[:SMALL])
        ms1024 = scanned_ms(dms)
        results[label] = {
            "max_mm": float(d.max()),
            "mean_mm": float(d.mean()),
            "p99_mm": float(np.percentile(d, 99)),
            "b128_ms_device": round(ms128, 3),
            "b1024_ms_device": round(ms1024, 3),
        }
        print(f"{label:8s}: |B=1024 - B=128| max {d.max():.5f} mm, "
              f"mean {d.mean():.6f}, p99 {np.percentile(d, 99):.5f}; "
              f"device fwd B=128 {ms128:.3f} ms, B=1024 {ms1024:.3f} ms",
              flush=True)

    out = {
        "backend": str(jax.devices()[0]),
        "batches": [BIG, SMALL],
        **results,
        "highest_cost_ratio_b128": round(
            results["highest"]["b128_ms_device"]
            / results["default"]["b128_ms_device"], 3
        ),
        "highest_cost_ratio_b1024": round(
            results["highest"]["b1024_ms_device"]
            / results["default"]["b1024_ms_device"], 3
        ),
    }
    print(json.dumps(out))
    if args.artifact:
        path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "..",
            "tests", "goldens", "precision_wobble.json",
        )
        with open(path, "w") as f:
            json.dump(out, f, indent=2)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
