"""Measure the eval-numerics batch-composition wobble, default vs parity mode.

TPU's default f32 convs run bf16 passes; XLA compiles different layouts for
different batch sizes, so the SAME crop produces different joints depending
on which program processed it — measured up to ~5 mm on ambiguous samples
(infer.py). That swamps the 0.5 mm NYU parity bar, which is why
`tools/parity_eval.py` pins ``eval_precision="highest"`` (true-f32 passes).

This tool quantifies both modes on-chip: it renders 1024 synthetic crops,
computes per-sample joints through a monolithic B=1024 program and through
8 separate B=128 programs, and reports the per-sample |Δ| (mm) plus the
per-crop time cost of the parity mode. Writes the artifact
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

        t0 = time.time()
        for _ in range(args.iters):
            joints_of(params, dms[:SMALL]).block_until_ready()
        ms = (time.time() - t0) / args.iters * 1e3

        results[label] = {
            "max_mm": float(d.max()),
            "mean_mm": float(d.mean()),
            "p99_mm": float(np.percentile(d, 99)),
            "b128_ms": round(ms, 3),
        }
        print(f"{label:8s}: |B=1024 - B=128| max {d.max():.5f} mm, "
              f"mean {d.mean():.6f}, p99 {np.percentile(d, 99):.5f}; "
              f"B=128 forward {ms:.2f} ms", flush=True)

    out = {
        "backend": str(jax.devices()[0]),
        "batches": [BIG, SMALL],
        **results,
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
