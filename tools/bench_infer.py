"""Serving-path benchmark: depth crops -> joints latency/throughput.

Measures spherehand_tpu.infer.PoseEstimator (hourglass forward + soft-argmax
+ palm denoiser — the packaged serving surface) on the attached chip, at a
latency-oriented small batch and a throughput-oriented large batch. The
reference has no serving path to compare (estimation only exists inside its
eval loop, network/engine.py:150-263).

Usage: python tools/bench_infer.py [batches="1,8,128,1024"]
"""
from __future__ import annotations

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

from spherehand_tpu.infer import PoseEstimator, load_params_npz


def main() -> None:
    batches = [int(b) for b in
               (sys.argv[1] if len(sys.argv) > 1 else "1,8,128,1024").split(",")]
    params = load_params_npz(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     "assets", "pretrained", "synthetic_params.npz")
    )
    est = PoseEstimator(params, num_stacks=1, denoise=True)
    rng = np.random.RandomState(0)

    for b in batches:
        dms = np.full((b, 64, 64), 100.0, np.float32)
        dms[:, 20:44, 20:44] = rng.uniform(20, 60, (b, 24, 24))
        est.predict(dms)  # compile/warmup
        iters = 50 if b <= 8 else 20
        t0 = time.perf_counter()
        for _ in range(iters):
            out = est.predict(dms)
        dt = (time.perf_counter() - t0) / iters
        print(f"B={b:5d}: {dt * 1e3:7.2f} ms/call  "
              f"{b / dt:10,.0f} crops/sec", flush=True)


if __name__ == "__main__":
    main()
