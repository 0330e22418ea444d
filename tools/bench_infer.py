"""Serving-path benchmark: depth crops -> joints, DEVICE time per call.

Measures spherehand_tpu.infer.PoseEstimator (hourglass forward + soft-argmax
+ palm denoiser — the packaged serving surface) via jax.profiler device
traces: the measurement environment's host<->chip tunnel has volatile
per-dispatch latency AND an execution relay that makes repeated-call
wall-clock timing unreliable (CLAUDE.md), so the jit umbrella's device time
is the only trustworthy latency/throughput number here. The reference has
no serving path to compare (estimation only exists inside its eval loop,
network/engine.py:150-263).

Usage: python tools/bench_infer.py [batches="1,8,128,1024"]
"""
from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from parse_trace import device_op_totals

from spherehand_tpu.infer import PoseEstimator, load_params_npz


def _device_ms(trace_dir: str, op_prefix: str, calls: int) -> float:
    """Device time per call of the jit umbrella op in a trace."""
    totals, _, _ = device_op_totals(trace_dir)
    for name, dur in totals.items():
        if name.startswith(op_prefix):
            return dur / 1e3 / calls
    raise RuntimeError(f"no {op_prefix} op in {trace_dir}")


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
        outdir = tempfile.mkdtemp(prefix=f"trinfer{b}_")
        with jax.profiler.trace(outdir):
            for _ in range(3):
                est.predict(dms)
        ms = _device_ms(outdir, "jit__predict", 3)
        print(f"B={b:5d}: {ms:7.3f} ms device/call  "
              f"{b / ms * 1e3:10,.0f} crops/sec", flush=True)


if __name__ == "__main__":
    main()
