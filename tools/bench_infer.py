"""Serving-path benchmark: depth crops -> joints. Device time + scanned wall.

Measures spherehand_tpu.infer.PoseEstimator (hourglass forward + soft-argmax
+ palm denoiser — the packaged serving surface) two ways per batch size:

- ``device_ms``: jit-umbrella device time from a jax.profiler trace — the
  per-call latency number, immune to host/tunnel overhead entirely.
- ``wall_ms`` / ``crops_per_sec``: ``iters`` predictions scanned under ONE
  dispatch (same hardening bench.py got — the measurement environment's
  per-dispatch tunnel latency is volatile, so per-call wall timing measures
  the tunnel, not the chip). Best of 3 dispatches; a scalar reduction of
  every iteration is carried so nothing can be elided.

The reference has no serving path to compare (estimation only exists inside
its eval loop, network/engine.py:150-263). Prints one JSON line with every
batch's numbers.

Usage: python tools/bench_infer.py [batches="1,8,128,1024"]
"""
from __future__ import annotations

import functools
import json
import os
import sys
import tempfile
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

from parse_trace import device_op_totals

from spherehand_tpu.infer import PoseEstimator, load_params_npz


def _device_ms(trace_dir: str, op_prefix: str, calls: int) -> float:
    """Device time per call of the jit umbrella op in a trace."""
    totals, _, _ = device_op_totals(trace_dir)
    for name, dur in totals.items():
        if name.startswith(op_prefix):
            return dur / 1e3 / calls
    raise RuntimeError(f"no {op_prefix} op in {trace_dir}")


def _scanned_wall_ms(est: PoseEstimator, dms: np.ndarray, iters: int = 50,
                     repeats: int = 3) -> float:
    """Wall ms/prediction with ``iters`` predictions in ONE dispatch."""
    base = jnp.asarray(dms)

    @functools.partial(jax.jit, static_argnames=())
    def many(params, base):
        def body(acc, i):
            # vary the input per iteration (cheap elementwise) so no two
            # iterations are foldable; carry a reduction of each output.
            joints, _ = est._predict(params, base + 0.001 * i)
            return acc + jnp.mean(joints), None

        acc, _ = jax.lax.scan(
            body, jnp.zeros(()), jnp.arange(iters, dtype=jnp.float32)
        )
        return acc

    out = many(est.params, base)
    jax.block_until_ready(out)  # compile/warmup
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(many(est.params, base))
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return best


def main() -> None:
    batches = [int(b) for b in
               (sys.argv[1] if len(sys.argv) > 1 else "1,8,128,1024").split(",")]
    params = load_params_npz(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     "assets", "pretrained", "synthetic_params.npz")
    )
    est = PoseEstimator(params, num_stacks=1, denoise=True)
    rng = np.random.RandomState(0)

    results = []
    for b in batches:
        dms = np.full((b, 64, 64), 100.0, np.float32)
        dms[:, 20:44, 20:44] = rng.uniform(20, 60, (b, 24, 24))
        est.predict(dms)  # compile/warmup
        outdir = tempfile.mkdtemp(prefix=f"trinfer{b}_")
        with jax.profiler.trace(outdir):
            for _ in range(3):
                est.predict(dms)
        dev_ms = _device_ms(outdir, "jit__predict", 3)
        wall_ms = _scanned_wall_ms(est, dms * 0.01)  # pre-scaled like predict
        rec = {
            "batch": b,
            "device_ms": round(dev_ms, 4),
            "wall_ms_scanned": round(wall_ms, 4),
            "crops_per_sec_device": round(b / dev_ms * 1e3),
            "crops_per_sec_wall": round(b / wall_ms * 1e3),
        }
        results.append(rec)
        print(f"B={b:5d}: {dev_ms:7.3f} ms device  {wall_ms:7.3f} ms wall(scan)"
              f"  {rec['crops_per_sec_device']:10,d} crops/s dev"
              f"  {rec['crops_per_sec_wall']:10,d} crops/s wall", flush=True)
    print(json.dumps({"metric": "serving_latency", "results": results}))


if __name__ == "__main__":
    main()
