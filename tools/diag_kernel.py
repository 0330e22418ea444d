"""Diagnostic: split the raster kernel's time into loop/read overhead vs compute.

Runs the production fast path twice — once real, once with ``_diag_stub=True``
(identical grid, quad loop, windows, and (chunk, FREC) VMEM reads, but the
per-chunk coverage/depth math reduced to a single column add + min). The
difference isolates the VPU compute share and tells the next optimization
round where the ceiling is.

Usage: python tools/diag_kernel.py [batch=512] [exact]

With ``exact`` the same decomposition runs on the parity-mode kernel
(``_raster_kernel_exact``): "cols" keeps all 23 field loads + the six affine
evaluations; the remainder is the span tail (selects, ceil/trunc, clips,
compares, the true division).
"""
from __future__ import annotations

import functools
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

from spherehand_tpu.data.sampler import sample_poses
from spherehand_tpu.hand.assets import load_hand_model
from spherehand_tpu.hand.kinematics import forward_kinematics
from spherehand_tpu.hand.skinning import lbs_mesh, orthographic_project
from spherehand_tpu.render.raster import bilinear_sample_positions
from spherehand_tpu.render.raster_pallas import rasterize_depth_binned


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    exact = len(sys.argv) > 2 and sys.argv[2] not in ("0", "false", "fast")
    model = load_hand_model()
    samples = jnp.asarray(bilinear_sample_positions(64, 10))

    @jax.jit
    def make_fv(i):
        params = sample_poses(jax.random.key(i), batch)
        tr = forward_kinematics(model, params)
        verts = lbs_mesh(model, tr)
        proj = orthographic_project(verts, 640.0)
        fv = proj[:, jnp.asarray(model.faces).reshape(-1), :3]
        return fv.reshape(batch, model.num_faces, 3, 3)

    # Distinct inputs per call: wall-timing identical pre-staged executions
    # through the relay is unreliable (PERF.md) — it returns ~0 ms.
    fvs = [jax.block_until_ready(make_fv(i)) for i in range(8)]

    def kernel_device_ms(stub):
        """Per-call device time of the Pallas op, from a profiler trace
        (wall timing through the execution relay is unreliable)."""
        fn = functools.partial(
            rasterize_depth_binned, exact=exact, valid_frac=0.62,
            pool_clamp=100.0, bilinear_grid=(64, 10), _diag_stub=stub,
        )
        jax.block_until_ready(fn(fvs[0], samples, samples))
        outdir = f"/tmp/diag_kernel_{stub if stub else 'real'}"
        with jax.profiler.trace(outdir):
            for fv in fvs:
                out = fn(fv, samples, samples)
            jax.block_until_ready(out)
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from parse_trace import load_events

        events, names = load_events(outdir)
        device_pids = {
            pid for pid, name in names.items()
            if "TPU" in name or "/device:" in name or "XLA" in name.upper()
        }
        kern = sum(
            e.get("dur", 0.0)
            for e in events
            if e.get("ph") == "X" and e.get("pid") in device_pids
            and "rasterize_depth_binned" in e.get("name", "")
            and not e.get("name", "").startswith("jit_")  # the program itself
        )
        return kern / 1e3 / len(fvs)

    real = kernel_device_ms(False)
    stub_min = kernel_device_ms("min")
    stub_cols = kernel_device_ms("cols")
    print(f"batch {batch}: kernel device ms/call: real {real:.2f}, "
          f"cols-stub {stub_cols:.2f} (all 9 field broadcasts + 6 fma), "
          f"min-stub {stub_min:.2f} (loops + 1 field + reduce)")
    print(f"  -> tail ops (w2/cover/recip/select): {real - stub_cols:.2f} ms; "
          f"field loads+fma: {stub_cols - stub_min:.2f} ms; "
          f"loop/reduce floor: {stub_min:.2f} ms")


if __name__ == "__main__":
    main()
