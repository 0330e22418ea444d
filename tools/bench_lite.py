"""Render-throughput measurement: full vs lite hand mesh (one TPU chip).

Same measurement as bench.py (sample -> FK -> LBS -> project -> rasterize ->
2x2 mean), run for both meshes and both raster modes. The lite mesh
(tools/make_lite_mesh.py) halves the face count, which shrinks the
comparator-bound sort and the kernel windows together; its renders are
validated end-to-end (tools/lite_mesh_e2e.py trains to within ~0.2 mm of
full-mesh training at 75k steps).

``measure_render_fps`` is shared with bench.py so both produce byte-identical
XLA programs and hit the same persistent compilation cache.

Usage: python tools/bench_lite.py [batch]
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


def measure_render_fps(model, batch: int, exact: bool, iters: int = 50,
                       repeats: int = 3, chunk: int | None = None,
                       diag: tuple = ()) -> float:
    """Frames/sec of the full synthesis render path on the default device.

    The ``iters`` renders run under ONE ``lax.scan`` dispatch — production
    renders are fused inside the jitted train step, never dispatched
    per-call, and the measurement environment's per-dispatch tunnel latency
    is volatile (ms to seconds), so per-call timing measures the tunnel,
    not the chip. Best of ``repeats`` dispatches sheds one-off hiccups.
    A scalar reduction of every frame is carried so no iteration can be
    elided.

    iters=50: at 20 the one ~26-40 ms tunnel RTT per dispatch was still a
    5-8% haircut on every key vs the device-trace rate (the reason
    BENCH_rNN numbers always read lowest among the artifacts — VERDICT r4);
    50 amortizes it below ~3% while keeping a repeat under a second. The
    device rate itself is unchanged (PERF.md round 5)."""
    import jax.numpy as jnp

    from spherehand_tpu.data.sampler import sample_poses
    from spherehand_tpu.hand.kinematics import forward_kinematics
    from spherehand_tpu.render.raster import render_depth_64

    @functools.partial(jax.jit, static_argnames=("exact", "chunk", "diag"))
    def render_many(key0, exact, chunk=None, diag=()):
        def body(acc, i):
            key = jax.random.fold_in(key0, i)
            params = sample_poses(key, batch)
            transforms = forward_kinematics(model, params)
            rand_f = jax.random.uniform(
                jax.random.fold_in(key, 1), (batch,), minval=0.9, maxval=1.1
            )
            out = render_depth_64(model, transforms, rand_f, exact=exact,
                                  chunk_override=chunk, _diag=diag)
            return acc + jnp.mean(out), None
        acc, _ = jax.lax.scan(
            body, jnp.zeros(()), jnp.arange(iters, dtype=jnp.int32)
        )
        return acc

    out = render_many(jax.random.key(0), exact, chunk, diag)
    jax.block_until_ready(out)  # compile/warmup
    best = 0.0
    for r in range(repeats):
        t0 = time.perf_counter()
        out = render_many(jax.random.key(r + 1), exact, chunk, diag)
        jax.block_until_ready(out)
        best = max(best, batch * iters / (time.perf_counter() - t0))
    return best


def main() -> None:
    from spherehand_tpu.hand.assets import load_hand_model

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    for lite in (False, True):
        model = load_hand_model(lite=lite)
        for exact in (False, True):
            fps = measure_render_fps(model, batch, exact)
            name = "lite" if lite else "full"
            mode = "exact" if exact else "fast"
            print(f"{name} {mode}: {fps:,.0f} fps", flush=True)


if __name__ == "__main__":
    main()
