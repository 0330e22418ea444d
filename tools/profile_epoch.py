"""Engine epoch-loop wall profiler: where does a combined epoch spend time?

The reference engine prints wall time per 100 iterations only
(network/engine.py:366-372); this decomposes OUR epoch loop into its three
independent rates so the pole is measurable, not guessed:

  loader   — memmap gather + host batch assembly, iterated alone
  step     — the jitted combined step re-dispatched on a fixed device batch
  loop     — the real engine epoch path (prefetch -> put_batch -> step)

and repeats the loop measurement with --steps_per_call K (K batches stacked
and lax.scanned per dispatch).  Run on the TPU:

    python tools/profile_epoch.py [--samples 800] [--iters 200] [--k 8]

Uses the same pseudo-NYU generator as tools/selfsup_demo.py so no external
data is needed.
"""
from __future__ import annotations

import argparse
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

from spherehand_tpu.train.config import EngineConfig
from spherehand_tpu.train.engine import Engine, _prefetch


def _ensure_data(data_dir: str, samples: int) -> None:
    train_dir = os.path.join(data_dir, "train")
    # Sentinel = a file the generator actually writes (the shard writer
    # emits mv_data_0_{shape.pkl,dms.bat,...}; an earlier check looked for
    # a dms_0.npy that never exists, regenerating the set on every run).
    if os.path.exists(os.path.join(train_dir, "mv_data_0_shape.pkl")):
        return
    from tools.selfsup_demo import generate_pseudo_nyu

    generate_pseudo_nyu(train_dir, samples, seed=0)


# Dispatches burned per program before any clock starts (see measure_step).
WARM_DISPATCHES = 24


def _cycle(engine: Engine):
    """Endless batch stream (the profiling set is smaller than an epoch)."""
    while True:
        yield from engine._real_loader(True, engine.cfg.real_batch)


def measure_loader(engine: Engine, iters: int) -> float:
    it = _cycle(engine)
    next(it)  # first batch pays memmap warmup
    t0 = time.time()
    n = 0
    for raw in it:
        n += 1
        if n >= iters:
            break
    return (time.time() - t0) / max(n, 1) * 1e3


def measure_step(engine: Engine, iters: int) -> float:
    """Fixed-batch re-dispatch rate of the accumulating combined step."""
    cfg = engine.cfg
    loader = engine._real_loader(train=True, batch_size=cfg.real_batch)
    raw = next(iter(loader))
    batch = engine._put_batch(raw)
    lr = jnp.asarray(cfg.lr_at_epoch(0))
    sums = engine._metric_zeros(
        "combined",
        lambda: jax.eval_shape(
            engine.steps.combined_step, engine.state, engine.base_key,
            lr, batch, jnp.asarray(True),
        )[1],
    )
    # donate_argnums would invalidate the engine's copy for later measures
    state = jax.tree.map(jnp.copy, engine.state)
    # Warm the program PAST the one-time early-dispatch stall: the tunneled
    # TPU plugin pays a ~40-95 s hidden hitch on an early dispatch of each
    # distinct program (measured round 4, /tmp/step_diag*: one 44-72 s
    # submit inside the first ~20 dispatches, then steady ~3 ms submits at
    # ~9-13 ms/step). One warm call does NOT absorb it, so every rate this
    # tool ever printed without this burn-in was a stall amortization, not
    # a throughput. Burn WARM_DISPATCHES dispatches before the clock.
    for it in range(WARM_DISPATCHES):
        state, metrics, vis, sums = engine._jit_combined_acc(
            state, engine.base_key, np.asarray([0, it], np.int32), lr, batch,
            sums,
        )
    jax.block_until_ready(metrics["loss"])
    t0 = time.time()
    for it in range(iters):
        state, metrics, vis, sums = engine._jit_combined_acc(
            state, engine.base_key,
            np.asarray([0, WARM_DISPATCHES + it], np.int32), lr,
            batch, sums,
        )
    jax.block_until_ready(metrics["loss"])
    return (time.time() - t0) / iters * 1e3


def measure_loop(engine: Engine, iters: int) -> float:
    """The real epoch path: prefetch -> put_batch -> accumulating step."""
    cfg = engine.cfg
    lr = jnp.asarray(cfg.lr_at_epoch(0))
    # donate_argnums would invalidate the engine's copy for later measures
    state = jax.tree.map(jnp.copy, engine.state)
    sums = None
    metrics = None
    n = 0
    t0 = None
    for it, raw in enumerate(_prefetch(_cycle(engine))):
        batch = engine._put_batch(raw)
        if sums is None:
            sums = engine._metric_zeros(
                "combined",
                lambda: jax.eval_shape(
                    engine.steps.combined_step, state, engine.base_key, lr,
                    batch, jnp.asarray(True),
                )[1],
            )
        state, metrics, vis, sums = engine._jit_combined_acc(
            state, engine.base_key, np.asarray([0, it], np.int32), lr, batch,
            sums,
        )
        if it < WARM_DISPATCHES:  # exclude compile + early-dispatch stall
            if it == WARM_DISPATCHES - 1:
                jax.block_until_ready(metrics["loss"])
                t0 = time.time()
            continue
        n += 1
        if n >= iters:
            break
    jax.block_until_ready(metrics["loss"])
    return (time.time() - t0) / max(n, 1) * 1e3


def measure_loop_scan(engine: Engine, iters: int) -> float:
    """steps_per_call>1 path: K stacked batches per dispatch."""
    cfg = engine.cfg
    K = cfg.steps_per_call
    lr = jnp.asarray(cfg.lr_at_epoch(0))
    # donate_argnums would invalidate the engine's copy for later measures
    state = jax.tree.map(jnp.copy, engine.state)
    sums = None
    metrics = None
    buf = []
    n = 0
    t0 = None
    for raw in _prefetch(_cycle(engine)):
        buf.append(raw)
        if len(buf) < K:
            continue
        batches = engine._put_batches(buf)
        buf = []
        if sums is None:
            one = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(x.shape[1:], x.dtype), batches
            )
            sums = engine._metric_zeros(
                "combined",
                lambda: jax.eval_shape(
                    engine.steps.combined_step, state, engine.base_key, lr,
                    one, jnp.asarray(True),
                )[1],
            )
        its = jnp.asarray(np.arange(n * K, (n + 1) * K, dtype=np.int32))
        state, metrics, vis, sums = engine._jit_combined_scan(
            state, engine.base_key, np.int32(0), its, lr, batches, sums,
        )
        warm = max(WARM_DISPATCHES // K, 1)
        if n < warm:  # exclude compile + early-dispatch stall
            if n == warm - 1:
                jax.block_until_ready(metrics["loss"])
                t0 = time.time()
            n += 1
            continue
        n += 1
        if (n - warm) * K >= iters:
            break
    jax.block_until_ready(metrics["loss"])
    return (time.time() - t0) / max((n - warm) * K, 1) * 1e3


def _cycle_idx(engine: Engine):
    while True:
        yield from engine._real_loader(
            True, engine.cfg.real_batch
        ).iter_index_batches()


def measure_loop_dev(engine: Engine, iters: int, k: int = 1) -> float:
    """Device-resident epoch path: the split lives in HBM, each dispatch
    uploads only the (K, B) index plan and gathers inside the program."""
    import jax

    cfg = engine.cfg
    lr = jnp.asarray(cfg.lr_at_epoch(0))
    data = engine._resident(train=True)
    assert data is not None
    state = jax.tree.map(jnp.copy, engine.state)
    sums = None
    metrics = None
    buf = []
    n = 0
    t0 = None
    for idx in _cycle_idx(engine):
        buf.append(idx)
        if len(buf) < k:
            continue
        plans = [engine._pad_idx(i) for i in buf]
        buf = []
        if k == 1:
            fed = jax.device_put(plans[0], engine._batch_sharding)
        else:
            ws = (None if plans[0][1] is None
                  else np.stack([w for _, w in plans]))
            fed = jax.device_put(
                (np.stack([i for i, _ in plans]), ws),
                engine._scan_batch_sharding,
            )
        if sums is None:
            b = fed[0].shape[-1]
            sums = engine._metric_zeros(
                "combined",
                lambda: jax.eval_shape(
                    engine.steps.combined_step, state, engine.base_key, lr,
                    engine._sds_batch(data, b, fed[1]), jnp.asarray(True),
                )[1],
            )
        if k == 1:
            state, metrics, vis, sums = engine._jit_combined_acc_dev(
                state, engine.base_key, np.asarray([0, n], np.int32), lr,
                data, fed[0], fed[1], sums,
            )
        else:
            its = jnp.asarray(np.arange(n * k, (n + 1) * k, dtype=np.int32))
            state, metrics, vis, sums = engine._jit_combined_scan_dev(
                state, engine.base_key, np.int32(0), its, lr,
                data, fed[0], fed[1], sums,
            )
        warm = max(WARM_DISPATCHES // k, 1)
        if n < warm:  # exclude compile + early-dispatch stall
            if n == warm - 1:
                jax.block_until_ready(metrics["loss"])
                t0 = time.time()
            n += 1
            continue
        n += 1
        if (n - warm) * k >= iters:
            break
    jax.block_until_ready(metrics["loss"])
    return (time.time() - t0) / max((n - warm) * k, 1) * 1e3


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=800)
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--data_dir", default="/tmp/epoch_profile_data")
    ap.add_argument("--bf16", action="store_true")
    args = ap.parse_args()

    _ensure_data(args.data_dir, args.samples)

    cfg = EngineConfig(
        mode="Train", dataset_dir=args.data_dir, model_dir="/tmp/epoch_profile_runs",
        bf16=args.bf16,
    )
    engine = Engine(cfg)

    loader_ms = measure_loader(engine, args.iters)
    print(f"loader alone:   {loader_ms:7.2f} ms/step "
          f"({1e3 / loader_ms:7.1f} steps/s)", flush=True)
    step_ms = measure_step(engine, args.iters)
    print(f"step alone:     {step_ms:7.2f} ms/step "
          f"({1e3 / step_ms:7.1f} steps/s)", flush=True)
    loop_ms = measure_loop(engine, args.iters)
    print(f"epoch loop K=1: {loop_ms:7.2f} ms/step "
          f"({1e3 / loop_ms:7.1f} steps/s)", flush=True)

    cfg_k = dataclasses_replace(cfg, args.k)
    engine_k = Engine(cfg_k)
    loop_k_ms = measure_loop_scan(engine_k, args.iters)
    print(f"epoch loop K={args.k}: {loop_k_ms:7.2f} ms/step "
          f"({1e3 / loop_k_ms:7.1f} steps/s)", flush=True)

    dev_ms = measure_loop_dev(engine, args.iters, k=1)
    print(f"device-resident K=1: {dev_ms:7.2f} ms/step "
          f"({1e3 / dev_ms:7.1f} steps/s)", flush=True)
    dev_k_ms = measure_loop_dev(engine_k, args.iters, k=args.k)
    print(f"device-resident K={args.k}: {dev_k_ms:7.2f} ms/step "
          f"({1e3 / dev_k_ms:7.1f} steps/s)", flush=True)


def dataclasses_replace(cfg: EngineConfig, k: int) -> EngineConfig:
    import dataclasses

    return dataclasses.replace(cfg, steps_per_call=k)


if __name__ == "__main__":
    main()
