"""Mechanistic characterization of the stock-recipe divergence.

Round 4 proved the framework computes reference-identical gradients and Adam
steps (tools/grad_parity_ab.py, f64 cross-check), and that the reference's
stock fine-tune operating point — Adam lr 1e-3, weight decay 1e-5, StepLR/10
(reference network/engine.py:95-99, run_engine.py:23) — COLLAPSES on the
pseudo-NYU domain at reference scale (49.9 -> ~95 mm over 75 epochs,
tests/goldens/recipe_at_scale.json) while lr 3e-5 on the identical stack
closes the domain gap. This tool answers the remaining question: WHICH term's
gradient drives the collapse, WHERE the lr stability boundary sits, and WHAT
the is_mv curriculum contributes — so a future real-NYU mount has a decisive
comparison protocol (VERDICT r4 item 1).

Probes (each: fresh engine, the synthetic-pretrained init, the SAME pseudo-NYU
data as the at-scale run, no checkpoints):

  A ``stock``      instrumented stock run: per-term loss values + per-term
                   parameter-gradient norms + cosine-vs-total every
                   --diag_every steps (steps.combined_term_diag: one forward,
                   one-hot vjp cotangents), mid-epoch evals localizing the
                   collapse onset inside epoch 0.
  B ``lr=X``       lr bisection between the known-stable 3e-5 and the
                   diverging 1e-3 (default probes 3e-4 and 1e-4).
  C ``no_<term>``  term ablations at stock lr: mv_projection / mv_consistency
                   / prior off (reference loss assembly
                   create_network_and_criterion.py:147-263; the m2d x9 +
                   d2m x500 projection weighting is multiview_utility.py:
                   101-129).
  D ``mv_always`` / ``mv_never``  the is_mv curriculum (engine.py:361,
                   first-1500-iterations window) pinned on/off at stock lr.

Evals use eval_precision="highest" (parity-grade, batch-invariant — VERDICT
r4 item 3). Writes <out>/study.json (full trajectories + diag records) and,
with --artifact, the distilled golden tests/goldens/divergence_study.json
asserted by tests/test_divergence_artifact.py.

Usage (TPU, ~30-45 min):
    nohup python tools/divergence_study.py --artifact \
        > /tmp/divergence_study.log 2>&1 &
"""
from __future__ import annotations

import argparse
import dataclasses
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

STOCK_LR = 1e-3  # run_engine.py:23

# The device-resident splits are identical across probes (same data, same
# single-device placement) — upload once, inject into every fresh engine
# instead of paying the 3.5 GB upload per probe.
_RESIDENT_CACHE: dict = {}


def _fresh_engine(base_cfg, out, **overrides):
    from spherehand_tpu.infer import load_params_npz
    from spherehand_tpu.train.engine import Engine

    cfg = dataclasses.replace(base_cfg, **overrides)
    engine = Engine(cfg)
    pretrained = load_params_npz("assets/pretrained/synthetic_params.npz")
    engine.state = engine.state.replace(
        params=jax.device_put(pretrained, engine._replicated)
    )
    for split, attr in (("train", "_resident_train_arrays"),
                        ("eval", "_resident_eval_arrays")):
        if split in _RESIDENT_CACHE:
            setattr(engine, attr, _RESIDENT_CACHE[split])
    _RESIDENT_CACHE.setdefault("train", engine._resident(train=True))
    _RESIDENT_CACHE.setdefault("eval", engine._resident(train=False))
    return engine


def _eval_mm(engine, epoch: int) -> float:
    res = engine._epoch_real_eval(max(epoch, 0))
    return round(float(res["avg_joint_error"]), 4)


def run_standard_probe(base_cfg, out, name, epochs, **overrides) -> dict:
    """B/C/D probes: n short epochs through the engine's production path."""
    t0 = time.time()
    engine = _fresh_engine(base_cfg, out, **overrides)
    traj = [{"epoch": -1, "mm": _eval_mm(engine, -1)}]
    for epoch in range(epochs):
        engine._epoch_combined(epoch)
        traj.append({"epoch": epoch, "mm": _eval_mm(engine, epoch)})
    probe = {
        "name": name,
        "overrides": {k: v for k, v in overrides.items() if k != "tag"},
        "trajectory": traj,
        "secs": round(time.time() - t0, 1),
    }
    print(f"[study] {name}: " + " -> ".join(f"{p['mm']:.1f}" for p in traj)
          + f" mm ({probe['secs']:.0f}s)", flush=True)
    return probe


def run_instrumented_stock(base_cfg, out, epochs, diag_every,
                           eval_every_steps) -> dict:
    """Probe A: the stock run with per-term gradient attribution.

    Drives the engine's K=1 device-resident path by hand so a diag program
    (combined_term_diag on the CURRENT params, same per-it key derivation as
    the production step) can interleave at --diag_every, and the parity-grade
    eval can fire mid-epoch to localize the collapse onset."""
    from spherehand_tpu.train.steps import RealBatch

    t0 = time.time()
    engine = _fresh_engine(base_cfg, out, lr=STOCK_LR, tag="divstudy_stock_")
    cfg = engine.cfg
    steps = engine.steps
    data = engine._resident(train=True)
    assert data is not None, "the study requires the device-resident path"

    def diag_dev(state, key, data, idx, is_mv):
        batch = RealBatch(
            data["dms"][idx], data["joints"][idx],
            data["poses"][idx], data["inv_poses"][idx], None,
        )
        return steps.combined_term_diag(state, key, batch, is_mv)

    jit_diag = jax.jit(diag_dev)

    traj = [{"epoch": -1, "it": 0, "step": 0, "mm": _eval_mm(engine, -1)}]
    print(f"[study] stock before: {traj[0]['mm']:.2f} mm", flush=True)
    diag_records: list[dict] = []
    for epoch in range(epochs):
        lr = jnp.asarray(cfg.lr_at_epoch(epoch))
        loader = engine._real_loader(
            train=True, batch_size=cfg.real_batch, epoch=epoch
        )
        sums = None
        for it, idx in enumerate(loader.iter_index_batches()):
            fed = jax.device_put(engine._pad_idx(idx),
                                 engine._batch_sharding)
            assert fed[1] is None, "bs 25 on one device must not pad"
            if it % diag_every == 0:
                key = jax.random.fold_in(
                    jax.random.fold_in(engine.base_key, epoch), it
                )
                d = jit_diag(
                    engine.state, key, data, fed[0],
                    jnp.asarray(it < cfg.mv_curriculum_iters),
                )
                rec = {"epoch": epoch, "it": it,
                       **{k: float(v) for k, v in d.items()}}
                diag_records.append(rec)
            if eval_every_steps and it and it % eval_every_steps == 0:
                mm = _eval_mm(engine, epoch)
                traj.append({"epoch": epoch, "it": it,
                             "step": int(engine.state.step), "mm": mm})
                print(f"[study] stock {epoch}-{it}: {mm:.2f} mm", flush=True)
            if sums is None:
                batch_like = engine._sds_batch(data, fed[0].shape[0], fed[1])
                sums = engine._metric_zeros(
                    "combined",
                    lambda: jax.eval_shape(
                        steps.combined_step, engine.state, engine.base_key,
                        lr, batch_like, jnp.asarray(True),
                    )[1],
                )
            engine.state, _, _, sums = engine._jit_combined_acc_dev(
                engine.state, engine.base_key,
                np.asarray([epoch, it], np.int32), lr, data,
                fed[0], fed[1], sums,
            )
        mm = _eval_mm(engine, epoch)
        traj.append({"epoch": epoch, "it": -1,
                     "step": int(engine.state.step), "mm": mm})
        print(f"[study] stock epoch {epoch} done: {mm:.2f} mm", flush=True)
    return {
        "name": "stock_instrumented",
        "lr": STOCK_LR,
        "trajectory": traj,
        "diag": diag_records,
        "secs": round(time.time() - t0, 1),
    }


def summarize_diag(diag_records: list[dict]) -> dict:
    """Per-term medians/maxima of grad norm, share of total, cosine."""
    if not diag_records:
        return {}
    terms = sorted(
        {k.split("/")[0] for k in diag_records[0] if k.endswith("/value")}
    )
    total = np.asarray([r["total_grad_norm"] for r in diag_records])
    out = {"total_grad_norm": {
        "median": float(np.median(total)), "max": float(total.max()),
    }}
    for t in terms:
        g = np.asarray([r[f"{t}/grad_norm"] for r in diag_records])
        v = np.asarray([r[f"{t}/value"] for r in diag_records])
        c = np.asarray([r[f"{t}/cos_total"] for r in diag_records])
        out[t] = {
            "grad_norm_median": float(np.median(g)),
            "grad_norm_max": float(g.max()),
            "share_of_total_median": float(np.median(g / total)),
            "value_median": float(np.median(v)),
            "value_max": float(v.max()),
            "cos_total_median": float(np.median(c)),
        }
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="runs/reference_recipe/data",
                    help="pseudo-NYU root with train/ + test/ shards (reuses "
                         "the at-scale run's data; regenerated if missing)")
    ap.add_argument("--samples", type=int, default=72_192)
    ap.add_argument("--test", type=int, default=2048)
    ap.add_argument("--epochs", type=int, default=3,
                    help="epochs per standard probe (collapse shows in ep 0)")
    ap.add_argument("--stock_epochs", type=int, default=2)
    ap.add_argument("--diag_every", type=int, default=50)
    ap.add_argument("--eval_every_steps", type=int, default=500,
                    help="mid-epoch eval cadence for the instrumented probe")
    ap.add_argument("--lrs", default="3e-4,1e-4",
                    help="lr bisection probes between 3e-5 (stable) and "
                         "1e-3 (diverges)")
    ap.add_argument("--skip", default="",
                    help="comma list of probe names to skip")
    ap.add_argument("--out", default="runs/divergence_study")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--artifact", action="store_true",
                    help="write tests/goldens/divergence_study.json")
    args = ap.parse_args()

    from tools.selfsup_demo import generate_pseudo_nyu
    from spherehand_tpu.train.config import EngineConfig

    train_dir = os.path.join(args.data, "train")
    test_dir = os.path.join(args.data, "test")
    if not os.path.exists(os.path.join(test_dir, "mv_data_0_shape.pkl")):
        generate_pseudo_nyu(train_dir, args.samples, seed=args.seed)
        generate_pseudo_nyu(test_dir, args.test, seed=args.seed + 10_000)

    os.makedirs(args.out, exist_ok=True)
    base_cfg = EngineConfig(
        mode="Train",
        model_dir=os.path.join(args.out, "runs"),
        dataset_dir=args.data,
        epoch=75,           # keeps lr_at_epoch == the at-scale schedule
        num_stacks=1,
        lr=STOCK_LR,
        steps_per_call=8,
        eval_precision="highest",
        seed=args.seed,
        tag="divstudy_",
    )
    skip = set(filter(None, args.skip.split(",")))
    state_path = os.path.join(args.out, "study.json")
    study = (
        json.load(open(state_path)) if os.path.exists(state_path)
        else {"probes": {}}
    )
    study["backend"] = str(jax.devices()[0])
    study["data"] = {"samples": args.samples, "test": args.test,
                     "root": args.data}

    def done(name):
        return name in study["probes"] or name in skip

    def record(probe):
        study["probes"][probe["name"]] = probe
        with open(state_path + ".tmp", "w") as f:
            json.dump(study, f, indent=1)
        os.replace(state_path + ".tmp", state_path)

    # A: instrumented stock
    if not done("stock_instrumented"):
        record(run_instrumented_stock(
            base_cfg, args.out, args.stock_epochs, args.diag_every,
            args.eval_every_steps,
        ))

    # B: lr bisection
    for lr_s in filter(None, args.lrs.split(",")):
        name = f"lr_{lr_s}"
        if not done(name):
            record(run_standard_probe(
                base_cfg, args.out, name, args.epochs,
                lr=float(lr_s), tag=f"divstudy_{lr_s}_",
            ))

    # C: term ablations at stock lr
    for term in ("mv_projection", "mv_consistency", "prior", "collision",
                 "bone_length"):
        name = f"no_{term}"
        if not done(name):
            record(run_standard_probe(
                base_cfg, args.out, name, args.epochs,
                **{term: False}, tag=f"divstudy_no{term}_",
            ))

    # D: is_mv curriculum pinned
    for name, iters in (("mv_always", 10**9), ("mv_never", 0)):
        if not done(name):
            record(run_standard_probe(
                base_cfg, args.out, name, args.epochs,
                mv_curriculum_iters=iters, tag=f"divstudy_{name}_",
            ))

    # Distilled conclusions
    stock = study["probes"].get("stock_instrumented", {})
    diag_summary = summarize_diag(stock.get("diag", []))

    def traj_mm(name):
        p = study["probes"].get(name)
        return [e["mm"] for e in p["trajectory"]] if p else None

    def collapse_row(name, margin=5.0):
        t = traj_mm(name)
        if not t:
            return None
        return {
            "before_mm": t[0],
            "final_mm": t[-1],
            "trajectory_mm": t,
            "collapsed": bool(t[-1] > t[0] + margin),
        }

    probes_named = sorted(study["probes"])
    conclusions = {
        "collapse": {n: collapse_row(n) for n in probes_named},
        "diag_summary": diag_summary,
    }
    study["conclusions"] = conclusions
    with open(state_path, "w") as f:
        json.dump(study, f, indent=1)
    print(f"[study] wrote {state_path}")
    print(json.dumps(conclusions["collapse"], indent=1))

    if args.artifact:
        golden = {
            "backend": study["backend"],
            "data": study["data"],
            "stock_lr": STOCK_LR,
            "collapse": conclusions["collapse"],
            "diag_summary": diag_summary,
            "stock_trajectory": stock.get("trajectory", []),
            "provenance": "tools/divergence_study.py",
        }
        path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "..",
            "tests", "goldens", "divergence_study.json",
        )
        with open(path, "w") as f:
            json.dump(golden, f, indent=1)
        print(f"[study] wrote {path}")


if __name__ == "__main__":
    main()
