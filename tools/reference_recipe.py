"""Reference-recipe proof at reference scale: the STOCK hyperparameters.

VERDICT round 3 named this the single most important open question: the
self-supervision demo (tools/selfsup_demo.py) runs 4k samples at lr 3e-5
*because* the reference lr diverges on the tiny set — so "the framework
reproduces the reference's training behavior" was plausible but unproven.
This driver exercises the reference's defining run at (pseudo-)reference
scale with the reference's exact hyperparameters:

  ~72k train samples x 3 views   (NYU train = 72,757; /root/reference
                                  dataset/nyu_generator.py writes ~73 shards)
  75 epochs                      (run_engine.py:23)
  Adam lr 1e-3, weight decay 1e-5, StepLR /10 every 25 epochs
                                 (engine.py:95-99)
  real bs 25 x 3 views + synthetic bs 48 per step (engine.py:326-330)
  is_mv curriculum: mutual-view supervision for the first 1500 iterations
  of each epoch (engine.py:361)
  init = synthetic pretraining   (README.md:40-49)

Data is the selfsup_demo pseudo-NYU benchmark (same shifted-sensor domain
gap, GT joints ride along ONLY for the metric) scaled to reference size, so
the run answers: are the stock hyperparameters *stable* at the scale they
were designed for, and do they close the domain gap?

Writes <out>/trajectory.json: per-eval-point test error + the run config,
and appends each eval to the engine's metrics.jsonl. Resumable: rolling
model_-1 checkpoints + recipe_state.json; re-running with the same --out
continues from the last finished epoch.

Usage (TPU, ~1-2 h wall):
    nohup python tools/reference_recipe.py > /tmp/reference_recipe.log 2>&1 &
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=72_192,
                    help="train samples (x 3 views); default ~= NYU's 72,757"
                         " rounded to the generator's 256-sample chunks")
    ap.add_argument("--test", type=int, default=2048)
    ap.add_argument("--epochs", type=int, default=75)
    ap.add_argument("--lr", type=float, default=1e-3,
                    help="the STOCK reference lr (run_engine.py:23)")
    ap.add_argument("--eval_every", type=int, default=1)
    ap.add_argument("--save_every", type=int, default=1,
                    help="rolling-checkpoint cadence in epochs; checkpoints "
                         "download ~26 MB from the device, so raise this in "
                         "degraded-tunnel windows (CLAUDE.md) — resume "
                         "granularity coarsens accordingly")
    ap.add_argument("--steps_per_call", type=int, default=8,
                    help="K combined steps lax.scanned per dispatch — "
                         "step-for-step equivalent to K=1, robust to "
                         "degraded dispatch windows (CLAUDE.md)")
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 conv compute (recommended prod dtype); "
                         "default f32 for recipe fidelity")
    ap.add_argument("--out", default="runs/reference_recipe")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--tag", default="refrecipe_")
    ap.add_argument("--gen_only", action="store_true",
                    help="generate the pseudo-NYU set and exit (lets other "
                         "TPU tools reuse the data before the long run)")
    args = ap.parse_args()

    from tools.selfsup_demo import (
        DROPOUT, SHIFT_PIXEL_SIGMA, Z_SIGMA, generate_pseudo_nyu,
    )
    from spherehand_tpu.infer import load_params_npz
    from spherehand_tpu.train.config import EngineConfig
    from spherehand_tpu.train.engine import Engine

    data_dir = os.path.join(args.out, "data")
    train_dir = os.path.join(data_dir, "train")
    test_dir = os.path.join(data_dir, "test")
    if not os.path.exists(os.path.join(test_dir, "mv_data_0_shape.pkl")):
        t0 = time.time()
        generate_pseudo_nyu(train_dir, args.samples, seed=args.seed)
        generate_pseudo_nyu(test_dir, args.test, seed=args.seed + 10_000)
        print(f"pseudo-NYU data: {args.samples}+{args.test} samples x 3 views "
              f"in {time.time() - t0:.1f}s", flush=True)
    if args.gen_only:
        return

    state_file = os.path.join(args.out, "recipe_state.json")
    resume = os.path.exists(state_file)
    rstate = json.load(open(state_file)) if resume else {
        "next_epoch": 0, "trajectory": [], "run_name": None,
        "train_secs": 0.0,
    }

    cfg = EngineConfig(
        mode="Train",
        model_dir=os.path.join(args.out, "runs"),
        dataset_dir=data_dir,
        epoch=args.epochs,
        num_stacks=1,
        lr=args.lr,
        bf16=args.bf16,
        steps_per_call=args.steps_per_call,
        # Parity-grade eval: batch-invariant true-f32 conv passes. The
        # round-4 at-scale artifact was captured at eval_precision="default"
        # (wobble bound: mean 0.06 mm / max 1.75 mm — immaterial for its
        # 10-mm-scale conclusions, and annotated as such in the golden);
        # runs from round 5 on carry no wobble at all.
        eval_precision="highest",
        tag=args.tag,
        seed=args.seed,
    )
    engine = Engine(cfg)

    ckpt_path = (
        os.path.join(cfg.model_dir, rstate["run_name"], "model_-1")
        if rstate["run_name"] else None
    )
    if resume and ckpt_path and not os.path.exists(ckpt_path):
        # crashed inside the first --save_every window: no checkpoint yet,
        # restart the run from scratch (trajectory resets with it)
        print(f"[recipe] no checkpoint at {ckpt_path}; restarting fresh",
              flush=True)
        resume = False
        rstate = {"next_epoch": 0, "trajectory": [], "run_name": None,
                  "train_secs": 0.0}
    if resume and rstate["run_name"]:
        path = ckpt_path
        engine.load_checkpoint(path)  # full state incl. optimizer
        engine.starting_epoch = rstate["next_epoch"]
        # keep logging into the original run dir
        engine.model_name = rstate["run_name"]
        engine.model_path = os.path.join(cfg.model_dir, engine.model_name)
        engine.log_file = os.path.join(engine.model_path, "log.txt")
        engine.metrics_file = os.path.join(engine.model_path, "metrics.jsonl")
        engine.image_dir = os.path.join(engine.model_path, "images")
        print(f"[recipe] resumed at epoch {engine.starting_epoch} "
              f"from {path}", flush=True)
    else:
        pretrained = load_params_npz("assets/pretrained/synthetic_params.npz")
        engine.state = engine.state.replace(
            params=jax.device_put(pretrained, engine._replicated)
        )
        rstate["run_name"] = engine.model_name

    def save_state() -> None:
        with open(state_file + ".tmp", "w") as f:
            json.dump(rstate, f, indent=2)
        os.replace(state_file + ".tmp", state_file)

    def evaluate(epoch: int, label: str) -> dict:
        # epoch=-1 marks the pre-training eval; fold_in keys are uint32 so
        # the engine call clamps to 0 (same key as the epoch-0 eval — fine,
        # eval is deterministic given params).
        res = engine._epoch_real_eval(max(epoch, 0))
        point = {
            "epoch": epoch,
            "label": label,
            "lr": cfg.lr_at_epoch(max(epoch, 0)),
            "step": int(engine.state.step),
            "avg_joint_error": round(float(res["avg_joint_error"]), 4),
            "avg_joint_error_raw": round(float(res["avg_joint_error_raw"]), 4),
        }
        rstate["trajectory"].append(point)
        print(f"[recipe] {json.dumps(point)}", flush=True)
        return point

    if not resume:
        evaluate(-1, "before")
        save_state()

    for epoch in range(engine.starting_epoch, cfg.epoch):
        t0 = time.time()
        engine._epoch_combined(epoch)
        rstate["train_secs"] += time.time() - t0
        saved = (epoch + 1) % args.save_every == 0 or epoch == cfg.epoch - 1
        if saved:
            engine.save_checkpoint(-1)
        if (epoch + 1) % args.eval_every == 0 or epoch == cfg.epoch - 1:
            evaluate(epoch, "train")
        if saved:
            # resume point only advances past epochs the checkpoint covers
            rstate["next_epoch"] = epoch + 1
            save_state()

    final = {
        "config": dataclasses.asdict(cfg),
        "samples": args.samples,
        "test": args.test,
        "sensor_shift": dict(shift_sigma=SHIFT_PIXEL_SIGMA, z_sigma=Z_SIGMA,
                             dropout=DROPOUT),
        "steps": int(engine.state.step),
        "train_secs": round(rstate["train_secs"], 1),
        "trajectory": rstate["trajectory"],
        "backend": str(jax.devices()[0]),
    }
    out = os.path.join(args.out, "trajectory.json")
    with open(out, "w") as f:
        json.dump(final, f, indent=2)
    best = min(p["avg_joint_error"] for p in rstate["trajectory"])
    print(f"[recipe] DONE: before "
          f"{rstate['trajectory'][0]['avg_joint_error']:.2f} mm -> final "
          f"{rstate['trajectory'][-1]['avg_joint_error']:.2f} mm "
          f"(best {best:.2f}) in {final['train_secs']:.0f}s; wrote {out}",
          flush=True)


if __name__ == "__main__":
    main()
