"""Harvest the reference-scale recipe runs into a committed evidence artifact.

Reads the two tools/reference_recipe.py run outputs —

  runs/reference_recipe/   the STOCK recipe (Adam lr 1e-3, StepLR /10 per
                           25 epochs, 75 epochs; the reference's documented
                           self-supervised fine-tune of the synthetic
                           pretraining, run_engine.py:23 + README.md:43-48)
  runs/companion_lr3e5/    the stable companion (identical stack, lr 3e-5,
                           24 epochs)

— and writes tests/goldens/recipe_at_scale.json holding both eval
trajectories plus the run configs. tests/test_recipe_artifact.py asserts
the documented claims against it (stock operating point diverges on
pseudo-NYU; the framework itself closes the domain gap at the same scale).

Run from the repo root after both runs finish:
    python tools/recipe_artifact.py
"""
from __future__ import annotations

import argparse
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_run(out_dir: str) -> dict:
    """Prefer the final trajectory.json; fall back to recipe_state.json
    (identical trajectory list) for a run that is resumable but unfinished."""
    final = os.path.join(out_dir, "trajectory.json")
    state = os.path.join(out_dir, "recipe_state.json")
    if os.path.exists(final):
        blob = json.load(open(final))
        traj = blob["trajectory"]
        meta = {k: blob[k] for k in ("config", "samples", "test", "steps",
                                     "train_secs", "backend") if k in blob}
        meta["finished"] = True
    else:
        blob = json.load(open(state))
        traj = blob["trajectory"]
        meta = {"train_secs": blob.get("train_secs"), "finished": False}
    compact = [
        {
            "epoch": e["epoch"],
            "lr": e["lr"],
            "mm": e["avg_joint_error"],
            "raw_mm": e["avg_joint_error_raw"],
        }
        for e in traj
    ]
    meta["trajectory"] = compact
    return meta


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stock", default="runs/reference_recipe")
    ap.add_argument("--companion", default="runs/companion_lr3e5")
    ap.add_argument("--out", default=os.path.join(
        REPO, "tests", "goldens", "recipe_at_scale.json"))
    args = ap.parse_args()

    art = {
        "stock": _load_run(args.stock),
        "companion": _load_run(args.companion),
        "provenance": "tools/reference_recipe.py; see PERF.md round-4 "
                      "'reference recipe at reference scale'",
        # These runs evaluated at eval_precision="default" (bf16 conv
        # passes): per-sample outputs carry a batch-composition wobble
        # bounded by tests/goldens/precision_wobble.json (mean 0.06 mm,
        # p99 0.34 mm, max 1.75 mm) — immaterial for the 10-mm-scale
        # trajectory conclusions asserted on this artifact. Runs from
        # round 5 on use the parity-grade mode (reference_recipe.py now
        # pins eval_precision="highest").
        "eval_precision_note": {
            "eval_precision": "default",
            "wobble_bound_mm": {"mean": 0.06, "p99": 0.34, "max": 1.75},
            "bound_source": "tests/goldens/precision_wobble.json",
        },
    }
    with open(args.out, "w") as f:
        json.dump(art, f, indent=1)
    s, c = art["stock"]["trajectory"], art["companion"]["trajectory"]
    print(f"stock: {len(s)} evals, {s[0]['mm']} -> {s[-1]['mm']} mm "
          f"(finished={art['stock']['finished']})")
    print(f"companion: {len(c)} evals, {c[0]['mm']} -> {c[-1]['mm']} mm "
          f"best {min(e['mm'] for e in c)}")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
