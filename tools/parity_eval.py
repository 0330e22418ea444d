"""One-command NYU accuracy parity drill: torch .pth -> 14-pt eval error.

The north-star comparison (<= 0.5 mm vs the reference's released
checkpoints) is environmentally blocked — neither the NYU shards nor the
`.pth` blobs exist in this mount (reference .MISSING_LARGE_BLOBS). This tool
keeps the whole path warm as ONE command so the comparison is runnable the
moment they appear:

    python tools/parity_eval.py ckpt.pth /path/to/nyu_dataset \
        [--num_stacks 2] [--out runs/parity]

- `.pth` checkpoints are converted in-place via tools/import_torch_checkpoint
  (envelope unwrap, DataParallel prefixes, OIHW->HWIO); `.npz` params load
  directly.
- Evaluation is the engine's own jitted eval_step, so the semantics are
  byte-for-byte the run-time ones: view 0, final stack, palm denoiser,
  14-point average joint error (reference network/engine.py:203-207 +
  utils_metric.py:7-17).
- Writes `result.npz` (gt/est) and runs the offline evaluator
  (per_joint_mean_error.txt, mean_error.txt, max_error curve — reference
  dataset/evaluation.py) in --out.

Exercised end-to-end on generated pseudo-NYU shards + a random torch
checkpoint in tests/test_tools_eval.py::test_parity_eval_drill.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

import jax


def run_parity_eval(ckpt: str, dataset_dir: str, num_stacks: int,
                    out_dir: str, batch_size: int = 8) -> dict:
    from import_torch_checkpoint import import_checkpoint

    from spherehand_tpu.data.nyu import NyuDataset, NyuLoader
    from spherehand_tpu.evaluation.offline import evaluate_result_file
    from spherehand_tpu.hand.assets import load_hand_model
    from spherehand_tpu.infer import load_params_npz
    from spherehand_tpu.train.config import EngineConfig
    from spherehand_tpu.train.steps import RealBatch, build_steps

    os.makedirs(out_dir, exist_ok=True)
    if ckpt.endswith(".npz"):
        params = load_params_npz(ckpt)
    else:
        params = import_checkpoint(
            ckpt, os.path.join(out_dir, "imported_params.npz"), num_stacks
        )

    # Parity-grade numerics: true-f32 conv passes. The 0.5 mm parity bar
    # cannot be adjudicated through TPU's default bf16 conv passes, whose
    # per-sample outputs wobble with batch composition by up to ~5 mm on
    # ambiguous samples (infer.py); "highest" makes eval batch-invariant.
    cfg = EngineConfig(num_stacks=num_stacks, eval_precision="highest")
    steps = build_steps(cfg, load_hand_model())
    eval_step = jax.jit(steps.eval_step)

    test_dir = os.path.join(dataset_dir, "test")
    if not os.path.isdir(test_dir):
        test_dir = dataset_dir  # accept a bare shard dir too
    data = NyuDataset(test_dir)
    loader = NyuLoader(data, batch_size, shuffle=False, seed=0)

    all_gt, all_est, errs, ns = [], [], [], []
    for it, raw in enumerate(loader):
        batch = RealBatch(*(np.asarray(x) for x in raw), None)
        metrics, denoised = eval_step(params, jax.random.key(it), batch)
        all_gt.append(np.asarray(batch.gt_joints[:, 0]))
        all_est.append(np.asarray(denoised))
        errs.append(float(metrics["avg_joint_error"]))
        ns.append(batch.dms.shape[0])

    mean_err = float(np.average(errs, weights=ns))
    result_path = os.path.join(out_dir, "result.npz")
    np.savez_compressed(
        result_path, gt=np.concatenate(all_gt), est=np.concatenate(all_est)
    )
    offline = evaluate_result_file(result_path, make_plot=False)
    summary = {
        "avg_joint_error_mm": round(mean_err, 4),
        "offline_mean_error_mm": round(offline["mean_error"], 4),
        "num_samples": int(np.sum(ns)),
        "checkpoint": ckpt,
    }
    with open(os.path.join(out_dir, "parity.json"), "w") as f:
        json.dump(summary, f, indent=1)
    return summary


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt", help=".pth torch checkpoint or flat .npz params")
    ap.add_argument("dataset_dir", help="NYU shard root (with test/) or shard dir")
    ap.add_argument("--num_stacks", type=int, default=2)
    ap.add_argument("--out", default=os.path.join("runs", "parity"))
    ap.add_argument("--batch_size", type=int, default=8)
    args = ap.parse_args()
    summary = run_parity_eval(
        args.ckpt, args.dataset_dir, args.num_stacks, args.out, args.batch_size
    )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
