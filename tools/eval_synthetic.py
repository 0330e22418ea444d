"""Held-out synthetic evaluation: render unseen poses, predict, score in mm.

With no NYU data or released checkpoints in this environment, this is the
framework's self-consistent accuracy benchmark: sample held-out poses, render
clean depth crops through the triangle rasterizer, run the trained estimator,
and report per-joint errors + the reference's max-error PCK curve
(dataset/evaluation.py:69-79 semantics).

Usage: python tools/eval_synthetic.py <checkpoint_dir> [num_samples=2048] [batch=128]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from spherehand_tpu.data.sampler import sample_poses
from spherehand_tpu.data.synthesizer import synthesize
from spherehand_tpu.evaluation.metrics import max_error_curve
from spherehand_tpu.hand.assets import load_hand_model
from spherehand_tpu.models.estimator import forward, make_network
from spherehand_tpu.train.config import EngineConfig
from spherehand_tpu.train.steps import build_steps


def main():
    ckpt = sys.argv[1] if len(sys.argv) > 1 else "runs/synthetic_full/model_final"
    num_samples = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 128

    import orbax.checkpoint as ocp

    hand = load_hand_model()
    steps = build_steps(EngineConfig(num_stacks=1), hand)
    template = steps.init_state(jax.random.key(0))
    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(os.path.abspath(ckpt), template)
    # Parity-grade eval passes: batch-invariant outputs (VERDICT r4 item 3).
    network = make_network(1, precision="highest")

    @jax.jit
    def eval_batch(params, key):
        # Held-out seed space (training used consecutive small ints).
        poses = sample_poses(key, batch)
        synt = synthesize(hand, jax.random.fold_in(key, 1), poses, add_noise=True)
        out = forward(network, params, synt_dms=synt.dms)
        est = out.synt_xyz[-1]
        return jnp.linalg.norm(est - synt.xyz, axis=-1)  # (B, 41) mm

    errors = []
    for i in range(num_samples // batch):
        key = jax.random.fold_in(jax.random.key(777_000), i)
        errors.append(np.asarray(eval_batch(state.params, key)))
    errors = np.concatenate(errors)  # (N, 41)

    mean = float(errors.mean())
    per_joint = errors.mean(axis=0)
    thresholds, fractions = max_error_curve(errors)
    print(f"samples: {errors.shape[0]}  (noisy renders, held-out poses)")
    print(f"mean joint error: {mean:.2f} mm")
    print(f"median sample mean error: {np.median(errors.mean(axis=1)):.2f} mm")
    print(f"worst joint: {per_joint.argmax()} at {per_joint.max():.2f} mm")
    print("max-error PCK curve (thresh mm -> fraction):")
    for t, f in zip(thresholds, fractions):
        print(f"  {t:5.1f}  {f:.3f}")
    out_path = os.path.join(os.path.dirname(os.path.abspath(ckpt)), "synthetic_eval.npz")
    np.savez_compressed(
        out_path, errors=errors, thresholds=thresholds, fractions=fractions
    )
    print("saved:", out_path)


if __name__ == "__main__":
    main()
