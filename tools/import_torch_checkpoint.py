"""One-command import of a released torch estimator checkpoint (.pth).

Keeps the checkpoint-parity door open (reference README.md:35-42 ships
`.pth` hourglass estimators; the blobs are absent from this environment's
mount): if they ever appear, this converts one straight into the flat
'a/b/c'-keyed .npz that `spherehand_tpu.infer.load_params_npz` /
`PoseEstimator` consume, after which the <=0.5 mm NYU comparison is
`tools/eval pipeline` away.

Handles the usual torch wrappers: a {'state_dict': ...} / {'model': ...}
envelope and 'module.' DataParallel prefixes.

Usage: python tools/import_torch_checkpoint.py ckpt.pth out.npz [--num_stacks 2]

Round-trip tested in tests/test_hourglass.py::test_pth_checkpoint_roundtrip
(a freshly torch.save'd random num_stacks=2 state_dict imports and
reproduces the golden outputs).
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def unwrap_state_dict(ckpt) -> dict:
    """Peel common checkpoint envelopes down to a flat name->tensor dict."""
    for key in ("state_dict", "model", "net"):
        if isinstance(ckpt, dict) and key in ckpt and isinstance(ckpt[key], dict):
            ckpt = ckpt[key]
    out = {}
    for k, v in ckpt.items():
        k = k.removeprefix("module.")
        out[k.replace(".", "/")] = np.asarray(
            v.detach().cpu().numpy() if hasattr(v, "detach") else v
        )
    return out


def import_checkpoint(pth_path: str, out_path: str, num_stacks: int) -> dict:
    import torch

    from spherehand_tpu.models.hourglass import convert_torch_state
    from spherehand_tpu.train.priors import save_flax_params_npz

    ckpt = torch.load(pth_path, map_location="cpu", weights_only=False)
    state = unwrap_state_dict(ckpt)
    params = convert_torch_state(state, num_stacks=num_stacks)
    save_flax_params_npz(out_path, params)
    return params


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("pth")
    ap.add_argument("out")
    ap.add_argument("--num_stacks", type=int, default=2)
    args = ap.parse_args()
    params = import_checkpoint(args.pth, args.out, args.num_stacks)
    import jax

    n = sum(x.size for x in jax.tree.leaves(params))
    print(f"imported {args.pth} -> {args.out} ({n:,} params, "
          f"num_stacks={args.num_stacks})")


if __name__ == "__main__":
    main()
