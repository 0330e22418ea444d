"""Probe kernel CHUNK sizes for either mesh (real recompiles per setting).

The production CHUNK (32 fast / 16 exact) was tuned on the full mesh's
window sizes. Chunk is now an explicit static argument of
rasterize_depth_binned (``chunk_override``), so every probe point compiles
its own program — the former module-global patching silently re-measured the
first compiled program (the jit trace cache is keyed on avals/static args,
not module globals; see ADVICE.md round 2).

Usage: python tools/probe_chunk.py [--mesh full|lite] [--batch 1024]
       [--fast 32,16,8] [--exact 16,8] [--pack4] [--split N]

--pack4 / --split also probe the fast path's diagnostic levers (4-column
packed sort; main-window chunk-loop segmentation pricing) — each setting
is its own static argument, so every probe point compiles a real program.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench_lite import measure_render_fps

from spherehand_tpu.hand.assets import load_hand_model


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", default="full", choices=("full", "lite"))
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--fast", default="32,16,8")
    ap.add_argument("--exact", default="16,8")
    ap.add_argument("--pack4", action="store_true")
    ap.add_argument("--split", type=int, default=1)
    args = ap.parse_args()
    diag = ()
    if args.pack4:
        diag += (("_diag_pack4", True),)
    if args.split > 1:
        diag += (("_diag_split_main", args.split),)
    model = load_hand_model(lite=args.mesh == "lite")
    for chunk in [int(c) for c in args.fast.split(",") if c]:
        fps = measure_render_fps(
            model, args.batch, exact=False, chunk=chunk, diag=diag
        )
        print(
            f"{args.mesh} fast  CHUNK={chunk} diag={diag}: {fps:,.0f} fps",
            flush=True,
        )
    for chunk in [int(c) for c in args.exact.split(",") if c]:
        fps = measure_render_fps(model, args.batch, exact=True, chunk=chunk)
        print(f"{args.mesh} exact CHUNK={chunk}: {fps:,.0f} fps", flush=True)


if __name__ == "__main__":
    main()
