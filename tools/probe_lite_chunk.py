"""Probe kernel CHUNK sizes for the lite mesh's ~half-size face windows.

The production CHUNK (32 fast / 16 exact) was tuned on the full mesh's
window sizes; the lite mesh halves every window, so smaller chunks may cut
quantization waste. Patches the module constants before trace (they are
read at trace time) and measures like tools/bench_lite.py.

Usage: python tools/probe_lite_chunk.py
"""
from __future__ import annotations

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
from spherehand_tpu.render import raster_pallas

BATCH = 1024


def main() -> None:
    model = load_hand_model(lite=True)
    for chunk in (32, 16, 8):
        raster_pallas.CHUNK = chunk
        fps = measure_render_fps(model, BATCH, exact=False)
        print(f"lite fast  CHUNK={chunk}: {fps:,.0f} fps", flush=True)
    raster_pallas.CHUNK = 32
    for chunk in (16, 8):
        raster_pallas.CHUNK_EXACT = chunk
        fps = measure_render_fps(model, BATCH, exact=True)
        print(f"lite exact CHUNK={chunk}: {fps:,.0f} fps", flush=True)


if __name__ == "__main__":
    main()
