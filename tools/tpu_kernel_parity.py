"""Capture on-TPU compiled-kernel parity: Pallas (Mosaic) vs the XLA oracle.

All CPU tests run the Pallas kernel in interpret mode; Mosaic layout rules
have diverged from interpret semantics before (CLAUDE.md), so this captures a
one-time REAL-CHIP artifact: both rasterizer modes and the brute-force XLA
oracle on the same hand batch, with summary stats and raw buffers for a few
images. tests/test_raster_pallas.py::test_tpu_compiled_parity_artifact
asserts the recorded agreement.

Usage: python tools/tpu_kernel_parity.py  (writes tests/goldens/tpu_kernel_parity.npz)
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

import numpy as np
import jax.numpy as jnp

from spherehand_tpu.data.sampler import sample_poses
from spherehand_tpu.hand.assets import load_hand_model
from spherehand_tpu.hand.kinematics import forward_kinematics
from spherehand_tpu.hand.skinning import lbs_mesh, orthographic_project
from spherehand_tpu.render.raster import bilinear_sample_positions, rasterize_depth
from spherehand_tpu.render.raster_pallas import rasterize_depth_binned

BATCH = 32


def main() -> None:
    assert jax.default_backend() != "cpu", (
        "this artifact must be captured on the real TPU chip"
    )
    model = load_hand_model()
    params = sample_poses(jax.random.key(77), BATCH)
    tr = forward_kinematics(model, params)
    verts = lbs_mesh(model, tr)
    proj = orthographic_project(verts, 640.0)
    fv = proj[:, np.asarray(model.faces).reshape(-1), :3].reshape(
        BATCH, model.num_faces, 3, 3
    )
    samples = jnp.asarray(bilinear_sample_positions(64, 10))

    oracle = np.asarray(rasterize_depth(fv, samples, samples))
    exact = np.asarray(
        rasterize_depth_binned(fv, samples, samples, exact=True)
    )
    fast = np.asarray(
        rasterize_depth_binned(fv, samples, samples, exact=False)
    )
    # The PRODUCTION fast configuration (render_depth_64): parity-factored
    # kernel + packed 16-bit-quantized sort payloads + truncation.
    fastp = np.asarray(
        rasterize_depth_binned(
            fv, samples, samples, exact=False, bilinear_grid=(64, 10),
            valid_frac=model.raster_valid_frac,
        )
    )
    # ... and the pooled epilogue render_depth_64 actually ships (the kernel
    # emits the 2x2-mean 64x64 canvas directly when pool_clamp is given).
    fastpool = np.asarray(
        rasterize_depth_binned(
            fv, samples, samples, exact=False, bilinear_grid=(64, 10),
            valid_frac=model.raster_valid_frac, pool_clamp=100.0,
        )
    )
    pooled_oracle = (
        np.minimum(oracle, 100.0)
        .reshape(BATCH, 64, 2, 64, 2)
        .mean(axis=(2, 4))
    )

    fg_o, fg_e = oracle < 999, exact < 999
    cover_match = (fg_o == fg_e).mean()
    diff_e = np.abs(oracle - exact)
    both_f = fg_o & (fast < 999)
    diff_f = np.abs(oracle - fast)[both_f]
    both_p = fg_o & (fastp < 999)
    diff_p = np.abs(oracle - fastp)[both_p]
    stats = dict(
        batch=BATCH,
        backend=str(jax.devices()[0]),
        exact_coverage_match=float(cover_match),
        exact_median_diff=float(np.median(diff_e)),
        exact_big_diff_frac=float((diff_e > 1.0).mean()),
        fast_iou=float(both_f.sum() / max((fg_o | (fast < 999)).sum(), 1)),
        fast_p99_diff=float(np.percentile(diff_f, 99)),
        fastp_iou=float(both_p.sum() / max((fg_o | (fastp < 999)).sum(), 1)),
        fastp_p99_diff=float(np.percentile(diff_p, 99)),
        fastpool_median=float(np.median(np.abs(fastpool - pooled_oracle))),
        fastpool_p99=float(np.percentile(np.abs(fastpool - pooled_oracle), 99)),
        fastpool_big_frac=float(
            (np.abs(fastpool - pooled_oracle) > 5.0).mean()
        ),
    )
    print(stats)
    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "tests", "goldens",
        "tpu_kernel_parity.npz",
    )
    np.savez_compressed(
        out,
        oracle=oracle[:4],
        exact=exact[:4],
        fast=fast[:4],
        fastp=fastp[:4],
        fastpool=fastpool[:4],
        **{k: v for k, v in stats.items() if k != "backend"},
        backend=np.bytes_(stats["backend"].encode()),
    )
    print("wrote", out)


if __name__ == "__main__":
    main()
