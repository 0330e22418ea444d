"""Component-level profiling of the render path on the attached device.

Times, per stage: FK+LBS+project, face setup + binning (sort), the Pallas
kernel, the brute-force XLA raster, and the end-to-end render, so kernel
optimization targets the real bottleneck.

Usage: python tools/profile_raster.py [batch]
"""
from __future__ import annotations

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

from spherehand_tpu.data.sampler import sample_poses
from spherehand_tpu.hand.assets import load_hand_model
from spherehand_tpu.hand.kinematics import forward_kinematics
from spherehand_tpu.hand.skinning import lbs_mesh, orthographic_project
from spherehand_tpu.render import raster, raster_pallas


def timeit(fn, *args, iters=10, label=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:34s} {dt * 1e3:9.3f} ms")
    return dt


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    model = load_hand_model()
    print(f"device: {jax.devices()[0]}, batch={batch}")

    @jax.jit
    def geometry(key):
        params = sample_poses(key, batch)
        tr = forward_kinematics(model, params)
        verts = lbs_mesh(model, tr)
        proj = orthographic_project(verts, 640.0)
        fv = proj[:, model.faces.reshape(-1), :3]
        return fv.reshape(batch, model.num_faces, 3, 3)

    fv = geometry(jax.random.key(0))
    samples = jnp.asarray(raster.bilinear_sample_positions(64, 10))

    @jax.jit
    def setup_and_bin(fv):
        p, face_inv, valid = raster.face_setup(fv)
        keys, num_tiles = raster_pallas._bin_faces(
            p, valid, samples, samples, 16, 16, 640, 640
        )
        face_ids = jnp.broadcast_to(
            jnp.tile(jnp.arange(fv.shape[1], dtype=jnp.int32), 4)[None], keys.shape
        )
        sorted_keys, order = jax.lax.sort_key_val(keys, face_ids, dimension=-1)
        boundaries = jnp.arange(num_tiles + 2, dtype=jnp.int32)
        starts = jax.vmap(
            lambda row: jnp.searchsorted(row, boundaries, side="left")
        )(sorted_keys).astype(jnp.int32)
        fdata = raster_pallas._build_face_records(p, face_inv, valid)
        fdata_sorted = jnp.take_along_axis(fdata, order[:, None, :], axis=-1)
        return starts, fdata_sorted

    timeit(geometry, jax.random.key(1), label="geometry (FK+LBS+project)")
    timeit(setup_and_bin, fv, label="face setup + binning (sort)")
    timeit(
        lambda fv: raster_pallas.rasterize_depth_binned(fv, samples, samples),
        fv,
        label="binned pallas raster (e2e)",
    )
    timeit(
        lambda fv: raster.rasterize_depth(fv, samples, samples),
        fv,
        iters=3,
        label="brute-force XLA raster",
    )
    timeit(
        lambda key: raster.render_depth_64(
            model, forward_kinematics(model, sample_poses(key, batch))
        ),
        jax.random.key(2),
        label="render_depth_64 end-to-end",
    )


if __name__ == "__main__":
    main()
