"""Diagnostic: split the raster kernel's time into loop/read overhead vs compute.

Runs a stub variant of the production kernel — identical grid, tile loop,
range windows, and (CHUNK, FREC) VMEM reads, but the per-chunk coverage/depth
math reduced to a single column min — against the real kernel on identical
inputs. The difference isolates the VPU compute share and tells the next
optimization round where the ceiling is.

Usage: python tools/diag_kernel.py [batch=128]
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from spherehand_tpu.data.sampler import sample_poses
from spherehand_tpu.hand.assets import load_hand_model
from spherehand_tpu.hand.kinematics import forward_kinematics
from spherehand_tpu.hand.skinning import lbs_mesh, orthographic_project
from spherehand_tpu.render import raster, raster_pallas as rp


def _stub_kernel(starts_ref, xcoord_ref, ycoord_ref, fdata_ref, out_ref, *,
                 num_tiles, tiles_x):
    b = pl.program_id(0)
    base = b * (num_tiles + 2)
    lanes = rp.QUAD * rp.TILE_S * rp.TILE_S

    def quad_body(q, _):
        t0 = q * rp.QUAD
        x = xcoord_ref[q, :][None, :]

        def process_range(rs, re, zbuf):
            aligned_rs = (rs // 8) * 8

            def chunk_body(i, zbuf):
                off = pl.multiple_of(aligned_rs + i * rp.CHUNK, 8)
                f = fdata_ref[0, pl.ds(off, rp.CHUNK), :]
                # minimal compute: one column broadcast + masked min
                entry = off + jax.lax.broadcasted_iota(jnp.int32, (rp.CHUNK, 1), 0)
                val = jnp.where(
                    (entry >= rs) & (entry < re), f[:, 0][:, None] + x, 1000.0
                )
                return jnp.minimum(zbuf, jnp.min(val, axis=0, keepdims=True))

            n_chunks = jnp.where(
                re > rs, pl.cdiv(jnp.maximum(re - aligned_rs, 0), rp.CHUNK), 0
            )
            return jax.lax.fori_loop(0, n_chunks, chunk_body, zbuf)

        rs_a = starts_ref[base + jnp.maximum(t0 - 1, 0)]
        re_a = starts_ref[base + t0 + rp.QUAD]
        up = t0 - tiles_x
        rs_b = starts_ref[base + jnp.maximum(up - 1, 0)]
        re_b = starts_ref[base + jnp.maximum(up + rp.QUAD, 0)]
        rs_c = starts_ref[base + num_tiles]
        re_c = starts_ref[base + num_tiles + 1]

        out_ref[0, q, :] = jnp.full((lanes,), 1000.0, jnp.float32)
        work = (re_a > rs_a) | (re_b > rs_b) | (re_c > rs_c)

        @pl.when(work)
        def _():
            zbuf = jnp.full((1, lanes), 1000.0, jnp.float32)
            zbuf = process_range(rs_a, re_a, zbuf)
            zbuf = process_range(rs_b, re_b, zbuf)
            zbuf = process_range(rs_c, re_c, zbuf)
            out_ref[0, q, :] = zbuf[0]

        return 0

    jax.lax.fori_loop(0, num_tiles // rp.QUAD, quad_body, 0)


@functools.partial(jax.jit, static_argnames=("tiles_x", "tiles_y"))
def stub_raster(face_vertices, sample_x, sample_y, tiles_x=16, tiles_y=16):
    batch, num_faces = face_vertices.shape[:2]
    p, face_inv, valid = rp.face_setup_fast(face_vertices)
    keys, num_tiles = rp._bin_faces(
        p, valid, sample_x, sample_y, tiles_x, tiles_y, 640, 640
    )
    face_ids = jnp.broadcast_to(
        jnp.arange(num_faces, dtype=jnp.int32)[None], keys.shape
    )
    _, order = jax.lax.sort_key_val(keys, face_ids, dimension=-1)
    counts = jnp.sum(
        keys[:, :, None] == jnp.arange(num_tiles + 2, dtype=jnp.int32),
        axis=1, dtype=jnp.int32,
    )
    starts = jnp.concatenate(
        [jnp.zeros((batch, 1), jnp.int32),
         jnp.cumsum(counts[:, :-1], axis=-1, dtype=jnp.int32)], axis=-1,
    )
    fdata = rp._build_face_records(p, face_inv, valid)
    fdata_sorted = jnp.take_along_axis(fdata, order[:, :, None], axis=1)
    pad = (-fdata_sorted.shape[1]) % rp.CHUNK + rp.CHUNK
    fdata_sorted = jnp.pad(fdata_sorted, ((0, 0), (0, pad), (0, 0)))

    spt = rp.TILE_S * rp.TILE_S
    shape4 = (tiles_y, tiles_x, rp.TILE_S, rp.TILE_S)
    num_quads = num_tiles // rp.QUAD
    xcoords = jnp.broadcast_to(
        sample_x.reshape(1, tiles_x, 1, rp.TILE_S), shape4
    ).reshape(num_quads, rp.QUAD * spt)
    ycoords = jnp.broadcast_to(
        sample_y.reshape(tiles_y, 1, rp.TILE_S, 1), shape4
    ).reshape(num_quads, rp.QUAD * spt)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(batch,),
        in_specs=[
            pl.BlockSpec((num_quads, rp.QUAD * spt), lambda b, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_quads, rp.QUAD * spt), lambda b, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, fdata_sorted.shape[1], rp.FREC),
                         lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, num_quads, rp.QUAD * spt), lambda b, s: (b, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    kernel = functools.partial(_stub_kernel, num_tiles=num_tiles, tiles_x=tiles_x)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (batch, num_quads, rp.QUAD * spt), jnp.float32
        ),
        grid_spec=grid_spec,
    )(starts.reshape(-1), xcoords, ycoords, fdata_sorted)


def timeit(fn, variants, iters=10, label=""):
    """variants: list of distinct input arrays — identical repeated inputs can
    be served from the execution relay's cache and time as ~0."""
    out = fn(variants[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(variants[i % len(variants)])
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:30s} {dt * 1e3:9.3f} ms")


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    model = load_hand_model()
    variants = []
    for k in range(4):
        params = sample_poses(jax.random.key(k), batch)
        tr = forward_kinematics(model, params)
        verts = lbs_mesh(model, tr)
        proj = orthographic_project(verts, 640.0)
        variants.append(
            proj[:, model.faces.reshape(-1), :3].reshape(
                batch, model.num_faces, 3, 3
            )
        )
    samples = jnp.asarray(raster.bilinear_sample_positions(64, 10))
    print(f"device: {jax.devices()[0]}, batch={batch}")
    timeit(
        lambda v: rp.rasterize_depth_binned(v, samples, samples), variants,
        label="full kernel pipeline",
    )
    timeit(
        lambda v: stub_raster(v, samples, samples), variants,
        label="stub-compute pipeline",
    )
    # Wall timings through the execution relay are unreliable for pre-staged
    # inputs; the device trace is ground truth.
    with jax.profiler.trace("/tmp/diagtrace"):
        for k in range(3):
            a = rp.rasterize_depth_binned(variants[k], samples, samples)
        jax.block_until_ready(a)
        for k in range(3):
            b = stub_raster(variants[k], samples, samples)
        jax.block_until_ready(b)
    print("trace written to /tmp/diagtrace")


if __name__ == "__main__":
    main()
