"""Depth-map noise and augmentation ops (pure JAX, jit-safe).

Re-designs of the reference's sensor-noise simulators and train-time
augmentation (network/util_modules.py): ``DepthNoise`` :46-84 (random integer
pixel shifts + foreground z noise), ``DepthResample`` :10-43 (pixel dropout +
Gaussian blur), ``ResizeCropImage`` :383-424 (per-sample anisotropic shrink,
pasted centered on background). The torch ResizeCropImage loops over the
batch with dynamic intermediate shapes; here it is a single gather with
per-sample traced indices, so it lives inside the jitted train step.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def _rowwise_uniform(key: jax.Array, shape) -> jnp.ndarray:
    """Uniform draws keyed PER BATCH ROW: row i's values are independent of
    the batch size, so padded data-parallel batches (engine pads the leading
    axis up to the device mesh) reproduce the unpadded rows' randomness
    exactly. A plain uniform(key, (B, ...)) re-deals every row when B grows.
    """
    row_keys = jax.vmap(jax.random.fold_in, (None, 0))(
        key, jnp.arange(shape[0])
    )
    return jax.vmap(lambda k: jax.random.uniform(k, shape[1:]))(row_keys)


def depth_pixel_noise(key: jax.Array, dms: jnp.ndarray) -> jnp.ndarray:
    """Random per-pixel integer shifts + Gaussian z noise on the foreground.

    dms: (B, H, W) in *scaled* units (background 1.0). Each output pixel reads
    from a nearby source pixel (truncated N(0.5, 0.5) integer offsets, clamped
    to the image) and foreground values get sigma=0.05 z noise
    (reference util_modules.py:60-84).
    """
    batch, height, width = dms.shape
    kx, ky, kz = jax.random.split(key, 3)
    # .long() on a float tensor truncates toward zero.
    dx = jnp.trunc(jax.random.normal(kx, dms.shape) * 0.5 + 0.5).astype(jnp.int32)
    dy = jnp.trunc(jax.random.normal(ky, dms.shape) * 0.5 + 0.5).astype(jnp.int32)

    # Bounded-shift select instead of a per-element gather: a (B*H*W)-row
    # take_along_axis runs at ~10 ns/row on TPU (~2 ms/call in the train
    # step); selecting among the 36 statically-shifted slices is fused VPU
    # work. Offsets are trunc(N(0.5, 0.5)) so P(offset outside [-2, 3]) ~
    # 3e-7 per axis — the clamp below deviates from the unbounded-offset
    # semantics with probability ~1e-13 per pixel (the reference's own
    # clip-to-image keeps everything in-range at the borders either way).
    lo, hi = -2, 3
    dxc = jnp.clip(dx, lo, hi)
    dyc = jnp.clip(dy, lo, hi)
    # edge padding replicates the border rows/cols = the reference's
    # clip(src, 0, size-1) for every in-bound shift.
    padded = jnp.pad(dms, ((0, 0), (-lo, hi), (-lo, hi)), mode="edge")
    shifted = dms
    for b in range(lo, hi + 1):
        for a in range(lo, hi + 1):
            sl = jax.lax.slice(
                padded,
                (0, b - lo, a - lo),
                (batch, b - lo + height, a - lo + width),
            )
            shifted = jnp.where((dxc == a) & (dyc == b), sl, shifted)
    z_noise = jax.random.normal(kz, dms.shape) * 0.05
    return jnp.where(shifted < 1.0, shifted + z_noise, shifted)


_GAUSS3 = np.asarray([[1, 2, 1], [2, 6, 2], [1, 2, 1]], np.float32)
_GAUSS5 = np.asarray(
    [
        [1, 4, 7, 4, 1],
        [4, 16, 26, 16, 4],
        [7, 26, 41, 26, 7],
        [4, 16, 26, 16, 4],
        [1, 4, 7, 4, 1],
    ],
    np.float32,
)


def depth_resample(
    key: jax.Array, dms: jnp.ndarray, sample_ratio: float = 0.95, kernel_size: int = 3
) -> jnp.ndarray:
    """Drop (1 - sample_ratio) of pixels to background, then Gaussian blur.

    dms: (B, H, W) scaled units. Off by default in the reference engine
    (run_engine.py:27); kernel 3 or 5 (util_modules.py:10-43).
    """
    kern = _GAUSS3 if kernel_size == 3 else _GAUSS5
    kern = jnp.asarray(kern / kern.sum(), dms.dtype)
    keep = _rowwise_uniform(key, dms.shape) <= sample_ratio
    dropped = jnp.where(keep, dms, 1.0)
    pad = kernel_size // 2
    out = jax.lax.conv_general_dilated(
        dropped[..., None],
        kern[..., None, None],
        window_strides=(1, 1),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out[..., 0]


def resize_crop(
    dms: jnp.ndarray, u_scales: jnp.ndarray, v_scales: jnp.ndarray
) -> jnp.ndarray:
    """Anisotropic shrink + centered paste on background=1.0, per sample.

    dms (B, H, W); scales (B,) in (0, 1]. Matches the torch ResizeCropImage
    shrink path (util_modules.py:396-423): nearest-neighbor resize to
    (round(H v), round(W u)) then paste centered. A scale of exactly 1 is the
    identity. Implemented as one gather with traced per-sample indices.
    """
    batch, height, width = dms.shape

    def axis_index(scales: jnp.ndarray, size: int) -> tuple[jnp.ndarray, jnp.ndarray]:
        new_size = jnp.floor(size * scales + 0.5).astype(jnp.int32)  # (B,)
        used = jnp.floor(size * scales).astype(jnp.int32)  # int(width * scale)
        start = (size - new_size) // 2
        out_pos = jnp.arange(size, dtype=jnp.int32)[None, :]  # (1, size)
        rel = out_pos - start[:, None]
        inside = (rel >= 0) & (rel < used[:, None])
        # torch nearest-neighbor: src = floor(dst * in_size / out_size)
        src = (rel * size) // jnp.maximum(new_size[:, None], 1)
        src = jnp.clip(src, 0, size - 1)
        return src, inside

    src_u, in_u = axis_index(u_scales, width)
    src_v, in_v = axis_index(v_scales, height)
    # The index map is separable (src_v depends on the output row only,
    # src_u on the output column only), so the per-pixel gather — ~10 ns/
    # element on TPU, ~3 ms/call in the train step — becomes two one-hot
    # selection matmuls on the MXU. Every one-hot row has exactly one 1, so
    # each output is a single product; HIGHEST keeps the f32 depth values
    # un-rounded (default TPU matmuls are bf16 passes).
    oh_v = (src_v[:, :, None]
            == jnp.arange(height, dtype=jnp.int32)[None, None, :]).astype(dms.dtype)
    oh_u = (src_u[:, :, None]
            == jnp.arange(width, dtype=jnp.int32)[None, None, :]).astype(dms.dtype)
    rows = jnp.einsum("bvh,bhw->bvw", oh_v, dms,
                      precision=jax.lax.Precision.HIGHEST)
    gathered = jnp.einsum("bvw,buw->bvu", rows, oh_u,
                          precision=jax.lax.Precision.HIGHEST)
    inside = in_v[:, :, None] & in_u[:, None, :]
    identity = (u_scales >= 1.0)[:, None, None] & (v_scales >= 1.0)[:, None, None]
    return jnp.where(identity, dms, jnp.where(inside, gathered, 1.0))


def sample_resize_scales(
    key: jax.Array, n: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Train-time aug scales: identity with p=0.5, else anisotropic ~[0.7, 1.0].

    Matches create_network_and_criterion.py:42-48 (shared base scale in
    [0.75, 0.95] plus +-0.05 per-axis jitter; one coin for the whole batch).
    Per-sample draws are row-keyed (see ``_rowwise_uniform``) so padded
    data-parallel batches keep the unpadded rows' augmentation.
    """
    k_coin, k_base, k_u, k_v = jax.random.split(key, 4)
    coin = jax.random.uniform(k_coin, ()) < 0.5
    base = _rowwise_uniform(k_base, (n, 1))[:, 0] * 0.2 + 0.75
    u = base + _rowwise_uniform(k_u, (n, 1))[:, 0] * 0.1 - 0.05
    v = base + _rowwise_uniform(k_v, (n, 1))[:, 0] * 0.1 - 0.05
    ones = jnp.ones((n,))
    return jnp.where(coin, ones, u), jnp.where(coin, ones, v)
