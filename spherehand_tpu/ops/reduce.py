"""Batch-weighted reductions for padded data-parallel batches.

The engine pads real/synthetic batches up to a multiple of the device-mesh
size with duplicate rows at weight zero (JAX shardings require the leading
axis to divide the mesh; the reference batch geometry 25/48/8 does not divide
8 chips). Every loss that reduces over the batch uses these helpers so padded
rows contribute exactly zero loss AND zero gradient — the multi-device step
computes the same objective as the single-device one.

``weights=None`` means "all rows real" and reduces to the plain jnp op.
"""
from __future__ import annotations

import jax.numpy as jnp


def _broadcast(w: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """(B,) weights -> (B, 1, 1, ...) matching x's rank."""
    return w.reshape(w.shape + (1,) * (x.ndim - 1)).astype(x.dtype)


def bmean(x: jnp.ndarray, weights: jnp.ndarray | None) -> jnp.ndarray:
    """Mean over ALL elements of x (leading axis = batch), weighting rows.

    Equals ``jnp.mean(x)`` when weights is None or all-ones.
    """
    if weights is None:
        return jnp.mean(x)
    per_row = x.size // x.shape[0]
    return jnp.sum(x * _broadcast(weights, x)) / (jnp.sum(weights) * per_row)


def bsum(x: jnp.ndarray, weights: jnp.ndarray | None) -> jnp.ndarray:
    """Sum over ALL elements of x, zeroing padded rows."""
    if weights is None:
        return jnp.sum(x)
    return jnp.sum(x * _broadcast(weights, x))


def bmean_keep(x: jnp.ndarray, weights: jnp.ndarray | None, axes) -> jnp.ndarray:
    """Weighted mean over the batch axis 0 plus the given non-batch axes,
    keeping the rest — e.g. a per-view mean over (batch, H, W)."""
    if weights is None:
        return jnp.mean(x, axis=(0, *axes))
    num = jnp.sum(x * _broadcast(weights, x), axis=(0, *axes))
    per_row = 1
    for a in axes:
        per_row *= x.shape[a]
    return num / (jnp.sum(weights) * per_row)
