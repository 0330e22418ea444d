"""Data-parallel sharding policy over a 1-D ``data`` mesh.

The reference is strictly single-GPU (SURVEY.md §2.5: zero distributed
machinery; bare ``.cuda()`` everywhere, e.g. network/engine.py:55-87). The
workload — a ~2M-parameter CNN on 64x64 crops — warrants exactly one axis of
parallelism: shard the batch over ICI and let XLA insert the gradient
``psum``. No TP/PP is built because none is warranted; parameters and
optimizer state are replicated, batches are sharded on their leading axis.

Everything goes through ``jax.jit`` with ``NamedSharding`` constraints:
multi-host slices work transparently (JAX places per-host shards; DCN only
carries the gradient all-reduce XLA emits).
"""
from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(devices: list | None = None) -> Mesh:
    """1-D mesh over all (or the given) devices, axis name ``data``."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), ("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over ``data``."""
    return NamedSharding(mesh, P("data"))


def scan_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 1 (batch) over ``data``; axis 0 is a replicated scan/step
    axis (the engine's steps_per_call chunk)."""
    return NamedSharding(mesh, P(None, "data"))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully replicated sharding (params, optimizer state, scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Device-put every array in a pytree with its leading axis sharded."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
