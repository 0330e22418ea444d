"""Device-mesh and sharding policy (data-parallel over ICI)."""

from spherehand_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    data_mesh,
    replicated,
    scan_batch_sharding,
    shard_batch,
)
