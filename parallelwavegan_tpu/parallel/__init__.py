"""SPMD utilities: distributed init, device mesh, batch sharding."""

from parallelwavegan_tpu.parallel.mesh import (  # noqa: F401
    init_distributed,
    make_mesh,
    replicate,
    shard_batch,
)
