"""Device mesh + sharding helpers — the TPU-native replacement for the
reference's NCCL/DDP layer (/root/reference/parallel_wavegan/bin/train.py:
1067-1086 and distributed/launch.py).

Design: pure data parallelism over a 1-D mesh axis "data" (models are
1-30M params and fit per chip; SURVEY.md section 2.9). Parameters are
replicated, batches sharded on axis 0; gradient all-reduce is inserted by XLA
as a psum over ICI/DCN when the jitted step consumes a sharded batch with
replicated params — no hand-written collectives needed.

Multi-host: `init_distributed` wraps jax.distributed.initialize with the
same env-var rendezvous surface as the reference launcher (MASTER_ADDR/PORT,
WORLD_SIZE, RANK).
"""

from __future__ import annotations

import logging
import os
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host JAX. Reads MASTER_ADDR/MASTER_PORT/WORLD_SIZE/
    RANK env vars (the reference launcher's rendezvous protocol) when args
    are not given. No-op for single-process runs."""
    if coordinator_address is None and "MASTER_ADDR" in os.environ:
        port = os.environ.get("MASTER_PORT", "29500")
        coordinator_address = f"{os.environ['MASTER_ADDR']}:{port}"
        num_processes = int(os.environ.get("WORLD_SIZE", "1"))
        process_id = int(os.environ.get("RANK", "0"))
    if coordinator_address is None or (num_processes or 1) <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    logging.info(
        "jax.distributed initialized: process %d/%d, %d local devices",
        jax.process_index(), jax.process_count(), jax.local_device_count(),
    )


def make_mesh(devices=None, axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over all (or given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


_warned_indivisible = False


def shard_batch(mesh: Mesh, batch: Any, axis_name: str = "data") -> Any:
    """Put a host batch onto the mesh, sharded along axis 0.

    Single-process: device_put with a sharded NamedSharding. Multi-process
    (jax.process_count() > 1): each process holds only its LOCAL shard of
    the global batch (bin/train.py builds per-process loaders with
    batch_size // process_count), so the global array is assembled with
    jax.make_array_from_process_local_data — device_put of host-local data
    onto a global mesh would be wrong (DDP analogue: DistributedSampler
    shards, reference bin/train.py:1389-1405).

    Falls back to replication (with a one-time warning) when the batch size
    is not divisible by the mesh size — data parallelism then degrades to
    redundant compute but stays correct.
    """
    n = mesh.devices.size
    multiproc = jax.process_count() > 1
    # per-process leading-dim divisibility requirement under multi-process:
    # local shard splits over the mesh's local devices
    local_n = (
        n // jax.process_count() if multiproc and n % jax.process_count() == 0
        else n
    )

    def put(x):
        global _warned_indivisible
        if np.shape(x) and np.shape(x)[0] % local_n == 0:
            spec = P(axis_name, *([None] * (np.ndim(x) - 1)))
        else:
            if not _warned_indivisible:
                logging.warning(
                    "batch dim %s not divisible by mesh size %d; replicating",
                    np.shape(x), local_n,
                )
                _warned_indivisible = True
            spec = P()
        sharding = NamedSharding(mesh, spec)
        if multiproc:
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            )
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Replicate a pytree (params/opt state) across the mesh.

    Multi-process: every process supplies the same full array (state is
    derived from the same seed / checkpoint on all hosts), assembled into a
    fully-replicated global array.
    """
    sharding = NamedSharding(mesh, P())

    def put(x):
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            )
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, tree)


def batch_spec(mesh: Mesh, axis_name: str = "data"):
    return NamedSharding(mesh, P(axis_name))


def replicated_spec(mesh: Mesh):
    return NamedSharding(mesh, P())
