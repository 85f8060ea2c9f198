"""Multi-host (multi-process) initialization and data sharding.

Replaces the reference's SLURM/env-var NCCL rendezvous
(train_ddp.py:632-671 `init_distributed_mode`, incl. its missing
`init_multinode` module and live pdb trap) with JAX's canonical one process
per host model: `jax.distributed.initialize` + the same (dp, mp) mesh code
as single-host — collectives ride ICI within a slice and DCN across slices
automatically once the mesh spans all devices.

Usage on each host (or under SLURM, where JAX auto-detects):

    from pointnerf_tpu.parallel import multihost
    multihost.initialize()                      # no-op on a single process
    mesh = make_mesh(dp=..., mp=...)            # over jax.devices() — global
    ...

Per-host ray batches: each host feeds only its local shard of the global
batch (`host_batch_slice`), the jitted step assembles the global array via
`jax.make_array_from_process_local_data` — the DistributedSampler analog
(train_ddp.py:693).
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed when running multi-process.

    Resolution order (mirrors the reference's env/SLURM derivation,
    train_ddp.py:641-653): explicit args -> JAX_COORDINATOR_ADDRESS env ->
    SLURM auto-detection inside jax.distributed -> single-process no-op.
    Returns True if distributed mode was initialized."""
    if jax.process_count() > 1:
        return True  # already initialized
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    in_slurm = "SLURM_JOB_ID" in os.environ and \
        int(os.environ.get("SLURM_NTASKS", "1")) > 1
    if addr is None and not in_slurm:
        return False
    kwargs = {}
    if addr is not None:
        kwargs["coordinator_address"] = addr
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    return True


def host_batch_slice(global_batch_size: int) -> slice:
    """This host's contiguous slice of the global ray batch (the
    DistributedSampler analog)."""
    per = global_batch_size // jax.process_count()
    start = per * jax.process_index()
    return slice(start, start + per)


def global_ray_batch(mesh, local_arrays, batch_axis: int = 0):
    """Assemble per-host numpy ray batches into globally-sharded jax arrays
    over the mesh's dp axis."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    sharding = NamedSharding(mesh, P("dp"))
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        local_arrays)
