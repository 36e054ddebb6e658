"""Device mesh + sharding helpers.

The reference's only parallelism is NCCL data-parallel over ray batches
(reference train.py:271-272 DDPPlugin; SURVEY.md §2.4).  The TPU equivalent:
one mesh axis `data` over all chips; ray batches sharded along axis 0; model
params and the occupancy grid replicated.  Gradients of replicated params
w.r.t. a sharded batch make XLA insert the all-reduce (psum over ICI) inside
the jitted step — no explicit collective calls needed, and the same code runs
single-chip, one host, or multi-host (jax.distributed).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> int:
    """Multi-host bring-up (replaces torch.distributed/NCCL init that
    Lightning performs implicitly, reference train.py:271-272).

    On Cloud TPU pods `jax.distributed.initialize()` auto-discovers the
    coordinator; elsewhere pass coordinator/num_processes/process_id (or the
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars).
    Grad psums ride ICI within a slice and DCN across hosts — same jitted
    step, no code change.  Returns this host's process index.  No-op for
    single-process runs (the common case) — call only when a pod run is
    requested (train.py --multihost).
    """
    kw = {}
    if coordinator_address:
        kw = dict(coordinator_address=coordinator_address,
                  num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kw)
    return jax.process_index()


def data_mesh(devices: Optional[Sequence] = None, axis: str = "data") -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(devices, (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard leading (ray) dimension across the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis: str = "data") -> dict:
    """Place a host batch dict with rays sharded over the mesh."""
    sh = batch_sharding(mesh, axis)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, replicated(mesh))
