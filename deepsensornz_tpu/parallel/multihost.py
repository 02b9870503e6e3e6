"""Multi-host / multi-slice scale-out.

SURVEY.md §5.8: the reference has no distributed backend at all (scale-out
= one process per year/GPU, ``outputs/infer.py:50-62``). Here scale-out is
JAX-native:

- within a slice: the (data, spatial) mesh over ICI (``parallel.mesh``),
- across hosts/slices: ``jax.distributed`` + a global mesh whose ``data``
  axis spans slices (gradient psum rides DCN, everything else stays on ICI).

This module wraps the initialisation/boilerplate; it is exercised on
multi-host deployments (single-host environments see exactly one process).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import AxisType, Mesh

from deepsensornz_tpu.parallel.mesh import DATA_AXIS, SPATIAL_AXIS


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> dict:
    """Initialise jax.distributed from args or standard env vars
    (``COORDINATOR_ADDRESS`` / ``NUM_PROCESSES`` / ``PROCESS_ID``; TPU pod
    environments usually auto-detect and need no arguments).

    Returns {process_index, process_count, local_devices, global_devices}.

    NOTE: must run before anything initialises the XLA backend —
    ``jax.distributed.initialize`` rejects late calls, so this function
    deliberately touches no device API until after initialisation.
    """
    addr = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    if addr:
        try:
            jax.distributed.initialize(
                coordinator_address=addr,
                num_processes=num_processes
                or int(os.environ.get("NUM_PROCESSES", "1")),
                process_id=process_id
                if process_id is not None
                else int(os.environ.get("PROCESS_ID", "0")),
            )
        except RuntimeError as e:
            # idempotent re-init is fine; a too-late call is the caller's bug
            if "already" not in str(e):
                raise
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": jax.local_device_count(),
        "global_devices": jax.device_count(),
    }


def make_global_mesh(n_spatial: int = 1) -> Mesh:
    """Global (data, spatial) mesh over ALL processes' devices.

    Layout: the spatial axis is packed within a host/slice (ICI — halo
    exchange is latency-sensitive), the data axis spans slices (DCN-tolerant
    gradient psum).
    """
    devices = np.asarray(jax.devices())
    n = len(devices)
    if n % n_spatial:
        raise ValueError(f"{n} devices not divisible by n_spatial={n_spatial}")
    dev_array = devices.reshape(n // n_spatial, n_spatial)
    return Mesh(dev_array, (DATA_AXIS, SPATIAL_AXIS),
                axis_types=(AxisType.Auto, AxisType.Auto))


def shard_task_multihost(task, mesh: Mesh):
    """Assemble a GLOBAL TaskBatch on a multi-process mesh from per-host
    data: batch-dimensioned leaves shard over the data axis (each process
    contributes only its local rows — the per-host input-pipeline pattern),
    everything else replicates. The multi-process counterpart of
    ``parallel.mesh.shard_task`` (single-process device_put cannot build
    cross-host global arrays)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    batch = task.batch_size
    per, off = shard_batch_for_host(batch)

    def place(leaf):
        leaf = np.asarray(leaf)
        if leaf.ndim >= 1 and leaf.shape[0] == batch:
            return jax.make_array_from_process_local_data(
                NamedSharding(mesh, P(DATA_AXIS)), leaf[off: off + per])
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, P()), leaf)

    return jax.tree.map(place, task)


def replicate_multihost(tree, mesh: Mesh):
    """Place a pytree (params / optimizer state) as replicated GLOBAL
    arrays on a multi-process mesh — every process must hold identical
    values (e.g. the same seeded init)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P())

    def place(leaf):
        return jax.make_array_from_process_local_data(sh, np.asarray(leaf))

    return jax.tree.map(place, tree)


def shard_batch_for_host(global_batch: int) -> tuple[int, int]:
    """(per-host batch, host offset) for feeding a globally-sharded batch
    from per-host input pipelines (each host loads only its shard)."""
    pc, pi = jax.process_count(), jax.process_index()
    if global_batch % pc:
        raise ValueError(f"global batch {global_batch} not divisible by {pc} hosts")
    per = global_batch // pc
    return per, pi * per
