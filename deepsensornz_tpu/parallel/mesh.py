"""Mesh construction and TaskBatch sharding utilities."""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import AxisType, Mesh, NamedSharding, PartitionSpec as P

from deepsensornz_tpu.task.task import TaskBatch

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


def make_mesh(
    n_data: Optional[int] = None,
    n_spatial: int = 1,
    devices=None,
) -> Mesh:
    """Build a (data, spatial) mesh over the available devices.

    Defaults to all devices on the data axis. Axes are Auto-typed so plain
    ``PartitionSpec`` sharding constraints work under ``jax.set_mesh``.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_spatial
    if n_data * n_spatial != len(devices):
        devices = devices[: n_data * n_spatial]
    dev_array = np.asarray(devices).reshape(n_data, n_spatial)
    return Mesh(dev_array, (DATA_AXIS, SPATIAL_AXIS),
                axis_types=(AxisType.Auto, AxisType.Auto))


def batch_spec() -> P:
    """PartitionSpec sharding the leading (batch) dim over the data axis."""
    return P(DATA_AXIS)


def replicate() -> P:
    return P()


def task_shardings(task: TaskBatch, mesh: Mesh):
    """Per-leaf NamedShardings for a TaskBatch: batch-dim → data axis.

    Internal-grid coordinate vectors and per-grid coordinate vectors
    (leading dim is NOT batch) are replicated.
    """
    batch = task.batch_size

    def spec_for(leaf):
        if leaf.ndim >= 1 and leaf.shape[0] == batch:
            return NamedSharding(mesh, P(DATA_AXIS))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec_for, task)


def shard_task(task: TaskBatch, mesh: Mesh) -> TaskBatch:
    """Place a TaskBatch on the mesh, batch-sharded over the data axis."""
    return jax.tree.map(
        lambda leaf, sh: jax.device_put(leaf, sh), task, task_shardings(task, mesh)
    )


def pad_batch_to_multiple(task: TaskBatch, multiple: int) -> tuple[TaskBatch, int]:
    """Pad the batch dim so it divides the data axis; returns (task, n_real).

    Padding replicates the last task with a zeroed target mask so the loss
    normalisation ignores it entirely.
    """
    import jax.numpy as jnp

    b = task.batch_size
    pad = (-b) % multiple
    if pad == 0:
        return task, b
    batch = b

    def pad_leaf(leaf):
        if leaf.ndim >= 1 and leaf.shape[0] == batch:
            reps = jnp.concatenate([leaf, jnp.repeat(leaf[-1:], pad, axis=0)], 0)
            return reps
        return leaf

    padded = jax.tree.map(pad_leaf, task)
    mask = padded.yt_mask
    mask = mask.at[b:].set(0.0)
    return padded.replace(yt_mask=mask), b
