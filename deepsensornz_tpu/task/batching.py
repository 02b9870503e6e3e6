"""Batch-axis indexing/concat helpers for TaskBatch pytrees."""

from __future__ import annotations

import jax
import numpy as np

from deepsensornz_tpu.task.task import GridContext, PointContext, TaskBatch


def take(task: TaskBatch, idx) -> TaskBatch:
    """Select a sub-batch by integer index array along the batch dim.

    Structure-aware: grid/internal coordinate vectors (not batched) are
    left untouched. jit-safe: traced ``idx`` passes through untouched, so
    ``jax.jit(take)`` compiles ONE gather program — on a remote-device
    backend the eager per-leaf ``y[idx]`` ops each cost a relay round
    trip, which dominates chunked month serving (measured ~2 s/chunk).
    """
    if not isinstance(idx, jax.Array):
        idx = np.asarray(idx)

    def g(gc: GridContext) -> GridContext:
        return GridContext(
            x1=gc.x1, x2=gc.x2, y=gc.y[idx],
            mask=None if gc.mask is None else gc.mask[idx],
        )

    def p(pc: PointContext) -> PointContext:
        return PointContext(x=pc.x[idx], y=pc.y[idx], mask=pc.mask[idx])

    return TaskBatch(
        grids=tuple(g(x) for x in task.grids),
        points=tuple(p(x) for x in task.points),
        xt=task.xt[idx],
        yt=None if task.yt is None else task.yt[idx],
        yt_mask=task.yt_mask[idx],
        yt_aux=None if task.yt_aux is None else task.yt_aux[idx],
        x1g=task.x1g,
        x2g=task.x2g,
    )


def concat(tasks: list[TaskBatch]) -> TaskBatch:
    """Concatenate TaskBatches along the batch dim (shared geometry)."""
    import jax.numpy as jnp

    t0 = tasks[0]

    def cat(getter):
        vals = [getter(t) for t in tasks]
        if vals[0] is None:
            return None
        return jnp.concatenate(vals, axis=0)

    grids = tuple(
        GridContext(
            x1=t0.grids[i].x1, x2=t0.grids[i].x2,
            y=cat(lambda t: t.grids[i].y),
            mask=cat(lambda t: t.grids[i].mask),
        )
        for i in range(len(t0.grids))
    )
    points = tuple(
        PointContext(
            x=cat(lambda t: t.points[i].x),
            y=cat(lambda t: t.points[i].y),
            mask=cat(lambda t: t.points[i].mask),
        )
        for i in range(len(t0.points))
    )
    return TaskBatch(
        grids=grids, points=points,
        xt=cat(lambda t: t.xt), yt=cat(lambda t: t.yt),
        yt_mask=cat(lambda t: t.yt_mask), yt_aux=cat(lambda t: t.yt_aux),
        x1g=t0.x1g, x2g=t0.x2g,
    )
