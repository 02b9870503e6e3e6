"""Prebuilt task caches: serialize TaskBatches to disk, stream them back.

SURVEY.md §7 ("ragged host pipeline kept off the critical path via prebuilt
task caches"): for production training over years of real archives, task
materialisation (netCDF reads + packing) happens ONCE; epochs then stream
fixed-shape batches from flat ``.npz`` shards with zero pandas/h5 work on
the critical path. The reference's analog is materialising tasks once per
run and reusing them every epoch (``train.py:192-193``) — but in RAM only;
shards make the cache durable and bigger-than-RAM.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Iterator

import numpy as np

from deepsensornz_tpu.task.task import GridContext, PointContext, TaskBatch


def _flatten(task: TaskBatch) -> tuple[dict, dict]:
    arrays: dict[str, np.ndarray] = {}
    meta = {"n_grids": len(task.grids), "n_points": len(task.points),
            "has_yt": task.yt is not None, "has_aux": task.yt_aux is not None}
    for i, g in enumerate(task.grids):
        arrays[f"g{i}_x1"] = np.asarray(g.x1)
        arrays[f"g{i}_x2"] = np.asarray(g.x2)
        arrays[f"g{i}_y"] = np.asarray(g.y)
        if g.mask is not None:
            arrays[f"g{i}_mask"] = np.asarray(g.mask)
    for i, p in enumerate(task.points):
        arrays[f"p{i}_x"] = np.asarray(p.x)
        arrays[f"p{i}_y"] = np.asarray(p.y)
        arrays[f"p{i}_mask"] = np.asarray(p.mask)
    arrays["xt"] = np.asarray(task.xt)
    if task.yt is not None:
        arrays["yt"] = np.asarray(task.yt)
    arrays["yt_mask"] = np.asarray(task.yt_mask)
    if task.yt_aux is not None:
        arrays["yt_aux"] = np.asarray(task.yt_aux)
    arrays["x1g"] = np.asarray(task.x1g)
    arrays["x2g"] = np.asarray(task.x2g)
    return arrays, meta


def _unflatten(arrays, meta) -> TaskBatch:
    import jax.numpy as jnp

    grids = tuple(
        GridContext(
            x1=jnp.asarray(arrays[f"g{i}_x1"]),
            x2=jnp.asarray(arrays[f"g{i}_x2"]),
            y=jnp.asarray(arrays[f"g{i}_y"]),
            mask=jnp.asarray(arrays[f"g{i}_mask"]) if f"g{i}_mask" in arrays else None,
        )
        for i in range(meta["n_grids"])
    )
    points = tuple(
        PointContext(
            x=jnp.asarray(arrays[f"p{i}_x"]),
            y=jnp.asarray(arrays[f"p{i}_y"]),
            mask=jnp.asarray(arrays[f"p{i}_mask"]),
        )
        for i in range(meta["n_points"])
    )
    return TaskBatch(
        grids=grids, points=points,
        xt=jnp.asarray(arrays["xt"]),
        yt=jnp.asarray(arrays["yt"]) if meta["has_yt"] else None,
        yt_mask=jnp.asarray(arrays["yt_mask"]),
        yt_aux=jnp.asarray(arrays["yt_aux"]) if meta["has_aux"] else None,
        x1g=jnp.asarray(arrays["x1g"]),
        x2g=jnp.asarray(arrays["x2g"]),
    )


class TaskCache:
    """Directory of fixed-shape TaskBatch shards."""

    def __init__(self, cache_dir: str):
        self.cache_dir = cache_dir

    # -- writing -----------------------------------------------------------------

    def build(self, task_loader, times, shard_size: int = 32, **task_kwargs) -> int:
        """Materialise tasks for ``times`` into npz shards; returns #shards."""
        os.makedirs(self.cache_dir, exist_ok=True)
        times = list(times)
        n_shards = 0
        for s in range(0, len(times), shard_size):
            chunk = times[s: s + shard_size]
            task = task_loader(chunk, **task_kwargs)
            arrays, meta = _flatten(task)
            path = os.path.join(self.cache_dir, f"shard_{n_shards:05d}.npz")
            np.savez_compressed(path, **arrays)
            with open(path + ".json", "w") as f:
                json.dump({**meta, "times": [str(t) for t in chunk]}, f)
            n_shards += 1
        return n_shards

    # -- reading ------------------------------------------------------------------

    def shards(self) -> list[str]:
        return sorted(glob.glob(os.path.join(self.cache_dir, "shard_*.npz")))

    def load_shard(self, path: str) -> TaskBatch:
        with np.load(path) as z:
            arrays = {k: z[k] for k in z.files}
        with open(path + ".json") as f:
            meta = json.load(f)
        return _unflatten(arrays, meta)

    def __iter__(self) -> Iterator[TaskBatch]:
        for path in self.shards():
            yield self.load_shard(path)

    def iter_epochs(self, n_epochs: int, shuffle: bool = True,
                    seed: int = 0, prefetch: int = 2) -> Iterator[TaskBatch]:
        """Stream shards for several epochs with per-epoch shard shuffling.

        ``prefetch`` > 0 decodes upcoming shards on a background thread so
        disk/decompress latency overlaps the device step.
        """
        rng = np.random.default_rng(seed)
        paths = self.shards()

        def gen():
            for _ in range(n_epochs):
                order = rng.permutation(len(paths)) if shuffle else np.arange(len(paths))
                for i in order:
                    yield self.load_shard(paths[i])

        return prefetch_iterator(gen(), depth=prefetch) if prefetch else gen()


def prefetch_iterator(it: Iterator, depth: int = 2) -> Iterator:
    """Run an iterator on a background thread with a bounded queue —
    host-side shard loading overlaps device compute."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    _END = object()

    def worker():
        try:
            for item in it:
                q.put(item)
            q.put(_END)
        except BaseException as e:  # surface errors on the consumer side
            q.put(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            return
        if isinstance(item, BaseException):
            raise item
        yield item
