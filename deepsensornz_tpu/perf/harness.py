"""First-class perf tooling (SURVEY.md §5.1: the TPU replacement for the
reference's ad-hoc ``time.time()`` prints and interactive cProfile).

- :func:`profile_trace` — context manager around ``jax.profiler`` producing
  a TensorBoard-loadable trace directory,
- :func:`benchmark_fn` — compile-once, sync-honest wall-time measurement
  (sync via host fetch of a scalar, robust on remote-device tunnels where
  ``block_until_ready`` can return early),
- :func:`device_memory_stats` — per-device HBM usage,
- :class:`Timer` — labelled wall-clock sections.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import numpy as np


class Timer:
    """Labelled timing sections; ``report()`` prints a sorted table."""

    def __init__(self):
        self.sections: dict[str, float] = {}

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.sections[name] = self.sections.get(name, 0.0) + time.perf_counter() - t0

    def report(self) -> str:
        lines = [
            f"{name:<40s} {t:8.3f}s"
            for name, t in sorted(self.sections.items(), key=lambda kv: -kv[1])
        ]
        out = "\n".join(lines)
        print(out)
        return out


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/jax-trace"):
    """Capture a jax.profiler trace (open with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def _sync(out) -> None:
    """Force execution + completion via a tiny host fetch."""
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[0] if hasattr(leaf, "ravel") else leaf))


def benchmark_fn(fn: Callable, *args, warmup: int = 1, reps: int = 5) -> dict:
    """Median/min wall time of ``fn(*args)`` with honest device sync."""
    for _ in range(warmup):
        _sync(fn(*args))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn(*args))
        times.append(time.perf_counter() - t0)
    return {
        "p50_s": float(np.median(times)),
        "min_s": float(np.min(times)),
        "reps": reps,
    }


def device_memory_stats() -> list[dict]:
    """Per-device memory stats where the backend exposes them."""
    out = []
    for d in jax.devices():
        stats = {}
        try:
            stats = dict(d.memory_stats() or {})
        except Exception:
            pass
        out.append({
            "device": str(d),
            "bytes_in_use": stats.get("bytes_in_use"),
            "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
            "bytes_limit": stats.get("bytes_limit"),
        })
    return out
