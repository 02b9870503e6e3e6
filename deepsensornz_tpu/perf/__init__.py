"""Performance harness: profiling, timing, device-memory reporting."""

from deepsensornz_tpu.perf.harness import (  # noqa: F401
    Timer,
    profile_trace,
    device_memory_stats,
    benchmark_fn,
)
