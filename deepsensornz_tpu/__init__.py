"""deepsensornz_tpu — TPU-native convolutional-neural-process downscaling framework.

A ground-up JAX/XLA/Pallas rebuild of the capability surface of
``oriordanemily/deepsensorNZ`` (ConvNP statistical downscaling of weather over
New Zealand) plus the ``deepsensor``/``neuralprocesses`` engine it consumes.

Layering (bottom-up):

- :mod:`deepsensornz_tpu.ops`      — SetConv encode/decode (separable einsum +
  fused Pallas TPU kernels), internal-grid construction.
- :mod:`deepsensornz_tpu.models`   — U-Net backbone (flax), likelihood heads
  (cnp / gnp low-rank MVN / bernoulli-gamma / cnp-spikes-beta), ConvNP.
- :mod:`deepsensornz_tpu.task`     — fixed-shape padded Task batches + TaskLoader.
- :mod:`deepsensornz_tpu.data`     — Field labeled grids, DataProcessor
  normalisation, NZ data sources (ERA5 / WRF / stations / topography),
  feature engineering (coarsen, TPI, elevation_diff, circular time).
- :mod:`deepsensornz_tpu.parallel` — device mesh + sharding (dp over tasks,
  spatial partitioning of the internal grid).
- :mod:`deepsensornz_tpu.train`    — jitted train step, AdamW + plateau LR,
  early stopping, checkpointing.
- :mod:`deepsensornz_tpu.infer`    — gridded prediction, AR sampling,
  sea-masking, netCDF output.

Everything device-side is functional JAX under ``jit``/``pjit`` with static
shapes; raggedness (varying station counts) is handled by padding + masks.
"""

__version__ = "0.1.0"

import os as _os


def enable_compile_cache(cache_dir=None):
    """Enable JAX's persistent compilation cache (opt-in).

    Compiled executables are serialised to ``cache_dir`` and rehydrated by
    later processes, skipping recompilation of identical programs. On the
    relay-attached TPU the first compile of a process is the dominant fixed
    cost (~2-3 min healthy, 26 min measured on a degraded relay —
    ROUND5_NOTES.md), so a warm cache would pay for itself on the second
    CLI invocation. MEASURED verdict (``perf/compile_cache_probe.py``,
    ``docs/results/compile_cache_probe_r5.json``): CPU rehydrates (~10×
    even on a trivial program — useful for tests/examples/local dev); the
    axon relay backend WRITES entries but a fresh process recompiles
    anyway, so the knob is inert-but-harmless on the TPU path.

    Activated automatically at import when ``DEEPSENSORNZ_COMPILE_CACHE``
    is set (its value = cache dir, or empty for the default
    ``~/.cache/deepsensornz_jax``).
    """
    import jax

    cache_dir = (
        cache_dir
        or _os.environ.get("DEEPSENSORNZ_COMPILE_CACHE")
        or _os.path.join(_os.path.expanduser("~"), ".cache", "deepsensornz_jax")
    )
    _os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Cache everything: even sub-second programs cost a relay round trip.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return cache_dir


if _os.environ.get("DEEPSENSORNZ_COMPILE_CACHE") is not None:
    enable_compile_cache()

from deepsensornz_tpu import config  # noqa: F401

# Convenience top-level API (mirrors the reference's flat deepsensor imports)
from deepsensornz_tpu.data.grid import Dataset, Field, open_dataset, save_dataset  # noqa: F401
from deepsensornz_tpu.data.processor import DataProcessor  # noqa: F401
from deepsensornz_tpu.models.convnp import ConvNP, ConvNPConfig  # noqa: F401
from deepsensornz_tpu.task.loader import TaskLoader  # noqa: F401
from deepsensornz_tpu.task.task import TaskBatch  # noqa: F401
