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

from deepsensornz_tpu import config  # noqa: F401

# Convenience top-level API (mirrors the reference's flat deepsensor imports)
from deepsensornz_tpu.data.grid import Dataset, Field, open_dataset, save_dataset  # noqa: F401
from deepsensornz_tpu.data.processor import DataProcessor  # noqa: F401
from deepsensornz_tpu.models.convnp import ConvNP, ConvNPConfig  # noqa: F401
from deepsensornz_tpu.task.loader import TaskLoader  # noqa: F401
from deepsensornz_tpu.task.task import TaskBatch  # noqa: F401
