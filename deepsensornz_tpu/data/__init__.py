"""Host-side data layer: labeled grids, normalisation, NZ sources, features."""

from deepsensornz_tpu.data.grid import Field, Dataset, open_dataset, save_dataset  # noqa: F401
from deepsensornz_tpu.data.processor import DataProcessor  # noqa: F401
