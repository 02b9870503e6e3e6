"""Device-side compute primitives (pure JAX + Pallas TPU kernels)."""

from deepsensornz_tpu.ops.grids import internal_grid, infer_internal_density  # noqa: F401
from deepsensornz_tpu.ops.setconv import (  # noqa: F401
    setconv_encode_offgrid,
    setconv_encode_grid,
    setconv_decode_offgrid,
    setconv_decode_grid,
)
