"""Device mesh + sharding: the distributed layer the reference never had.

The reference is strictly single-device (SURVEY.md §2.1: one GPU pinned per
process, scale-out by launching one process per year). Here parallelism is a
first-class design axis:

- **data parallelism** over tasks/timestamps (batch axis sharded over the
  ``data`` mesh axis; XLA inserts psum for the gradient reduction over ICI),
- **spatial partitioning** of the internal grid over the ``spatial`` axis
  (XLA SPMD partitions the U-Net convolutions with automatic halo exchange)
  — the TPU substitute for the reference's "coarsen inputs until the model
  fits in memory" (``preprocess.py:497-498``).
"""

from deepsensornz_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_task,
    batch_spec,
    replicate,
)
