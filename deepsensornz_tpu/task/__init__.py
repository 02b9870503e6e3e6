"""Fixed-shape Task batches and the TaskLoader."""

from deepsensornz_tpu.task.task import TaskBatch, GridContext, PointContext  # noqa: F401
from deepsensornz_tpu.task.loader import TaskLoader  # noqa: F401
