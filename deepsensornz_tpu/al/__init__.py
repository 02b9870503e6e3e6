"""Active learning: greedy sensor placement with uncertainty acquisition."""

from deepsensornz_tpu.al.greedy import GreedyAlgorithm, Stddev  # noqa: F401
