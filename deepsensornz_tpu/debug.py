"""Debug configuration: NaN trapping + determinism.

SURVEY.md §5.2: the reference has no sanitizers (single-device torch); the
TPU-build analog is XLA-level NaN checking and deterministic-ops flags for
debug runs (enable before any computation runs).
"""

from __future__ import annotations

import jax


def enable_debug(nans: bool = True, disable_jit: bool = False,
                 x64: bool = False) -> None:
    """Turn on debug behaviour (tiny-config runs only; big perf cost).

    - ``nans``: raise on any NaN produced inside jitted code
      (``jax.config.debug_nans``),
    - ``disable_jit``: run op-by-op for stepping through with a debugger,
    - ``x64``: double precision to isolate precision bugs.
    """
    if nans:
        jax.config.update("jax_debug_nans", True)
    if disable_jit:
        jax.config.update("jax_disable_jit", True)
    if x64:
        jax.config.update("jax_enable_x64", True)


def disable_debug() -> None:
    jax.config.update("jax_debug_nans", False)
    jax.config.update("jax_disable_jit", False)
