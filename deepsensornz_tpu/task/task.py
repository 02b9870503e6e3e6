"""Fixed-shape, device-ready Task representation.

The engine-level ``Task`` the reference consumes is a ragged dict
``{time, ops, X_c[], Y_c[], X_t[], Y_t[], Y_t_aux}`` (``nzdownscale/
downscaler/train.py:560-637``) whose varying station counts force
shape-bucketed batching (``train.py:448-475``). On TPU ragged shapes mean
recompilation, so the rebuild's Task is a **static-shape pytree**: point
sets are padded to a fixed capacity with validity masks (masks fold into the
SetConv density channel and the NLL, so padding is mathematically inert).

A ``TaskBatch`` is a pytree (``flax.struct``) and can be sharded over a
device mesh directly (batch axis = data-parallel axis).
"""

from __future__ import annotations

from typing import Optional

import flax.struct as struct
import jax.numpy as jnp
import numpy as np


@struct.dataclass
class GridContext:
    """A gridded context set (base field / aux / landmask) in x-space."""

    x1: jnp.ndarray  # (Hc,) grid x1 coordinates
    x2: jnp.ndarray  # (Wc,) grid x2 coordinates
    y: jnp.ndarray   # (B, Hc, Wc, C) channel values
    mask: Optional[jnp.ndarray] = None  # (B, Hc, Wc); None = fully valid


@struct.dataclass
class PointContext:
    """An off-grid (station) context set, padded to static capacity N."""

    x: jnp.ndarray     # (B, N, 2) coords in x-space; pads arbitrary
    y: jnp.ndarray     # (B, N, C) values; pads arbitrary
    mask: jnp.ndarray  # (B, N) 1.0 = real observation


@struct.dataclass
class TaskBatch:
    """One jittable batch of downscaling tasks (one task = one timestamp)."""

    grids: tuple          # tuple[GridContext, ...]
    points: tuple         # tuple[PointContext, ...]
    xt: jnp.ndarray       # (B, M, 2) target coords (padded)
    yt: Optional[jnp.ndarray]      # (B, M, dy) target values (None at inference)
    yt_mask: jnp.ndarray  # (B, M)
    yt_aux: Optional[jnp.ndarray]  # (B, M, A) aux-at-targets (highres topo)
    x1g: jnp.ndarray      # (H,) internal grid x1
    x2g: jnp.ndarray      # (W,) internal grid x2

    @property
    def batch_size(self) -> int:
        return self.xt.shape[0]

    @property
    def num_targets(self) -> int:
        return self.xt.shape[1]

    def cast_to_float32(self) -> "TaskBatch":
        """Parity with ``task.cast_to_float32`` (``validate_ERA.py:80-81``)."""
        import jax

        def cast(x):
            if x is not None and jnp.issubdtype(x.dtype, jnp.floating):
                return x.astype(jnp.float32)
            return x

        return jax.tree.map(cast, self)


def pad_points(
    x: np.ndarray, y: np.ndarray, capacity: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pad (N,2)/(N,C) point arrays to ``capacity`` rows; returns mask too.

    Pad coordinates are placed far outside the unit domain so their RBF
    weight underflows to exactly 0 even before masking.
    """
    n = x.shape[0]
    if n > capacity:
        raise ValueError(f"{n} points exceed capacity {capacity}")
    xp = np.full((capacity, 2), -1e3, dtype=np.float32)
    yp = np.zeros((capacity,) + y.shape[1:], dtype=np.float32)
    mask = np.zeros((capacity,), dtype=np.float32)
    xp[:n] = x
    yp[:n] = np.nan_to_num(y)
    mask[:n] = 1.0
    return xp, yp, mask
