"""Fused Pallas TPU kernels for the SetConv hot ops.

These are the "native kernel" implementations of the two ops that dominate
the non-U-Net compute (SURVEY.md §2.1 — in the reference these are the
neuralprocesses SetConv scatter/gather served by torch/cuDNN):

- :func:`encode_offgrid` — ragged-point scatter onto the internal grid.
  The pure-JAX separable path (:mod:`.setconv`) materialises a
  (B, N, W, C+1) temporary in HBM; this kernel computes the RBF weight
  blocks **in VMEM on the fly** and fuses the two contractions, so HBM
  traffic is just inputs + the (B, H, W, C+1) output.
- :func:`decode_grid` — internal grid → regular target grid, i.e.
  ``A @ f @ Bᵀ``. Fused into one kernel: per (target-tile) the H-loop
  accumulates ``A_blk @ f_blk @ B_blkᵀ`` in a VMEM accumulator, never
  writing the (Ht, W, C) intermediate to HBM.

Correctness contract: bit-tolerance-equal to the pure-JAX reference
implementations (tested in ``tests/test_setconv_pallas.py`` via interpret
mode on CPU and compiled on TPU).

Layout rules honoured (pallas_guide.md): ≥2-D operands, lane dim 128,
f32 accumulation via ``preferred_element_type``, static grid/block shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deepsensornz_tpu.ops import setconv as _ref

_DENSITY_EPS = 1e-8


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


# ---------------------------------------------------------------------------
# encoder: off-grid points → internal grid
# ---------------------------------------------------------------------------


def _encode_kernel(x1g_ref, x2g_ref, px_ref, yaug_ref, ls_ref, out_ref):
    """One (batch, H-tile, W-tile) program.

    x1g_ref: (1, TH) grid x1 block       px_ref: (1, N, 2) points (this batch)
    x2g_ref: (1, TW) grid x2 block       yaug_ref: (1, N, C1) mask-folded values
    ls_ref:  (1, 1) lengthscale (SMEM)   out_ref: (1, TH, TW, C1)
    """
    ls = ls_ref[0, 0]
    inv2 = 0.5 / (ls * ls)
    px1 = px_ref[0, :, 0]                      # (N,)
    px2 = px_ref[0, :, 1]                      # (N,)
    g1 = x1g_ref[0, :]                         # (TH,)
    g2 = x2g_ref[0, :]                         # (TW,)
    # w1: (TH, N); w2: (N, TW) — VPU exponentials on VMEM blocks
    d1 = g1[:, None] - px1[None, :]
    w1 = jnp.exp(-inv2 * d1 * d1)
    d2 = px2[:, None] - g2[None, :]
    w2 = jnp.exp(-inv2 * d2 * d2)
    yaug = yaug_ref[0]                         # (N, C1)
    n, c1 = yaug.shape
    tw = w2.shape[1]
    # t[n, w, c] = w2[n, w] * yaug[n, c]  → reshape to (N, TW*C1) for the MXU
    t = (w2[:, :, None] * yaug[:, None, :]).reshape(n, tw * c1)
    out = jnp.dot(w1, t, preferred_element_type=jnp.float32)  # (TH, TW*C1)
    out_ref[0] = out.reshape(w1.shape[0], tw, c1)


@functools.partial(jax.jit, static_argnames=("th", "tw", "interpret"))
def encode_offgrid(
    x1g: jnp.ndarray,   # (H,)
    x2g: jnp.ndarray,   # (W,)
    x: jnp.ndarray,     # (B, N, 2)
    y: jnp.ndarray,     # (B, N, C)
    mask: jnp.ndarray,  # (B, N)
    lengthscale,
    th: int = 128,
    tw: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused SetConv encode. Returns (B, H, W, C+1), density channel first."""
    B, N, C = y.shape
    H, W = x1g.shape[0], x2g.shape[0]
    th = min(th, H)
    tw = min(tw, W)
    m = mask.astype(jnp.float32)
    yaug = jnp.concatenate([m[..., None], y.astype(jnp.float32) * m[..., None]], -1)
    ls = jnp.asarray(lengthscale, jnp.float32).reshape(1, 1)
    x1g2 = x1g.astype(jnp.float32).reshape(1, H)
    x2g2 = x2g.astype(jnp.float32).reshape(1, W)

    grid = (B, _cdiv(H, th), _cdiv(W, tw))
    out = pl.pallas_call(
        _encode_kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, W, C + 1), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, th), lambda b, i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tw), lambda b, i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, 2), lambda b, i, j: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, C + 1), lambda b, i, j: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda b, i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, tw, C + 1), lambda b, i, j: (b, i, j, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(x1g2, x2g2, x.astype(jnp.float32), yaug, ls)

    density = out[..., :1]
    data = out[..., 1:] / (density + _DENSITY_EPS)
    return jnp.concatenate([density, data], axis=-1)


# ---------------------------------------------------------------------------
# decoder: internal grid → regular target grid (A @ f @ Bᵀ fused)
# ---------------------------------------------------------------------------


def _decode_kernel(a_ref, b_ref, f_ref, out_ref, acc_ref):
    """Program over (batch, target-H tile, source-H block).

    a_ref: (TT, SH) target-x1 × source-x1 weight block
    b_ref: (W, TU) target-x2 weights for the full target-x2 extent
    f_ref: (1, SH, W, C) grid features for this source block
    out_ref: (1, TT, TU, C) output block
    acc_ref: (TT, TU, C) VMEM scratch accumulator (f32) — note pallas
             passes refs as (inputs..., outputs..., scratch...)
    """
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    a = a_ref[...]                 # (TT, SH)
    f = f_ref[0]                   # (SH, W, C)
    sh, w, c = f.shape
    # stage 1: contract source-x1: (TT, SH) @ (SH, W*C) → (TT, W, C)
    t = jnp.dot(a, f.reshape(sh, w * c), preferred_element_type=jnp.float32)
    t = t.reshape(a.shape[0], w, c)
    # stage 2: contract source-x2 with target-x2 weights: (W, TU)
    b = b_ref[...]                 # (W, TU)
    # (TT, W, C) × (W, TU) → (TT, TU, C): move W next to contraction
    out = jax.lax.dot_general(
        t, b, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TT, C, TU)? dot_general contracting t dim1 with b dim0 → (TT, C, TU)
    out = jnp.transpose(out, (0, 2, 1))
    acc_ref[...] += out

    @pl.when(k == nk - 1)
    def _():
        out_ref[0] = acc_ref[...]


@functools.partial(jax.jit, static_argnames=("tt", "sh", "interpret"))
def decode_grid(
    x1g: jnp.ndarray,   # (H,)
    x2g: jnp.ndarray,   # (W,)
    f: jnp.ndarray,     # (B, H, W, C)
    xt1: jnp.ndarray,   # (Ht,)
    xt2: jnp.ndarray,   # (Wt,)
    lengthscale,
    normalize: bool = True,
    tt: int = 128,
    sh: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused gridded SetConv decode. Returns (B, Ht, Wt, C)."""
    B, H, W, C = f.shape
    Ht, Wt = xt1.shape[0], xt2.shape[0]
    tt = min(tt, Ht)
    sh = min(sh, H)
    ls = jnp.asarray(lengthscale, jnp.float32)

    def rbf(a, b):
        d = a.astype(jnp.float32)[:, None] - b.astype(jnp.float32)[None, :]
        return jnp.exp(-0.5 * jnp.square(d / ls))

    A = rbf(xt1, x1g)      # (Ht, H)
    Bm = rbf(x2g, xt2)     # (W, Wt)

    grid = (B, _cdiv(Ht, tt), _cdiv(H, sh))
    out = pl.pallas_call(
        _decode_kernel,
        out_shape=jax.ShapeDtypeStruct((B, Ht, Wt, C), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tt, sh), lambda b, i, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, Wt), lambda b, i, k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sh, W, C), lambda b, i, k: (b, k, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tt, Wt, C), lambda b, i, k: (b, i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((tt, Wt, C), jnp.float32)],
        interpret=interpret,
    )(A, Bm, f.astype(jnp.float32))

    if normalize:
        z = jnp.sum(A, -1)[:, None] * jnp.sum(Bm, 0)[None, :]
        out = out / (z[None, ..., None] + _DENSITY_EPS)
    return out


# ---------------------------------------------------------------------------
# dispatch: pallas on TPU, pure JAX elsewhere
# ---------------------------------------------------------------------------


def use_pallas() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def setconv_encode_offgrid_best(x1g, x2g, x, y, mask, lengthscale):
    if use_pallas():
        return encode_offgrid(x1g, x2g, x, y, mask, lengthscale)
    return _ref.setconv_encode_offgrid(x1g, x2g, x, y, mask, lengthscale)


def setconv_decode_grid_best(x1g, x2g, f, xt1, xt2, lengthscale, normalize=True):
    if use_pallas():
        return decode_grid(x1g, x2g, f, xt1, xt2, lengthscale, normalize=normalize)
    return _ref.setconv_decode_grid(x1g, x2g, f, xt1, xt2, lengthscale, normalize=normalize)
