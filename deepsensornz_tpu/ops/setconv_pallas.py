"""Fused Pallas TPU kernels for the SetConv hot ops.

STATUS (measured, round 2 — docs/perf_setconv.md): XLA's einsum path beats
these kernels at every size (decode 2.5-5×; encode is sub-millisecond on
both), so ``ConvNPConfig.use_pallas`` defaults to False and these remain as
(a) the strict-f32-accumulation option (XLA's f32 matmul on TPU is
bf16-precision; these are the MORE accurate path) and (b) the
hardware-verified worked example of the Mosaic kernel constraints.

These are the "native kernel" implementations of the two ops that dominate
the non-U-Net compute (SURVEY.md §2.1 — in the reference these are the
neuralprocesses SetConv scatter/gather served by torch/cuDNN):

- :func:`encode_offgrid` — ragged-point scatter onto the internal grid.
  The pure-JAX separable path (:mod:`.setconv`) materialises a
  (B, N, W, C+1) temporary in HBM; this kernel computes the RBF weight
  blocks **in VMEM on the fly** and fuses the two contractions, so HBM
  traffic is just inputs + the output.
- :func:`decode_grid` — internal grid → regular target grid, i.e.
  ``A @ f @ Bᵀ``. Fused into one kernel: per target tile the source-H loop
  accumulates ``A_blk @ f_blk @ B`` in a VMEM accumulator, never writing
  the (Ht, W, C) intermediate to HBM.

Mosaic-friendly formulation: all contractions are strict 2-D matmuls
(channel dimension handled by a statically-unrolled loop in channel-first
layout) — no >2-D reshapes/transposes inside the kernel, which the TPU
vector-layout pass rejects (``unsupported shape cast``). The wrappers do
the cheap NHWC↔NCHW transposes in XLA.

Correctness contract: matches the pure-JAX reference implementations
(tested in ``tests/test_setconv_pallas.py`` via interpret mode on CPU and
compiled on TPU).
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


def _encode_kernel(x1g_ref, x2g_ref, px_ref, yaug_ref, ls_ref, out_ref,
                   *, mxu_bf16: bool):
    """One (batch, H-tile, W-tile, N-block) program. Channel-first output.

    The point set is BLOCKED over the grid's minor-most dimension: each
    program sees only NB points, and the output block — revisited for every
    N-block of the same (b, i, j) — is the accumulator (the same
    revisit-accumulation pattern as the decoder; VMEM scratch did not
    survive grid steps on hardware). Scales to arbitrary N without blowing
    VMEM (round 1 loaded the full point set per program).

    x1g_ref: (1, TH) grid x1 block       px_ref: (1, NB, 2) point block
    x2g_ref: (1, TW) grid x2 block       yaug_ref: (1, C1, NB) mask-folded values
    ls_ref:  (1, 1) lengthscale (SMEM)   out_ref: (1, C1, TH, TW)
    """
    n = pl.program_id(3)

    @pl.when(n == 0)
    def _():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    ls = ls_ref[0, 0]
    inv2 = 0.5 / (ls * ls)
    px1 = px_ref[0, :, 0]                      # (NB,)
    px2 = px_ref[0, :, 1]                      # (NB,)
    g1 = x1g_ref[0, :]                         # (TH,)
    g2 = x2g_ref[0, :]                         # (TW,)
    d1 = g1[:, None] - px1[None, :]
    w1 = jnp.exp(-inv2 * d1 * d1)              # (TH, NB)
    d2 = px2[:, None] - g2[None, :]
    w2 = jnp.exp(-inv2 * d2 * d2)              # (NB, TW)
    if mxu_bf16:
        # bf16 MXU passes with f32 accumulate — XLA's own default f32-matmul
        # numerics on TPU, ~2× the MXU rate of the strict-f32 path
        w1 = w1.astype(jnp.bfloat16)
        w2 = w2.astype(jnp.bfloat16)
    c1 = out_ref.shape[1]
    for c in range(c1):  # static unroll over channels (density + values)
        t = w2 * yaug_ref[0, c, :][:, None].astype(w2.dtype)   # (NB, TW)
        out_ref[0, c] += jnp.dot(w1, t, preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("th", "tw", "nb", "mxu_bf16",
                                             "interpret"))
def encode_offgrid(
    x1g: jnp.ndarray,   # (H,)
    x2g: jnp.ndarray,   # (W,)
    x: jnp.ndarray,     # (B, N, 2)
    y: jnp.ndarray,     # (B, N, C)
    mask: jnp.ndarray,  # (B, N)
    lengthscale,
    th: int = 256,
    tw: int = 256,
    nb: int = 1024,
    mxu_bf16: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused SetConv encode. Returns (B, H, W, C+1), density channel first."""
    B, N, C = y.shape
    H, W = x1g.shape[0], x2g.shape[0]
    if N == 0:  # degenerate empty point set: pure-density zeros, like the
        # reference path (the N-block arithmetic below would divide by zero)
        return jnp.zeros((B, H, W, C + 1), jnp.float32)
    th = min(th, H)
    tw = min(tw, W)
    # the N-block is yaug's LAST block dim: keep it 128-aligned (Mosaic
    # rejects last block dims that do not divide 128) and never larger than
    # the 128-rounded point count
    nb = min(nb, _cdiv(N, 128) * 128)
    m = mask.astype(jnp.float32)
    yaug = jnp.concatenate([m[..., None], y.astype(jnp.float32) * m[..., None]], -1)
    yaug_cf = jnp.transpose(yaug, (0, 2, 1))   # (B, C1, N)
    ls = jnp.asarray(lengthscale, jnp.float32).reshape(1, 1)
    x1g2 = x1g.astype(jnp.float32).reshape(1, H)
    x2g2 = x2g.astype(jnp.float32).reshape(1, W)
    px = x.astype(jnp.float32)

    # zero-pad the point dim to a block multiple: padded points get mask 0
    # (zero yaug) so they contribute nothing, and coordinate 0 keeps the RBF
    # finite (partial INPUT blocks would otherwise read garbage memory)
    Np = _cdiv(N, nb) * nb
    if Np != N:
        px = jnp.pad(px, ((0, 0), (0, Np - N), (0, 0)))
        yaug_cf = jnp.pad(yaug_cf, ((0, 0), (0, 0), (0, Np - N)))

    grid = (B, _cdiv(H, th), _cdiv(W, tw), Np // nb)
    out = pl.pallas_call(
        functools.partial(_encode_kernel, mxu_bf16=mxu_bf16),
        out_shape=jax.ShapeDtypeStruct((B, C + 1, H, W), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, th), lambda b, i, j, n: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tw), lambda b, i, j, n: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb, 2), lambda b, i, j, n: (b, n, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C + 1, nb), lambda b, i, j, n: (b, 0, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda b, i, j, n: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, C + 1, th, tw), lambda b, i, j, n: (b, 0, i, j), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(x1g2, x2g2, px, yaug_cf, ls)

    out = jnp.transpose(out, (0, 2, 3, 1))     # → (B, H, W, C1)
    density = out[..., :1]
    data = out[..., 1:] / (density + _DENSITY_EPS)
    return jnp.concatenate([density, data], axis=-1)


# ---------------------------------------------------------------------------
# decoder: internal grid → regular target grid (A @ f @ Bᵀ fused)
# ---------------------------------------------------------------------------


def _decode_kernel(a_ref, b_ref, f_ref, out_ref):
    """Program over (batch, channel block, target-H tile, source-H block,
    source-W block). Channel-first. Both source dims accumulate (the
    contraction is additive in H and W blocks); the output block acts as the
    accumulator — it stays resident in VMEM across the (k, l) revisits
    (same output index) and is written back to HBM once, on the last visit.

    Channels are a GRID dimension with a small per-program block (not a full
    unroll): large (128×128)·(128×·) matmuls per channel keep the MXU busy,
    where a TT=16 tile ran at ~10% utilisation.

    a_ref: (TT, SH) target-x1 × source-x1 weights (this H block)
    b_ref: (SW, TU) source-x2 × target-x2 weights (this W block)
    f_ref: (1, CB, SH, SW) grid features (this channel/source block)
    out_ref: (1, CB, TT, TU) output block / accumulator
    """
    k = pl.program_id(3)
    l = pl.program_id(4)

    @pl.when(jnp.logical_and(k == 0, l == 0))
    def _():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    a = a_ref[...]                 # (TT, SH)
    b = b_ref[...]                 # (SW, TU)
    cb = out_ref.shape[1]
    for c in range(cb):            # small static unroll: two 2-D matmuls
        t = jnp.dot(a, f_ref[0, c], preferred_element_type=jnp.float32)  # (TT, SW)
        out_ref[0, c] += jnp.dot(t, b, preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("tt", "sh", "sw", "cb", "interpret"))
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
    sw: int = 128,
    cb: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused gridded SetConv decode. Returns (B, Ht, Wt, C)."""
    B, H, W, C = f.shape
    Ht, Wt = xt1.shape[0], xt2.shape[0]
    tt = min(tt, Ht)
    sh = min(sh, H)
    sw = min(sw, W)
    cb = min(cb, C)
    ls = jnp.asarray(lengthscale, jnp.float32)

    def rbf(a, b):
        d = a.astype(jnp.float32)[:, None] - b.astype(jnp.float32)[None, :]
        return jnp.exp(-0.5 * jnp.square(d / ls))

    A = rbf(xt1, x1g)      # (Ht, H)
    Bm = rbf(x2g, xt2)     # (W, Wt)
    f_cf = jnp.transpose(f.astype(jnp.float32), (0, 3, 1, 2))  # (B, C, H, W)

    # zero-pad the SOURCE dims (and channel blocks) to tile multiples:
    # partial input blocks read unspecified memory beyond the array edge,
    # and the accumulation would fold that garbage in (verified on
    # hardware). Zero A-columns/B-rows make padded source cells contribute
    # exactly nothing.
    Hp = _cdiv(H, sh) * sh
    Wp = _cdiv(W, sw) * sw
    Cp = _cdiv(C, cb) * cb
    if Hp != H:
        A = jnp.pad(A, ((0, 0), (0, Hp - H)))
        f_cf = jnp.pad(f_cf, ((0, 0), (0, 0), (0, Hp - H), (0, 0)))
    if Wp != W:
        Bm = jnp.pad(Bm, ((0, Wp - W), (0, 0)))
        f_cf = jnp.pad(f_cf, ((0, 0), (0, 0), (0, 0), (0, Wp - W)))
    if Cp != C:
        f_cf = jnp.pad(f_cf, ((0, 0), (0, Cp - C), (0, 0), (0, 0)))

    grid = (B, Cp // cb, _cdiv(Ht, tt), _cdiv(H, sh), _cdiv(W, sw))
    out = pl.pallas_call(
        _decode_kernel,
        out_shape=jax.ShapeDtypeStruct((B, Cp, Ht, Wt), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tt, sh), lambda b, c, i, k, l: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((sw, Wt), lambda b, c, i, k, l: (l, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cb, sh, sw), lambda b, c, i, k, l: (b, c, k, l), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, cb, tt, Wt), lambda b, c, i, k, l: (b, c, i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(A, Bm, f_cf)
    out = out[:, :C]

    out = jnp.transpose(out, (0, 2, 3, 1))     # → (B, Ht, Wt, C)
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
