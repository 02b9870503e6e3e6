"""SetConv encode/decode — separable-RBF formulation that rides the MXU.

These are the performance-critical ops that in the reference are served by
the ``neuralprocesses`` SetConv scatter/gather lowered to torch/cuDNN
(SURVEY.md §2.1/§2.3; engine call sites ``nzdownscale/downscaler/train.py:238``,
``validate_ERA.py:88-92``). Instead of translating the scatter, we exploit
that the RBF kernel is **separable** over the two coordinate axes:

    k((g1,g2),(p1,p2)) = exp(-(g1-p1)²/2ℓ²) · exp(-(g2-p2)²/2ℓ²)

so scattering N ragged points onto an H×W grid becomes two dense
contractions — ``einsum('bhn,bnwc->bhwc')`` — i.e. batched matmuls that XLA
tiles straight onto the systolic array. Raggedness is handled by padding +
a validity mask folded into the density channel (replacing the reference's
station-count bucketing, ``train.py:448-475``). Gridded context/target sets
are separable on BOTH sides and reduce to two plain matmuls.

A fused Pallas variant (avoiding materialisation of the (B,N,W,C) temp) lives
in :mod:`deepsensornz_tpu.ops.setconv_pallas`; this module is the reference
implementation and the default path (XLA already fuses the exp into the
matmul prologue well).

All functions are shape-polymorphic only in the Python sense: under ``jit``
every shape is static.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_DENSITY_EPS = 1e-8


def _rbf(a: jnp.ndarray, b: jnp.ndarray, lengthscale) -> jnp.ndarray:
    """exp(-(a-b)²/2ℓ²) with broadcasting; computed in f32."""
    d = a.astype(jnp.float32) - b.astype(jnp.float32)
    ls = jnp.asarray(lengthscale, jnp.float32)
    return jnp.exp(-0.5 * jnp.square(d / ls))


def setconv_encode_offgrid(
    x1g: jnp.ndarray,  # (H,) internal grid x1 coords
    x2g: jnp.ndarray,  # (W,) internal grid x2 coords
    x: jnp.ndarray,    # (B, N, 2) off-grid point coords (padded)
    y: jnp.ndarray,    # (B, N, C) values at points (padded)
    mask: jnp.ndarray,  # (B, N) 1.0 = real point, 0.0 = padding
    lengthscale,       # scalar RBF length-scale (learnable)
) -> jnp.ndarray:
    """Scatter a ragged point set onto the internal grid.

    Returns (B, H, W, C+1): channel 0 is the density (kernel-weighted point
    count), channels 1..C are density-normalised values. Padded points
    contribute exactly zero to both (mask folds into the kernel weights).
    """
    w1 = _rbf(x1g[None, :, None], x[:, None, :, 0], lengthscale)  # (B, H, N)
    w2 = _rbf(x2g[None, None, :], x[:, :, None, 1], lengthscale)  # (B, N, W)
    m = mask.astype(jnp.float32)
    y_aug = jnp.concatenate(
        [m[..., None], y.astype(jnp.float32) * m[..., None]], axis=-1
    )  # (B, N, C+1) — density channel first
    t = w2[..., None] * y_aug[:, :, None, :]  # (B, N, W, C+1)
    f = jnp.einsum("bhn,bnwc->bhwc", w1, t, preferred_element_type=jnp.float32)
    density = f[..., :1]
    data = f[..., 1:] / (density + _DENSITY_EPS)
    return jnp.concatenate([density, data], axis=-1)


def setconv_encode_grid(
    x1g: jnp.ndarray,   # (H,) internal grid x1
    x2g: jnp.ndarray,   # (W,) internal grid x2
    xc1: jnp.ndarray,   # (Hc,) context grid x1
    xc2: jnp.ndarray,   # (Wc,) context grid x2
    y: jnp.ndarray,     # (B, Hc, Wc, C) gridded context values
    lengthscale,
    mask: jnp.ndarray | None = None,  # (B, Hc, Wc) validity (NaN-skipping)
) -> jnp.ndarray:
    """Resample a gridded context set onto the internal grid.

    Separable on both axes — two matmuls:
    ``f = A @ (y_aug) @ Bᵀ`` with A=(H,Hc), B=(W,Wc). Returns (B,H,W,C+1)
    with the density channel first, like the off-grid path, so all encoded
    sets share one convention.
    """
    A = _rbf(x1g[:, None], xc1[None, :], lengthscale)  # (H, Hc)
    Bm = _rbf(x2g[:, None], xc2[None, :], lengthscale)  # (W, Wc)
    if mask is None:
        m = jnp.ones(y.shape[:3], jnp.float32)
    else:
        m = mask.astype(jnp.float32)
    y_aug = jnp.concatenate(
        [m[..., None], y.astype(jnp.float32) * m[..., None]], axis=-1
    )  # (B, Hc, Wc, C+1)
    t = jnp.einsum("hi,bijc->bhjc", A, y_aug, preferred_element_type=jnp.float32)
    f = jnp.einsum("wj,bhjc->bhwc", Bm, t, preferred_element_type=jnp.float32)
    density = f[..., :1]
    data = f[..., 1:] / (density + _DENSITY_EPS)
    return jnp.concatenate([density, data], axis=-1)


def setconv_decode_offgrid(
    x1g: jnp.ndarray,   # (H,)
    x2g: jnp.ndarray,   # (W,)
    f: jnp.ndarray,     # (B, H, W, C) internal-grid features
    xt: jnp.ndarray,    # (B, M, 2) target coords (padded)
    lengthscale,
    normalize: bool = True,
) -> jnp.ndarray:
    """Interpolate internal-grid features at off-grid target points.

    Returns (B, M, C). With ``normalize=True`` weights are normalised per
    target (separable normaliser = (Σ_h w1)(Σ_w w2)), making the decode an
    exact weighted interpolation independent of grid density.
    """
    w1 = _rbf(xt[:, :, None, 0], x1g[None, None, :], lengthscale)  # (B, M, H)
    w2 = _rbf(xt[:, :, None, 1], x2g[None, None, :], lengthscale)  # (B, M, W)
    t = jnp.einsum("bmh,bhwc->bmwc", w1, f.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    out = jnp.einsum("bmw,bmwc->bmc", w2, t, preferred_element_type=jnp.float32)
    if normalize:
        z = jnp.sum(w1, -1) * jnp.sum(w2, -1)  # (B, M)
        out = out / (z[..., None] + _DENSITY_EPS)
    return out


def setconv_decode_grid(
    x1g: jnp.ndarray,   # (H,)
    x2g: jnp.ndarray,   # (W,)
    f: jnp.ndarray,     # (B, H, W, C)
    xt1: jnp.ndarray,   # (Ht,) target grid x1
    xt2: jnp.ndarray,   # (Wt,) target grid x2
    lengthscale,
    normalize: bool = True,
) -> jnp.ndarray:
    """Interpolate internal-grid features onto a regular target grid.

    Fully separable: two matmuls, (Ht,H)@(B,H,W,C)@(W,Wt) → (B,Ht,Wt,C).
    This is the op behind full-DEM gridded inference
    (``validate_ERA.py:88-92`` ``model.predict(X_t=ds_elev)``).
    """
    A = _rbf(xt1[:, None], x1g[None, :], lengthscale)  # (Ht, H)
    Bm = _rbf(xt2[:, None], x2g[None, :], lengthscale)  # (Wt, W)
    t = jnp.einsum("th,bhwc->btwc", A, f.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    out = jnp.einsum("uw,btwc->btuc", Bm, t, preferred_element_type=jnp.float32)
    if normalize:
        z = jnp.sum(A, -1)[:, None] * jnp.sum(Bm, -1)[None, :]  # (Ht, Wt)
        out = out / (z[None, ..., None] + _DENSITY_EPS)
    return out
