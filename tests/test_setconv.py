"""SetConv encode/decode: separable einsum vs brute-force reference math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepsensornz_tpu.ops.grids import default_lengthscale, infer_internal_density, internal_grid
from deepsensornz_tpu.ops.setconv import (
    setconv_decode_grid,
    setconv_decode_offgrid,
    setconv_encode_grid,
    setconv_encode_offgrid,
)

jax.config.update("jax_enable_x64", False)

# TPU's default f32 matmul runs bf16 passes; CPU is exact f32
_RTOL, _ATOL = ((2e-4, 1e-5) if jax.default_backend() == "cpu" else (3e-2, 5e-3))


def brute_encode(x1g, x2g, x, y, mask, ls):
    """O(H·W·N) direct scatter — ground truth for the separable version."""
    B, N, C = y.shape
    H, W = len(x1g), len(x2g)
    out = np.zeros((B, H, W, C + 1))
    for b in range(B):
        for h in range(H):
            for w in range(W):
                d2 = (x1g[h] - x[b, :, 0]) ** 2 + (x2g[w] - x[b, :, 1]) ** 2
                k = np.exp(-0.5 * d2 / ls**2) * mask[b]
                dens = k.sum()
                out[b, h, w, 0] = dens
                out[b, h, w, 1:] = (k[:, None] * y[b]).sum(0) / (dens + 1e-8)
    return out


def test_encode_offgrid_matches_bruteforce(rng):
    H, W, B, N, C = 12, 10, 2, 7, 2
    x1g = np.linspace(0, 1, H).astype(np.float32)
    x2g = np.linspace(0, 1, W).astype(np.float32)
    x = rng.random((B, N, 2)).astype(np.float32)
    y = rng.normal(size=(B, N, C)).astype(np.float32)
    mask = (rng.random((B, N)) > 0.3).astype(np.float32)
    ls = 0.15
    got = np.asarray(setconv_encode_offgrid(x1g, x2g, x, y, mask, ls))
    want = brute_encode(x1g, x2g, x, y, mask, ls)
    np.testing.assert_allclose(got, want, rtol=_RTOL, atol=_ATOL)


def test_encode_padding_is_inert(rng):
    """Extra padded slots must not change the encoding at all."""
    H, W, B, N, C = 8, 8, 1, 5, 1
    x1g = np.linspace(0, 1, H).astype(np.float32)
    x2g = np.linspace(0, 1, W).astype(np.float32)
    x = rng.random((B, N, 2)).astype(np.float32)
    y = rng.normal(size=(B, N, C)).astype(np.float32)
    mask = np.ones((B, N), np.float32)
    a = np.asarray(setconv_encode_offgrid(x1g, x2g, x, y, mask, 0.2))
    xp = np.concatenate([x, np.full((B, 3, 2), -1e3, np.float32)], 1)
    yp = np.concatenate([y, np.full((B, 3, C), 77.0, np.float32)], 1)
    mp = np.concatenate([mask, np.zeros((B, 3), np.float32)], 1)
    b = np.asarray(setconv_encode_offgrid(x1g, x2g, xp, yp, mp, 0.2))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_encode_grid_matches_offgrid_flattened(rng):
    """Gridded encode == off-grid encode of the flattened grid points."""
    H, W = 16, 16
    Hc, Wc = 5, 6
    B, C = 2, 2
    x1g = np.linspace(0, 1, H).astype(np.float32)
    x2g = np.linspace(0, 1, W).astype(np.float32)
    xc1 = np.linspace(0.1, 0.9, Hc).astype(np.float32)
    xc2 = np.linspace(0.1, 0.9, Wc).astype(np.float32)
    y = rng.normal(size=(B, Hc, Wc, C)).astype(np.float32)
    ls = 0.1
    got = np.asarray(setconv_encode_grid(x1g, x2g, xc1, xc2, y, ls))
    pts = np.stack(np.meshgrid(xc1, xc2, indexing="ij"), -1).reshape(1, -1, 2)
    pts = np.repeat(pts, B, 0).astype(np.float32)
    yflat = y.reshape(B, -1, C)
    mask = np.ones((B, Hc * Wc), np.float32)
    want = np.asarray(setconv_encode_offgrid(x1g, x2g, pts, yflat, mask, ls))
    np.testing.assert_allclose(got, want, rtol=_RTOL, atol=_ATOL)


def test_decode_offgrid_interpolates_smooth_field():
    """Decoding a linear field at grid nodes reproduces it (normalised weights)."""
    H, W = 48, 48
    x1g = np.linspace(0, 1, H).astype(np.float32)
    x2g = np.linspace(0, 1, W).astype(np.float32)
    f = (x1g[:, None] + 2 * x2g[None, :])[None, :, :, None].astype(np.float32)
    xt = np.array([[[0.31, 0.52], [0.77, 0.18], [0.5, 0.5]]], np.float32)
    ls = default_lengthscale(H)  # ~2 grid spacings
    out = np.asarray(setconv_decode_offgrid(x1g, x2g, f, xt, ls))
    want = xt[..., 0] + 2 * xt[..., 1]
    np.testing.assert_allclose(out[..., 0], want, atol=5e-3)


def test_decode_grid_matches_offgrid(rng):
    H, W, B, C = 20, 18, 2, 3
    Ht, Wt = 7, 9
    x1g = np.linspace(0, 1, H).astype(np.float32)
    x2g = np.linspace(0, 1, W).astype(np.float32)
    f = rng.normal(size=(B, H, W, C)).astype(np.float32)
    xt1 = np.linspace(0.2, 0.8, Ht).astype(np.float32)
    xt2 = np.linspace(0.1, 0.9, Wt).astype(np.float32)
    ls = 0.08
    got = np.asarray(setconv_decode_grid(x1g, x2g, f, xt1, xt2, ls))
    pts = np.stack(np.meshgrid(xt1, xt2, indexing="ij"), -1).reshape(1, -1, 2)
    pts = np.repeat(pts, B, 0).astype(np.float32)
    want = np.asarray(setconv_decode_offgrid(x1g, x2g, f, pts, ls)).reshape(B, Ht, Wt, C)
    np.testing.assert_allclose(got, want, rtol=_RTOL, atol=_ATOL)


def test_internal_grid_properties():
    x1g, x2g = internal_grid((0.0, 1.0), (0.0, 1.3), density=50, multiple=16)
    assert len(x1g) % 16 == 0 and len(x2g) % 16 == 0
    assert x1g[0] < -0.09 and x1g[-1] > 1.09  # margin covered
    np.testing.assert_allclose(np.diff(x1g), 1 / 50, atol=1e-6)


def test_infer_internal_density():
    assert infer_internal_density([0.01, 0.02]) == 100
    assert infer_internal_density([0.25]) == 4


def test_encode_grad_flows(rng):
    """Lengthscale must be differentiable through the encoder."""
    H = W = 8
    x1g = np.linspace(0, 1, H).astype(np.float32)
    x2g = np.linspace(0, 1, W).astype(np.float32)
    x = rng.random((1, 4, 2)).astype(np.float32)
    y = rng.normal(size=(1, 4, 1)).astype(np.float32)
    mask = np.ones((1, 4), np.float32)

    def f(ls):
        return jnp.sum(setconv_encode_offgrid(x1g, x2g, x, y, mask, ls))

    g = jax.grad(f)(jnp.asarray(0.2))
    assert np.isfinite(np.asarray(g)) and abs(float(g)) > 0
