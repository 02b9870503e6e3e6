"""Pallas SetConv kernels vs pure-JAX reference (interpret mode on CPU)."""

import numpy as np
import pytest

from deepsensornz_tpu.ops.setconv import setconv_decode_grid, setconv_encode_offgrid
from deepsensornz_tpu.ops.setconv_pallas import decode_grid, encode_offgrid


def test_encode_matches_reference(rng):
    B, N, C = 2, 16, 2
    H, W = 32, 48
    x1g = np.linspace(0, 1, H).astype(np.float32)
    x2g = np.linspace(0, 1, W).astype(np.float32)
    x = rng.random((B, N, 2)).astype(np.float32)
    y = rng.normal(size=(B, N, C)).astype(np.float32)
    mask = (rng.random((B, N)) > 0.25).astype(np.float32)
    ls = 0.12
    want = np.asarray(setconv_encode_offgrid(x1g, x2g, x, y, mask, ls))
    got = np.asarray(encode_offgrid(x1g, x2g, x, y, mask, ls,
                                    th=16, tw=16, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_encode_uneven_tiles(rng):
    """Grid sizes not divisible by the tile size still work (cdiv grid)."""
    B, N, C = 1, 7, 1
    H, W = 24, 40
    x1g = np.linspace(0, 1, H).astype(np.float32)
    x2g = np.linspace(0, 1, W).astype(np.float32)
    x = rng.random((B, N, 2)).astype(np.float32)
    y = rng.normal(size=(B, N, C)).astype(np.float32)
    mask = np.ones((B, N), np.float32)
    want = np.asarray(setconv_encode_offgrid(x1g, x2g, x, y, mask, 0.2))
    got = np.asarray(encode_offgrid(x1g, x2g, x, y, mask, 0.2,
                                    th=16, tw=16, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_encode_point_blocks_accumulate(rng):
    """N larger than the point block: blocks must accumulate into the
    revisited output tile, and zero-padded tail points contribute nothing."""
    B, N, C = 2, 300, 2   # nb=128 → 3 blocks, last one padded by 84
    H, W = 24, 24
    x1g = np.linspace(0, 1, H).astype(np.float32)
    x2g = np.linspace(0, 1, W).astype(np.float32)
    x = rng.random((B, N, 2)).astype(np.float32)
    y = rng.normal(size=(B, N, C)).astype(np.float32)
    mask = (rng.random((B, N)) > 0.1).astype(np.float32)
    ls = 0.15
    want = np.asarray(setconv_encode_offgrid(x1g, x2g, x, y, mask, ls))
    got = np.asarray(encode_offgrid(x1g, x2g, x, y, mask, ls,
                                    th=16, tw=16, nb=128, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_encode_mxu_bf16_close_to_f32(rng):
    """The bf16-MXU variant matches the f32 path to bf16 tolerance."""
    B, N, C = 1, 64, 1
    H, W = 16, 16
    x1g = np.linspace(0, 1, H).astype(np.float32)
    x2g = np.linspace(0, 1, W).astype(np.float32)
    x = rng.random((B, N, 2)).astype(np.float32)
    y = rng.normal(size=(B, N, C)).astype(np.float32)
    mask = np.ones((B, N), np.float32)
    want = np.asarray(setconv_encode_offgrid(x1g, x2g, x, y, mask, 0.2))
    got = np.asarray(encode_offgrid(x1g, x2g, x, y, mask, 0.2,
                                    th=16, tw=16, mxu_bf16=True, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_decode_grid_matches_reference(rng):
    B, H, W, C = 2, 32, 24, 4
    Ht, Wt = 20, 12
    x1g = np.linspace(0, 1, H).astype(np.float32)
    x2g = np.linspace(0, 1, W).astype(np.float32)
    f = rng.normal(size=(B, H, W, C)).astype(np.float32)
    xt1 = np.linspace(0.1, 0.9, Ht).astype(np.float32)
    xt2 = np.linspace(0.2, 0.8, Wt).astype(np.float32)
    ls = 0.07
    want = np.asarray(setconv_decode_grid(x1g, x2g, f, xt1, xt2, ls))
    got = np.asarray(decode_grid(x1g, x2g, f, xt1, xt2, ls,
                                 tt=8, sh=8, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_decode_accumulation_over_source_blocks(rng):
    """Multiple source-H blocks must accumulate, not overwrite."""
    B, H, W, C = 1, 64, 16, 2
    Ht, Wt = 8, 8
    x1g = np.linspace(0, 1, H).astype(np.float32)
    x2g = np.linspace(0, 1, W).astype(np.float32)
    f = rng.normal(size=(B, H, W, C)).astype(np.float32)
    xt1 = np.linspace(0, 1, Ht).astype(np.float32)
    xt2 = np.linspace(0, 1, Wt).astype(np.float32)
    ls = 0.3  # wide kernel so every source block contributes
    want = np.asarray(setconv_decode_grid(x1g, x2g, f, xt1, xt2, ls))
    got = np.asarray(decode_grid(x1g, x2g, f, xt1, xt2, ls,
                                 tt=8, sh=16, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
