"""Randomized invariants across seeds (cheap hypothesis-style sweeps)."""

import numpy as np
import pytest

from deepsensornz_tpu.data.grid import Field
from deepsensornz_tpu.data.processor import DataProcessor
from deepsensornz_tpu.ops.setconv import setconv_encode_offgrid


@pytest.mark.parametrize("seed", range(8))
def test_field_sel_nearest_matches_argmin(seed):
    rng = np.random.default_rng(seed)
    n = rng.integers(3, 40)
    coord = np.sort(rng.uniform(-100, 100, n))
    if rng.random() < 0.5:
        coord = coord[::-1]  # descending too
    data = rng.standard_normal(n)
    f = Field(data, ("x",), {"x": coord.copy()}, "f")
    for _ in range(5):
        q = rng.uniform(-120, 120)
        got = float(f.sel(x=q, method="nearest").data)
        want = data[np.abs(coord - q).argmin()]
        # ties can legitimately pick either side; compare distances instead
        got_d = np.min(np.abs(coord[data == got] - q))
        assert got_d == pytest.approx(np.abs(coord - q).min())
        assert want in data


@pytest.mark.parametrize("seed", range(8))
def test_coarsen_preserves_sum(seed):
    rng = np.random.default_rng(seed)
    h = int(rng.integers(2, 8)) * 4
    w = int(rng.integers(2, 8)) * 4
    data = rng.standard_normal((h, w))
    f = Field(data, ("latitude", "longitude"),
              {"latitude": np.arange(float(h)), "longitude": np.arange(float(w))}, "f")
    c = f.coarsen(4, how="sum")
    assert c.data.sum() == pytest.approx(data.sum(), rel=1e-9)
    m = f.coarsen(4, how="mean")
    assert m.data.mean() == pytest.approx(data.mean(), rel=1e-9)


@pytest.mark.parametrize("seed", range(6))
@pytest.mark.parametrize("method", ["mean_std", "min_max", "positive_semidefinite"])
def test_processor_roundtrip_random(seed, method):
    rng = np.random.default_rng(seed)
    dp = DataProcessor()
    dp.set_coord_maps_from_extent(-47.9, -34.0, 165.7, 178.7)
    n1, n2 = int(rng.integers(2, 12)), int(rng.integers(2, 12))
    data = rng.normal(rng.uniform(-100, 100), rng.uniform(0.1, 50), (n1, n2))
    if method == "positive_semidefinite":
        data = np.abs(data)
    f = Field(data, ("latitude", "longitude"),
              {"latitude": np.linspace(-34, -47, n1),
               "longitude": np.linspace(166, 178, n2)}, f"v{seed}")
    back = dp.unnormalise(dp(f, method=method))
    np.testing.assert_allclose(back.data, f.data, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("seed", range(5))
def test_setconv_density_mass(seed):
    """Interior-point density integrates to ≈ 2πℓ² per point (RBF mass):
    catches weight or padding errors across random geometries."""
    rng = np.random.default_rng(seed)
    H = W = int(rng.integers(48, 96))
    ls = float(rng.uniform(0.02, 0.06))
    x1g = np.linspace(0, 1, H).astype(np.float32)
    x2g = np.linspace(0, 1, W).astype(np.float32)
    n = int(rng.integers(2, 10))
    x = rng.uniform(0.3, 0.7, (1, n, 2)).astype(np.float32)
    y = rng.standard_normal((1, n, 1)).astype(np.float32)
    mask = np.ones((1, n), np.float32)
    enc = np.asarray(setconv_encode_offgrid(x1g, x2g, x, y, mask, ls))
    cell = (x1g[1] - x1g[0]) * (x2g[1] - x2g[0])
    mass = enc[0, :, :, 0].sum() * cell
    expected = n * 2 * np.pi * ls**2
    assert mass == pytest.approx(expected, rel=0.02)


@pytest.mark.parametrize("seed", range(5))
def test_taskloader_mask_consistency(seed):
    """Wherever a mask is 1 the values are finite; where 0, coords are pads."""
    from deepsensornz_tpu.data.synthetic import synthetic_bundle
    from deepsensornz_tpu.task.loader import TaskLoader

    base, dem, stations = synthetic_bundle(
        n_times=4, base_hw=(12, 12), dem_hw=(24, 24),
        n_stations=int(np.random.default_rng(seed).integers(4, 20)), seed=seed,
    )
    dp = DataProcessor()
    dp.set_coord_maps_from_extent(-47.95, -34.05, 165.75, 178.7)
    tl = TaskLoader(
        context=[dp(base, method="mean_std"), dp(stations, method="mean_std")],
        target=dp(stations),
        internal_density=16, grid_multiple=16,
    )
    task = tl(list(base.coords["time"]), seed_override=seed)
    for pc in task.points:
        m = np.asarray(pc.mask).astype(bool)
        assert np.isfinite(np.asarray(pc.y)[m]).all()
        assert (np.asarray(pc.x)[~m] == -1000.0).all()
    tm = np.asarray(task.yt_mask).astype(bool)
    assert np.isfinite(np.asarray(task.yt)[tm]).all()
