"""Native task-packing engine: parity with the Python path + speed."""

import time

import numpy as np
import pytest

from deepsensornz_tpu.data.processor import DataProcessor
from deepsensornz_tpu.data.synthetic import synthetic_bundle
from deepsensornz_tpu.native.taskpack import (
    available,
    interp_grid_points_native,
    pack_station_batches,
)
from deepsensornz_tpu.task.loader import TaskLoader, interp_grid_at_points
from deepsensornz_tpu.data.grid import Field

pytestmark = pytest.mark.skipif(not available(), reason="native lib unavailable")


@pytest.fixture(scope="module")
def pipeline():
    base, dem, stations = synthetic_bundle(
        n_times=6, base_hw=(16, 16), dem_hw=(48, 48), n_stations=24
    )
    dp = DataProcessor()
    dp.set_coord_maps_from_extent(
        dem.coords["latitude"].min(), dem.coords["latitude"].max(),
        dem.coords["longitude"].min(), dem.coords["longitude"].max(),
    )
    return (dp(base, method="mean_std"),
            dp(dem.fillna(0.0).rename("elevation"), method="min_max"),
            dp(stations, method="mean_std"),
            base.coords["time"])


def test_fast_path_matches_python(pipeline):
    """'all' sampling: native and Python paths must agree exactly."""
    base_n, dem_n, st_n, times = pipeline
    tl = TaskLoader(context=[base_n, st_n], target=st_n, aux_at_targets=dem_n,
                    internal_density=32, grid_multiple=16)
    dates = list(times[:4])
    fast = tl._fast_call(dates, ["all", "all"], "all")
    assert fast is not None, "fast path did not engage"
    # disable native and rebuild through the slow path
    slow = tl._slow_reference(dates) if hasattr(tl, "_slow_reference") else None
    import deepsensornz_tpu.native.taskpack as tp

    lib = tp._LIB
    try:
        tp._LIB = None
        tp._TRIED = True
        slow = tl(dates)
    finally:
        tp._LIB = lib
    np.testing.assert_array_equal(np.asarray(fast.xt), np.asarray(slow.xt))
    np.testing.assert_array_equal(np.asarray(fast.yt), np.asarray(slow.yt))
    np.testing.assert_array_equal(np.asarray(fast.yt_mask), np.asarray(slow.yt_mask))
    np.testing.assert_array_equal(
        np.asarray(fast.points[0].x), np.asarray(slow.points[0].x))
    np.testing.assert_array_equal(
        np.asarray(fast.points[0].y), np.asarray(slow.points[0].y))
    np.testing.assert_array_equal(
        np.asarray(fast.grids[0].y), np.asarray(slow.grids[0].y))
    np.testing.assert_allclose(
        np.asarray(fast.yt_aux), np.asarray(slow.yt_aux), rtol=1e-5, atol=1e-5)


def test_pack_sampling_modes():
    rng = np.random.default_rng(0)
    R = 100
    t0 = np.datetime64("2020-01-01", "s")
    times = np.repeat([t0, t0 + np.timedelta64(1, "D")], R // 2)
    x1 = rng.random(R).astype(np.float32)
    x2 = rng.random(R).astype(np.float32)
    v = rng.random((R, 1)).astype(np.float32)
    dates = np.array([t0, t0 + np.timedelta64(1, "D")])
    _, _, m_all, c_all = pack_station_batches(times, x1, x2, v, dates, 64, "all")
    assert list(c_all) == [50, 50]
    _, _, m_fr, c_fr = pack_station_batches(times, x1, x2, v, dates, 64,
                                            "fraction", frac=0.4, seed=1)
    assert list(c_fr) == [20, 20]
    x_a, _, _, c_ct = pack_station_batches(times, x1, x2, v, dates, 64,
                                           "count", count=7, seed=1)
    assert list(c_ct) == [7, 7]
    # deterministic given the same seed
    x_b, _, _, _ = pack_station_batches(times, x1, x2, v, dates, 64,
                                        "count", count=7, seed=1)
    np.testing.assert_array_equal(x_a, x_b)
    x_c, _, _, _ = pack_station_batches(times, x1, x2, v, dates, 64,
                                        "count", count=7, seed=2)
    assert not np.array_equal(x_a, x_c)


def test_pack_capacity_overflow_raises():
    t0 = np.datetime64("2020-01-01", "s")
    times = np.repeat(t0, 10)
    z = np.zeros(10, np.float32)
    with pytest.raises(ValueError):
        pack_station_batches(times, z, z, z[:, None], np.array([t0]), 4, "all")


def test_native_interp_matches_python():
    rng = np.random.default_rng(3)
    g1 = np.linspace(0, 1, 40)
    g2 = np.linspace(0, 1, 50)
    grid = rng.standard_normal((40, 50)).astype(np.float32)
    f = Field(grid, ("x1", "x2"), {"x1": g1, "x2": g2}, "f")
    px1 = rng.random(200)
    px2 = rng.random(200)
    want = interp_grid_at_points(f, px1, px2)
    got = interp_grid_points_native(grid, g1, g2, px1, px2)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_fast_path_speedup(pipeline):
    """Native path should be clearly faster at operational batch sizes."""
    base_n, dem_n, st_n, times = pipeline
    tl = TaskLoader(context=[base_n, st_n], target=st_n, aux_at_targets=dem_n,
                    internal_density=32, grid_multiple=16)
    dates = list(times) * 20  # 120 tasks
    def timed(fn):
        best = float("inf")
        for _ in range(2):  # best-of-2 to damp scheduler noise
            t0 = time.perf_counter()
            out = fn()
            best = min(best, time.perf_counter() - t0)
        return out, best

    fast, t_fast = timed(lambda: tl(dates))

    import deepsensornz_tpu.native.taskpack as tp

    lib = tp._LIB
    try:
        tp._LIB = None
        tp._TRIED = True
        slow, t_slow = timed(lambda: tl(dates))
    finally:
        tp._LIB = lib
    assert fast.batch_size == slow.batch_size == 120
    assert t_fast < t_slow, (t_fast, t_slow)
