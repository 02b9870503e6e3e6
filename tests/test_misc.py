"""Coverage for perf harness, debug toggles, batching pad, features, tools."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepsensornz_tpu.data.features import (
    circ_time_encoding,
    random_hour_subset,
    rmse,
    wind_components,
)
from deepsensornz_tpu.data.grid import Field
from deepsensornz_tpu.perf.harness import Timer, benchmark_fn, device_memory_stats


def test_benchmark_fn_runs():
    f = jax.jit(lambda x: x * 2 + 1)
    out = benchmark_fn(f, jnp.ones((32, 32)), warmup=1, reps=2)
    assert out["p50_s"] > 0 and out["reps"] == 2


def test_timer_sections():
    t = Timer()
    with t.section("a"):
        sum(range(1000))
    with t.section("a"):
        pass
    rep = t.report()
    assert "a" in rep


def test_device_memory_stats_shape():
    stats = device_memory_stats()
    assert len(stats) == len(jax.devices())
    assert "device" in stats[0]


def test_random_hour_subset():
    t = np.datetime64("2020-01-01", "s") + np.arange(72) * np.timedelta64(1, "h")
    f = Field(np.arange(72, dtype=np.float64)[:, None, None] * np.ones((1, 2, 2)),
              ("time", "latitude", "longitude"),
              {"time": t, "latitude": np.arange(2.0), "longitude": np.arange(2.0)}, "x")
    sub = random_hour_subset(f, seed=0)
    assert sub.sizes()["time"] == 3  # one per day
    days = sub.coords["time"].astype("datetime64[D]")
    assert len(np.unique(days)) == 3


def test_wind_components_directions():
    u, v = wind_components(np.array([10.0]), np.array([90.0]))  # easterly
    assert u[0] == pytest.approx(-10.0, abs=1e-9)
    assert v[0] == pytest.approx(0.0, abs=1e-9)
    u, v = wind_components(np.array([5.0]), np.array([180.0]))  # southerly
    assert v[0] == pytest.approx(5.0, abs=1e-9)


def test_circ_time_hourly():
    t = np.array([np.datetime64("2020-06-01T06:00:00")])
    enc = circ_time_encoding(t, "H")
    assert set(enc) == {"cos_D", "sin_D", "cos_H", "sin_H"}
    assert enc["cos_H"][0] == pytest.approx(np.cos(2 * np.pi * 6 / 24))


def test_rmse_ignores_nans():
    assert rmse([1.0, np.nan, 3.0], [2.0, 5.0, 3.0]) == pytest.approx(
        np.sqrt(0.5)
    )


def test_pad_batch_padding_masked():
    from deepsensornz_tpu.parallel.mesh import pad_batch_to_multiple
    from deepsensornz_tpu.data.synthetic import synthetic_bundle
    from deepsensornz_tpu.data.processor import DataProcessor
    from deepsensornz_tpu.task.loader import TaskLoader

    base, dem, stations = synthetic_bundle(n_times=3, base_hw=(8, 8),
                                           dem_hw=(16, 16), n_stations=6)
    dp = DataProcessor()
    dp.set_coord_maps_from_extent(-47, -34, 166, 178)
    tl = TaskLoader(context=[dp(base, method="mean_std")],
                    target=dp(stations, method="mean_std"),
                    internal_density=16, grid_multiple=16)
    task = tl(list(base.coords["time"]))
    padded, n = pad_batch_to_multiple(task, 8)
    assert padded.batch_size == 8 and n == 3
    assert float(np.asarray(padded.yt_mask)[3:].sum()) == 0.0


def test_mirror_data_tool(tmp_path, monkeypatch):
    from deepsensornz_tpu import paths as paths_mod
    from tools.mirror_data import main

    paths_mod.set_data_paths({
        "era5": {"parent": "/data/era5"},
        "stations": {"parent": "/data/stations"},
        "topography": {"file": "/data/dem.nc"},
    })
    out = str(tmp_path / "sync.sh")
    main(["--remote", "user@host:/dest", "--out", out])
    content = open(out).read()
    assert "rsync" in content and "/data/era5/" in content
    assert os.access(out, os.X_OK)


def test_debug_toggles():
    from deepsensornz_tpu.debug import disable_debug, enable_debug

    enable_debug(nans=True)
    assert jax.config.jax_debug_nans
    disable_debug()
    assert not jax.config.jax_debug_nans


def test_profile_trace_writes_dir(tmp_path):
    import jax.numpy as jnp

    from deepsensornz_tpu.perf.harness import profile_trace

    d = str(tmp_path / "trace")
    with profile_trace(d):
        _ = jnp.ones((64, 64)) @ jnp.ones((64, 64))
    assert os.path.isdir(d)
    assert any(os.scandir(d))


def test_shipped_station_registry():
    """The generated station registry ships with the package (parity with
    the reference's vendored STATION_LATLON, config.py:208-2683) so holdout
    lists and plots work without the raw archive."""
    from deepsensornz_tpu.config import station_registry

    reg = station_registry()
    assert len(reg) == 619
    import numpy as np

    for name, v in reg.items():
        assert set(v) == {"station_id", "latitude", "longitude", "elevation"}
        assert -48.5 < v["latitude"] < -34.0
        assert 166.0 < v["longitude"] < 179.0
        assert v["elevation"] is None or -5.0 <= v["elevation"] <= 3000.0
    # well-known entries resolve
    assert any("WELLINGTON" in n for n in reg)
    # second call returns the cached object
    assert station_registry() is reg


def test_synthetic_world_knobs():
    """Multi-world generator knobs (profile-robustness protocol): each knob
    moves its statistic; unknown knobs raise; defaults reproduce the
    historical world bit-for-bit."""
    import numpy as np
    import pytest

    from deepsensornz_tpu.data.synthetic import synthetic_bundle

    base0, dem0, st0 = synthetic_bundle(n_times=3, base_hw=(12, 12),
                                        dem_hw=(24, 24), n_stations=8, seed=3)
    base1, dem1, st1 = synthetic_bundle(n_times=3, base_hw=(12, 12),
                                        dem_hw=(24, 24), n_stations=8, seed=3,
                                        world={})
    np.testing.assert_array_equal(dem0.data, dem1.data)
    np.testing.assert_array_equal(base0.data, base1.data)

    _, dem_rough, _ = synthetic_bundle(n_times=3, base_hw=(12, 12),
                                       dem_hw=(24, 24), n_stations=8, seed=3,
                                       world={"terrain_scale": 1600.0})
    assert np.nanmean(dem_rough.data) > 1.5 * np.nanmean(dem0.data)

    _, _, st_many = synthetic_bundle(n_times=3, base_hw=(12, 12),
                                     dem_hw=(24, 24), n_stations=8, seed=3,
                                     world={"n_stations": 20})
    assert st_many["station_id"].nunique() == 20

    with pytest.raises(ValueError, match="world knobs"):
        synthetic_bundle(n_times=2, base_hw=(12, 12), dem_hw=(24, 24),
                         world={"bogus": 1})
