"""Field/Dataset labeled-grid semantics + NetCDF round-trip."""

import numpy as np
import pytest

from deepsensornz_tpu.data.grid import Dataset, Field, open_dataset, save_dataset


def make_field(nt=4, nlat=6, nlon=8):
    t = np.datetime64("2001-01-01", "s") + np.arange(nt) * np.timedelta64(1, "D")
    lat = np.linspace(-34.0, -47.0, nlat)
    lon = np.linspace(166.0, 178.0, nlon)
    data = np.arange(nt * nlat * nlon, dtype=np.float64).reshape(nt, nlat, nlon)
    return Field(data, ("time", "latitude", "longitude"),
                 {"time": t, "latitude": lat, "longitude": lon}, "t2m", {"units": "C"})


def test_isel_scalar_drops_dim():
    f = make_field()
    g = f.isel(time=1)
    assert g.dims == ("latitude", "longitude")
    np.testing.assert_allclose(g.data, f.data[1])


def test_sel_nearest():
    f = make_field()
    g = f.sel(latitude=-40.0, method="nearest")
    idx = np.abs(f.coords["latitude"] - (-40.0)).argmin()
    np.testing.assert_allclose(g.data, f.data[:, idx, :])


def test_sel_time_slice():
    f = make_field()
    g = f.sel(time=slice("2001-01-02", "2001-01-03"))
    assert g.sizes()["time"] == 2


def test_coarsen_block_mean():
    f = make_field(nt=1, nlat=6, nlon=8).isel(time=0)
    g = f.coarsen(2)
    assert g.shape == (3, 4)
    np.testing.assert_allclose(
        g.data[0, 0], f.data[:2, :2].mean()
    )
    # coord centers
    np.testing.assert_allclose(g.coords["latitude"][0], f.coords["latitude"][:2].mean())


def test_coarsen_trim():
    f = make_field(nt=1, nlat=7, nlon=9).isel(time=0)
    g = f.coarsen(2)
    assert g.shape == (3, 4)


def test_interp_like_nearest_and_linear():
    f = make_field(nt=1).isel(time=0)
    target = Field(
        np.zeros((12, 16)), ("latitude", "longitude"),
        {"latitude": np.linspace(-34.0, -47.0, 12), "longitude": np.linspace(166.0, 178.0, 16)},
    )
    up_n = f.interp_like(target, "nearest")
    up_l = f.interp_like(target, "linear")
    assert up_n.shape == (12, 16)
    # corners should match exactly for both methods
    np.testing.assert_allclose(up_l.data[0, 0], f.data[0, 0], atol=1e-9)
    np.testing.assert_allclose(up_n.data[-1, -1], f.data[-1, -1])


def test_netcdf_roundtrip(tmp_path):
    f = make_field()
    ds = Dataset([f], attrs={"institution": "test"})
    p = str(tmp_path / "x.nc")
    save_dataset(ds, p, float32=False)
    back = open_dataset(p)
    g = back["t2m"]
    assert g.dims == ("time", "latitude", "longitude")
    np.testing.assert_allclose(g.data, f.data)
    np.testing.assert_array_equal(
        g.coords["time"].astype("datetime64[s]"), f.coords["time"]
    )
    assert back.attrs["institution"] == "test"
    assert g.attrs["units"] == "C"


def test_reduce_mean():
    f = make_field()
    m = f.mean("time")
    assert m.dims == ("latitude", "longitude")
    np.testing.assert_allclose(m.data, f.data.mean(0))


def test_sel_slice_descending_coord():
    f = make_field()  # latitude descends -34 → -47
    g = f.sel(latitude=slice(-40.0, -45.0))
    assert g.sizes()["latitude"] > 0
    assert (g.coords["latitude"] <= -34.0).all()
    assert (g.coords["latitude"] >= -45.1).all() and (g.coords["latitude"] <= -39.9).all()
