"""Data sources against on-disk fixture archives (ERA5 / stations / WRF / DEM)."""

import os
from datetime import datetime

import numpy as np
import pytest

from deepsensornz_tpu.data.grid import Dataset, Field, save_dataset
from deepsensornz_tpu.data.sources.era5 import ERA5Source, concat_time, daily_resample
from deepsensornz_tpu.data.sources.stations import StationSource, save_station_file
from deepsensornz_tpu.data.sources.topography import TopographySource
from deepsensornz_tpu.data.sources.wrf import WRFSource


@pytest.fixture(scope="module")
def era5_archive(tmp_path_factory):
    root = tmp_path_factory.mktemp("era5")
    os.makedirs(root / "temperature")
    lat = np.linspace(-34, -47, 6)
    lon = np.linspace(166, 178, 7)
    for year in (2000, 2001):
        t = np.datetime64(f"{year}-01-01", "s") + np.arange(48) * np.timedelta64(1, "h")
        data = np.random.default_rng(year).random((48, 6, 7))
        f = Field(data, ("time", "latitude", "longitude"),
                  {"time": t, "latitude": lat, "longitude": lon}, "t2m")
        save_dataset(Dataset([f]), str(root / "temperature" / f"t2m_{year}.nc"),
                     float32=False)
    return str(root)


def test_era5_load_years(era5_archive):
    src = ERA5Source(era5_archive)
    f = src.load("temperature", [2000, 2001])
    assert f.sizes()["time"] == 96
    t = f.coords["time"].astype("datetime64[s]")
    assert (np.diff(t) > np.timedelta64(0, "s")).all()  # sorted, deduped


def test_era5_load_time(era5_archive):
    src = ERA5Source(era5_archive)
    want = np.datetime64("2000-01-01T05:00:00", "s") + np.arange(3) * np.timedelta64(1, "h")
    f = src.load_time("temperature", want)
    assert f.sizes()["time"] == 3
    np.testing.assert_array_equal(f.coords["time"].astype("datetime64[s]"), want)


def test_era5_windowed_load_reads_only_window(era5_archive):
    """load_time reads only the file rows in [min, max]+pad (h5py hyperslab
    — reference era5.load_ds_time laziness): values identical to the eager
    load, and open_dataset(time_window=...) returns exactly the window."""
    from deepsensornz_tpu.data.grid import open_dataset

    src = ERA5Source(era5_archive)
    want = np.datetime64("2001-01-01T10:00:00", "s") + np.arange(5) * np.timedelta64(1, "h")
    lazy = src.load_time("temperature", want)
    eager = src.load("temperature", [2000, 2001]).sel(time=want, method="nearest")
    np.testing.assert_array_equal(lazy.data, eager.data)

    path = src.candidate_files("temperature", [2001])[0]
    ds = open_dataset(path, time_window=(want[0], want[-1]))
    assert ds["t2m"].sizes()["time"] == 5
    np.testing.assert_array_equal(
        ds["t2m"].coords["time"].astype("datetime64[s]"), want)
    # empty overlap → zero-length time axis
    empty = open_dataset(path, time_window=(np.datetime64("1990-01-01"),
                                            np.datetime64("1990-02-01")))
    assert empty["t2m"].sizes()["time"] == 0


def test_daily_resample_mean_and_sum():
    t = np.datetime64("2000-01-01", "s") + np.arange(48) * np.timedelta64(1, "h")
    data = np.ones((48, 2, 2))
    f = Field(data, ("time", "latitude", "longitude"),
              {"time": t, "latitude": np.arange(2.0), "longitude": np.arange(2.0)}, "tp")
    m = daily_resample(f, "mean")
    s = daily_resample(f, "sum")
    assert m.sizes()["time"] == 2
    np.testing.assert_allclose(m.data, 1.0)
    np.testing.assert_allclose(s.data, 24.0)


def test_era5_missing_raises(era5_archive):
    with pytest.raises(FileNotFoundError):
        ERA5Source(era5_archive).load("humidity", [2000])


@pytest.fixture(scope="module")
def station_archive(tmp_path_factory):
    root = tmp_path_factory.mktemp("stations")
    t = np.datetime64("2000-01-01", "s") + np.arange(96) * np.timedelta64(1, "h")
    rng = np.random.default_rng(0)
    for i, (name, lat, lon, elev) in enumerate([
        ("alpha", -36.8, 174.7, 30.0),
        ("bravo", -41.3, 174.8, 10.0),
        ("charlie", -43.5, 172.6, 50.0),
    ]):
        save_station_file(
            str(root / f"{name}.nc"), name, lat, lon, elev, t,
            {"dry_bulb": 15 + rng.standard_normal(96),
             "precipitation": np.abs(rng.standard_normal(96))},
        )
    # corrupt file must be skipped silently in the metadata scan
    with open(root / "corrupt.nc", "wb") as f:
        f.write(b"not an hdf5 file")
    return str(root)


def test_station_metadata_scan(station_archive):
    src = StationSource(station_archive)
    meta = src.get_metadata()
    assert len(meta) == 3  # corrupt file skipped
    assert set(meta["station_name"]) == {"alpha", "bravo", "charlie"}
    assert meta["start_year"].eq(2000).all()


def test_station_registry_build(station_archive, tmp_path):
    src = StationSource(station_archive)
    reg = src.build_registry(str(tmp_path / "registry.json"))
    assert reg["alpha"]["latitude"] == pytest.approx(-36.8)
    assert (tmp_path / "registry.json").exists()


def test_load_stations_time_with_holdout(station_archive):
    src = StationSource(station_archive)
    times = np.datetime64("2000-01-02", "s") + np.arange(4) * np.timedelta64(1, "h")
    df = src.load_stations_time("temperature", times, remove_stations=["bravo"])
    assert set(df["station_name"]) == {"alpha", "charlie"}
    assert len(df) == 8
    assert "dry_bulb_station" in df.columns
    kept = src.load_stations_time("temperature", times, keep_stations=["alpha"])
    assert set(kept["station_name"]) == {"alpha"}


def test_station_index_load_identical_and_persisted(station_archive):
    """The persisted archive index + windowed thread-pool load returns the
    SAME frame as the index-free path (holdouts included), skips the
    corrupt file into the counter both ways, persists next to the archive,
    and rescans entries whose (mtime, size) changed."""
    import json
    import os
    import warnings

    src = StationSource(station_archive)
    times = np.datetime64("2000-01-02", "s") + np.arange(30) * np.timedelta64(1, "h")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        a = src.load_stations_time("temperature", times, use_index=False,
                                   remove_stations=["bravo"])
        skipped_a = list(src.skipped)
        b = src.load_stations_time("temperature", times,
                                   remove_stations=["bravo"])
        skipped_b = list(src.skipped)
    pdt = a.sort_values(["station_name", "time"]).reset_index(drop=True)
    pdt2 = b.sort_values(["station_name", "time"]).reset_index(drop=True)
    assert pdt.equals(pdt2)
    assert skipped_a == skipped_b and len(skipped_a) == 1
    assert os.path.exists(src.index_path)
    with open(src.index_path) as f:
        idx = json.load(f)
    assert len(idx) == 3  # corrupt file not indexed
    ent = next(iter(idx.values()))
    assert ent["t_min"].startswith("2000-01-01")
    assert "dry_bulb" in ent["variables"]

    # daily path identical too (windowed read must cover whole days)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        da = src.load_stations_time("temperature", times, daily=True,
                                    use_index=False)
        db = src.load_stations_time("temperature", times, daily=True)
    assert da.sort_values(["station_name", "time"]).reset_index(drop=True).equals(
        db.sort_values(["station_name", "time"]).reset_index(drop=True))

    # stale entry: touch a file's mtime → rescan refreshes it
    victim = [p for p in src.station_files() if "alpha" in p][0]
    os.utime(victim, (1, 1))
    src2 = StationSource(station_archive)
    idx2 = src2.build_index()
    assert idx2[victim]["mtime"] == 1


def test_load_station_daily_resample(station_archive):
    src = StationSource(station_archive)
    files = src.station_files()
    df = src.load_station([f for f in files if "alpha" in f][0],
                          "temperature", daily=True)
    assert len(df) == 4  # 96 hourly → 4 days


def test_topography_source(tmp_path):
    lat = np.linspace(-34, -47, 20)
    lon = np.linspace(166, 178, 24)
    dem = Field(np.random.default_rng(0).random((20, 24)) * 1000,
                ("latitude", "longitude"), {"latitude": lat, "longitude": lon},
                "elevation")
    path = str(tmp_path / "dem.nc")
    save_dataset(Dataset([dem]), path, float32=False)
    src = TopographySource(path)
    full = src.load()
    assert full.shape == (20, 24)
    cropped = src.load(area="christchurch")
    assert cropped.sizes()["latitude"] < 20
    coarse = src.load(coarsen=2)
    assert coarse.shape == (10, 12)


@pytest.fixture(scope="module")
def wrf_archive(tmp_path_factory):
    root = tmp_path_factory.mktemp("wrf")
    src = WRFSource(str(root))
    init = datetime(2021, 6, 1)
    # curvilinear grid (rotated-ish)
    ny, nx = 12, 14
    base_lat = np.linspace(-47, -34, ny)[:, None] + np.linspace(0, 0.5, nx)[None, :]
    base_lon = np.linspace(166, 178, nx)[None, :] + np.linspace(0, 0.3, ny)[:, None]
    rng = np.random.default_rng(1)
    for valid in src.cycle_hours(init):
        path = src.filename_for(init, valid)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        fields = {
            "T2": Field(280 + rng.standard_normal((ny, nx)), ("y", "x"), {}, "T2"),
            "XLAT": Field(base_lat, ("y", "x"), {}, "XLAT"),
            "XLONG": Field(base_lon, ("y", "x"), {}, "XLONG"),
        }
        save_dataset(Dataset(fields), path, float32=False)
    return str(root), init


def test_wrf_cycle_discovery(wrf_archive):
    root, init = wrf_archive
    src = WRFSource(root)
    paths = src.get_filepaths(init)
    assert len(paths) == 24  # hours 6..30: spin-up skipped
    t0 = src.parse_valid_time(paths[0])
    assert t0 == np.datetime64("2021-06-01T06:00:00")


def test_wrf_load_and_regrid(wrf_archive):
    root, init = wrf_archive
    src = WRFSource(root)
    paths = src.get_filepaths(init)[:4]
    out = src.load(paths, ["temperature"])
    fld = out["temperature"]
    assert fld.shape[0] == 4
    target_lat = np.linspace(-46, -35, 10)
    target_lon = np.linspace(167, 177, 11)
    g = src.regrid_to(fld, target_lat, target_lon)
    assert g.shape == (4, 10, 11)
    inside = np.isfinite(g.data)
    assert inside.mean() > 0.5
    # values preserved within range
    assert np.nanmin(g.data) > 270 and np.nanmax(g.data) < 290
    # triangulation cache reused
    assert len(src._regrid_cache) == 1
    src.regrid_to(fld, target_lat, target_lon)
    assert len(src._regrid_cache) == 1


def test_wrf_corrupt_member_identified(wrf_archive):
    """A corrupt cycle member is reported by path instead of failing the
    whole load anonymously (wrf.py:145-152 parity)."""
    root, init = wrf_archive
    src = WRFSource(root)
    paths = src.get_filepaths(init)[:3]
    bad = paths[1] + ".corrupt.nc"
    with open(bad, "wb") as f:
        f.write(b"junk")
    with pytest.raises(IOError) as e:
        src.load([paths[0], bad, paths[2]], ["temperature"])
    assert "corrupt" in str(e.value)
    os.unlink(bad)


def test_wrf_regrid_weights_persisted_to_disk(wrf_archive, tmp_path):
    """Regrid weights survive the process: a fresh WRFSource loads them from
    disk instead of re-triangulating (reference persists xESMF weights keyed
    by grid shapes, wrf.py:252-271)."""
    root, init = wrf_archive
    wdir = str(tmp_path / "weights")
    src = WRFSource(root, weights_dir=wdir)
    paths = src.get_filepaths(init)[:2]
    fld = src.load(paths, ["temperature"])["temperature"]
    target_lat = np.linspace(-46, -35, 10)
    target_lon = np.linspace(167, 177, 11)
    g1 = src.regrid_to(fld, target_lat, target_lon)
    files = os.listdir(wdir)
    assert len(files) == 1 and files[0].endswith(".npz")

    # a NEW process (fresh source) must load from disk, not recompute
    src2 = WRFSource(root, weights_dir=wdir)
    import scipy.spatial as sps

    class Boom:
        def __init__(self, *a, **k):
            raise AssertionError("Delaunay recomputed despite disk cache")

    orig = sps.Delaunay
    sps.Delaunay = Boom
    try:
        g2 = src2.regrid_to(fld, target_lat, target_lon)
    finally:
        sps.Delaunay = orig
    np.testing.assert_allclose(g1.data, g2.data, atol=1e-6, equal_nan=True)


# ---------------------------------------------------------------------------
# REFERENCE archive schema (stations.py:21-24,46-51,55-120,181-203):
# per-variable subfolders, attrs['site name']/['agent_number'], lat/lon and
# station_height as scalar dataset VARIABLES. Fixtures written in the
# reference schema so the loaders are tested against the production
# contract, not a mirror of their own writer.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def reference_archive(tmp_path_factory):
    from deepsensornz_tpu.data.sources.stations import save_station_file_reference

    root = tmp_path_factory.mktemp("ref_stations")
    t = np.datetime64("2001-01-01", "s") + np.arange(48) * np.timedelta64(1, "h")
    rng = np.random.default_rng(3)
    screen = root / "ScreenObs"
    wind = root / "Surface_Wind"
    screen.mkdir()
    wind.mkdir()
    save_station_file_reference(
        str(screen / "12345.nc"), "Alpha Ews", 12345, -36.8, 174.7, 30.0, t,
        {"dry_bulb": 15 + rng.standard_normal(48),
         "relative_humidity": rng.uniform(20, 100, 48)},
    )
    # missing station_height: the archive has such stations (stations.py:194-198)
    save_station_file_reference(
        str(screen / "23456.nc"), "Bravo Aws", 23456, -41.3, 174.8, None, t,
        {"dry_bulb": 10 + rng.standard_normal(48)},
    )
    save_station_file_reference(
        str(wind / "34567.nc"), "Charlie Aero", 34567, -43.5, 172.6, 5.0, t,
        {"speed": np.abs(rng.standard_normal(48)) * 10,
         "direction": rng.uniform(0, 360, 48)},
    )
    with open(screen / "corrupt.nc", "wb") as f:
        f.write(b"definitely not hdf5")
    return str(root)


def test_reference_schema_metadata(reference_archive):
    src = StationSource(reference_archive)
    meta = src.get_metadata("temperature")  # → ScreenObs subfolder
    assert set(meta["station_name"]) == {"Alpha Ews", "Bravo Aws"}
    assert set(meta["station_id"]) == {12345, 23456}
    row = meta[meta["station_name"] == "Alpha Ews"].iloc[0]
    assert row["latitude"] == pytest.approx(-36.8)
    assert row["longitude"] == pytest.approx(174.7)
    assert row["elevation"] == pytest.approx(30.0)
    # missing station_height → NaN, station still listed
    row_b = meta[meta["station_name"] == "Bravo Aws"].iloc[0]
    assert np.isnan(row_b["elevation"])
    # the corrupt file is COUNTED, not silently eaten
    assert len(src.skipped) == 1 and "corrupt" in src.skipped[0]


def test_reference_schema_skip_warns(reference_archive):
    src = StationSource(reference_archive)
    with pytest.warns(UserWarning, match="skipped 1 unreadable"):
        src.get_metadata("temperature")


def test_reference_schema_load_time(reference_archive):
    src = StationSource(reference_archive)
    times = np.datetime64("2001-01-01T06", "s") + np.arange(3) * np.timedelta64(1, "h")
    df = src.load_stations_time("temperature", times)
    assert set(df["station_name"]) == {"Alpha Ews", "Bravo Aws"}
    assert "dry_bulb_station" in df.columns
    assert len(df) == 6
    np.testing.assert_allclose(
        sorted(df["latitude"].unique()), [-41.3, -36.8])


def test_reference_schema_wind_uv(reference_archive):
    """u/v derived from the archive's speed/direction variables
    (u = −W·sinθ, v = −W·cosθ; stations.py:295-303)."""
    src = StationSource(reference_archive)
    times = np.datetime64("2001-01-01T00", "s") + np.arange(4) * np.timedelta64(1, "h")
    du = src.load_stations_time("10m_u_component_of_wind", times)
    dv = src.load_stations_time("10m_v_component_of_wind", times)
    assert set(du["station_name"]) == {"Charlie Aero"}
    assert "u_station" in du.columns and "v_station" in dv.columns
    # |(u, v)| reproduces the speed series
    spd = np.sqrt(du["u_station"].to_numpy() ** 2 + dv["v_station"].to_numpy() ** 2)
    assert (spd >= 0).all() and np.isfinite(spd).all()


def test_reference_schema_registry(reference_archive):
    src = StationSource(reference_archive)
    reg = src.build_registry(
        variables=["temperature", "10m_u_component_of_wind"])
    assert set(reg) == {"Alpha Ews", "Bravo Aws", "Charlie Aero"}
    assert reg["Charlie Aero"]["station_id"] == 34567
    assert reg["Charlie Aero"]["elevation"] == pytest.approx(5.0)


def test_topography_discovery(tmp_path):
    """nz_elevation_*.nc convention (topography.py:36-56); finest wins."""
    lat = np.linspace(-34, -47, 10)
    lon = np.linspace(166, 178, 12)
    rng = np.random.default_rng(1)
    for res in ("800m", "25m"):
        dem = Field(rng.random((10, 12)) * 1000, ("latitude", "longitude"),
                    {"latitude": lat, "longitude": lon}, "elevation",
                    {"res": res})
        save_dataset(Dataset([dem]), str(tmp_path / f"nz_elevation_{res}.nc"),
                     float32=False)
    src = TopographySource.discover(str(tmp_path))
    assert src.path.endswith("nz_elevation_25m.nc")
    assert src.load().shape == (10, 12)
    with pytest.raises(FileNotFoundError):
        TopographySource.discover(str(tmp_path / "nope"))
