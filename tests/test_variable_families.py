"""Per-variable model families end-to-end: precip (bernoulli-gamma),
humidity (spikes-beta), and the WRF forecast-cycle inference path."""

import os
from datetime import datetime

import numpy as np
import pytest

from deepsensornz_tpu import config as cfg
from deepsensornz_tpu.data.grid import Dataset, Field, save_dataset
from deepsensornz_tpu.data.synthetic import synthetic_bundle
from deepsensornz_tpu.pipeline.preprocess import PreprocessForDownscaling
from deepsensornz_tpu.pipeline.train import Train
from deepsensornz_tpu.pipeline.validate import Validate, ValidateWRF


def run_family(variable, tmp_path, n_epochs=2):
    base, dem, stations = synthetic_bundle(
        variable=variable, n_times=8, base_hw=(24, 24), dem_hw=(96, 96),
        n_stations=16,
    )
    pre = PreprocessForDownscaling(variable=variable)
    out = pre.run_processing_sequence(
        dem, {variable: base}, stations,
        highres_factor=2, lowres_factor=4, test_norm=True,
    )
    training = Train(out)
    training.setup_task_loader(station_as_context="all", internal_density=24)
    training.initialise_model(
        unet_channels=(8, 8), compute_dtype="float32",
        decoder_channels=8, mlp_hidden=8,
    )
    model_dir = str(tmp_path / variable)
    result = training.train_model(n_epochs=n_epochs, batch_size=4, lr=1e-3,
                                  model_dir=model_dir, verbose=False)
    return model_dir, result, base, dem, stations, out


def test_precip_generator_has_subgrid_occurrence_signal():
    """The synthetic precip world must carry a LEARNABLE occurrence edge:
    inside wet base cells, station wetness rises with elevation (valley
    drying), so the base-cell wetness copy is beatable and the Bernoulli
    head has something to learn. (The first round-3 generator inherited
    station wetness from the cell exactly, making the deterministic copy
    unbeatable at occurrence by construction.)"""
    base, dem, stations = synthetic_bundle(
        variable="precipitation", n_times=40, base_hw=(32, 32),
        dem_hw=(128, 128), n_stations=100,
    )
    col = cfg.VAR_STATIONS["precipitation"]["var_name"] + "_station"
    lat = base.coords["latitude"]
    lon = base.coords["longitude"]
    tidx = {np.datetime64(t, "ns").astype("int64"): i
            for i, t in enumerate(base.coords["time"])}
    bi = [tidx[np.datetime64(t, "ns").astype("int64")] for t in stations["time"]]
    # map stations -> cells with the SAME nearest semantics the generator
    # uses (Field.sel(method='nearest') -> grid._lookup); a local argmin
    # would tie-break exact midpoints differently on the descending lat axis
    from deepsensornz_tpu.data.grid import _lookup

    li = _lookup(np.asarray(lat), stations["latitude"].values, method="nearest")
    oi = _lookup(np.asarray(lon), stations["longitude"].values, method="nearest")
    cell = base.data[bi, li, oi]
    wet_cell = cell > 0
    assert wet_cell.any()
    obs_wet = stations[col].values > 0
    # dry base cells stay exactly dry
    assert not obs_wet[~wet_cell].any()
    # within wet cells: wetness increases with elevation
    elev = stations["elevation"].values[wet_cell]
    w = obs_wet[wet_cell]
    hi, lo = elev > np.median(elev), elev <= np.median(elev)
    assert w[hi].mean() > w[lo].mean() + 0.2
    # and the copy is therefore beatable: its Brier is bounded away from 0
    assert np.mean((wet_cell.astype(float) - obs_wet.astype(float)) ** 2) > 0.005


def test_precipitation_family(tmp_path):
    model_dir, result, base, dem, stations, out = run_family("precipitation", tmp_path)
    assert np.isfinite(result["best_val"])
    # likelihood default resolved from the registry
    import json

    with open(os.path.join(model_dir, "metadata.json")) as f:
        meta = json.load(f)
    assert meta["convnp_kwargs"]["likelihood"] == "bernoulli-gamma"

    v = Validate(model_dir)
    times = base.coords["time"][:2]
    loss = v.calculate_loss(list(times))
    assert np.isfinite(loss["rmse"])
    # precip predictions must be non-negative in physical units
    preds = loss["pred_mean"][np.isfinite(loss["pred_mean"])]
    assert (preds >= 0).all()

    # wet/dry occurrence skill: P(wet) Brier + hit rate, with the base
    # field's deterministic wetness as baseline
    skill = v.wet_dry_skill(list(times), base_field=base, station_df=stations)
    assert skill["n"] > 0
    assert 0.0 <= skill["brier"] <= 1.0
    assert 0.0 <= skill["hit_rate"] <= 1.0
    assert np.isfinite(skill["baseline_brier"])
    assert np.isfinite(skill["baseline_hit_rate"])

    # mixed-head recalibration: the PIT-bisection fit stored a std_scale
    # and the shipped PIT z_std on the fit dates comes back near 1
    assert meta.get("std_scale", 0) > 0
    all_times = base.coords["time"]
    n_val = max(len(all_times) // 5, 1)
    pit = v.pit_stats(list(all_times[-n_val:]))
    assert pit["n"] > 0 and 0.5 < pit["z_std"] < 1.5


def test_humidity_family(tmp_path):
    model_dir, result, base, dem, stations, out = run_family("humidity", tmp_path)
    assert np.isfinite(result["best_val"])
    import json

    with open(os.path.join(model_dir, "metadata.json")) as f:
        meta = json.load(f)
    assert meta["convnp_kwargs"]["likelihood"] == "cnp-spikes-beta"
    # normalised station targets live in [0, 1] after the shift
    col = [c for c in out["station_df"].columns if c.endswith("_station")][0]
    vals = out["station_df"][col].to_numpy()
    assert vals.min() >= -1e-6 and vals.max() <= 1 + 1e-6

    v = Validate(model_dir)
    loss = v.calculate_loss(list(base.coords["time"][:2]))
    assert np.isfinite(loss["rmse"])
    # physical-unit predictions near the raw humidity range [0, 1]
    preds = loss["pred_mean"][np.isfinite(loss["pred_mean"])]
    assert preds.min() > -0.5 and preds.max() < 1.5


def test_wrf_forecast_cycle(tmp_path):
    """Temperature model driven by a synthetic WRF forecast cycle."""
    from deepsensornz_tpu.data.sources.wrf import WRFSource

    model_dir, result, base, dem, stations, out = run_family("temperature", tmp_path)

    # build a synthetic WRF archive over the DEM area
    wrf_root = tmp_path / "wrf"
    src = WRFSource(str(wrf_root))
    init = datetime(2000, 1, 5)
    ny, nx = 20, 22
    lat2d = np.linspace(dem.coords["latitude"].min(), dem.coords["latitude"].max(), ny)[:, None] \
        + np.zeros((1, nx))
    lon2d = np.linspace(dem.coords["longitude"].min(), dem.coords["longitude"].max(), nx)[None, :] \
        + np.zeros((ny, 1))
    rng = np.random.default_rng(0)
    for valid in src.cycle_hours(init)[:6]:
        path = src.filename_for(init, valid)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        save_dataset(Dataset({
            "T2": Field(288 + rng.standard_normal((ny, nx)), ("y", "x"), {}, "T2"),
            "XLAT": Field(lat2d, ("y", "x"), {}, "XLAT"),
            "XLONG": Field(lon2d, ("y", "x"), {}, "XLONG"),
        }), path, float32=False)

    paths = src.get_filepaths(init)
    assert len(paths) == 6
    vw = ValidateWRF(model_dir, dem, coarsen_factor=2)
    sel_t = base.coords["time"][:1]
    sel = stations[stations["time"].isin(sel_t)]
    pred = vw.predict(paths, src, station_df=None)
    assert pred["mean"].shape[0] == 6
    land = ~np.isnan(vw.pred_grid.data)
    assert np.isfinite(pred["mean"].data[:, land]).all()
    vals = pred["mean"].data[:, land]
    assert vals.min() > -40 and vals.max() < 60  # °C after K→C conversion