"""Flagship-scale JOINT wind u+v model (dim_yt=2) on hardware.

The reference trains one model per wind component
(``nzdownscale/dataprocess/config.py:162-169`` gives u and v separate cnp
entries; ``train_downscaling.py`` runs per-variable). This framework's
loader/heads/Predictor support multi-channel targets natively (round-3
``Predictor`` upgrade), so one model predicts both components with
per-channel unnormalisation — half the serving cost of the reference's
two-model pattern, plus cross-component correlation available to the gnp
head.

Run ON THE TPU:

    nohup python perf/train_wind_uv.py /tmp/wind_uv > /tmp/wind_uv.log &

Writes ``metrics.json`` with per-channel holdout RMSE vs the base-field
baseline and per-channel calibration (recalibrated via the artifact-level
std_scale applied to both channels).
"""

import json
import os
import sys
import time

import numpy as np


def main(out_dir="/tmp/wind_uv", n_epochs=30, likelihood="cnp",
         density=500, width=64, n_times=40, lengthscale_lr_mult=1.0,
         init_lengthscale=None, seed=0):
    os.makedirs(out_dir, exist_ok=True)
    import jax

    print("devices:", jax.devices(), flush=True)

    from deepsensornz_tpu.data.processor import DataProcessor
    from deepsensornz_tpu.data.synthetic import synthetic_base_grid, synthetic_dem
    from deepsensornz_tpu.models.convnp import ConvNP, ConvNPConfig
    from deepsensornz_tpu.pipeline.train import fit_std_scale
    from deepsensornz_tpu.task.loader import TaskLoader
    from deepsensornz_tpu.train.trainer import Trainer

    try:
        import pandas as pd
    except Exception as e:  # pragma: no cover
        raise SystemExit(f"pandas required: {e}")

    # --- synthetic wind: two coupled components over the NZ DEM ------------
    # data seed offsets keep u/v/dem draws distinct within a seed while the
    # seed knob shifts the whole bundle (robustness runs) — including the
    # station-pick/jitter/missingness/noise rng below (offset 3, disjoint
    # from the dem/u/v offsets 0/1/5)
    rng = np.random.default_rng(10 * seed + 3)
    dem = synthetic_dem(128, 128, seed=10 * seed)
    u_base = synthetic_base_grid("10m_u_component_of_wind", n_times, 32, 32,
                                 seed=10 * seed + 1)
    v_base = synthetic_base_grid("10m_v_component_of_wind", n_times, 32, 32,
                                 seed=10 * seed + 5)

    # stations: both components sampled from the base + terrain channelling
    # (elevation speeds up u, slows v — learnable from the aux channel)
    land = np.argwhere(~np.isnan(dem.data))
    pick = land[rng.choice(len(land), size=100, replace=False)]
    lats = dem.coords["latitude"][pick[:, 0]]
    lons = dem.coords["longitude"][pick[:, 1]]
    elevs = dem.data[pick[:, 0], pick[:, 1]]
    res = dem.resolution("latitude")
    lats = lats + rng.uniform(-0.4, 0.4, 100) * res
    lons = lons + rng.uniform(-0.4, 0.4, 100) * res
    rows = []
    for ti, t in enumerate(u_base.coords["time"]):
        us = u_base.isel(time=ti)
        vs = v_base.isel(time=ti)
        for si in range(100):
            if rng.random() < 0.1:
                continue
            u = float(us.sel(latitude=float(lats[si]), longitude=float(lons[si]),
                             method="nearest").data)
            v = float(vs.sel(latitude=float(lats[si]), longitude=float(lons[si]),
                             method="nearest").data)
            e = float(elevs[si])
            rows.append({
                "time": t, "latitude": float(lats[si]),
                "longitude": float(lons[si]), "station_id": si,
                "u_station": u * (1 + 0.0004 * e) + rng.normal(0, 0.3),
                "v_station": v * (1 - 0.0003 * e) + rng.normal(0, 0.3),
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

    from deepsensornz_tpu.data.grid import Dataset as _DS

    tl = TaskLoader(
        context=[_DS({"u10": u_n, "v10": v_n}), st_n],
        target=st_n,
        aux_at_targets=dem_n,
        context_sampling=["all", "split"],
        target_sampling="split",
        links=[(1, 0)],
        internal_density=density, grid_multiple=16,
    )
    assert tl.target_dim() == 2

    cfg = ConvNPConfig(
        unet_channels=(width,) * 4, likelihood=likelihood,
        internal_density=density, dim_yt=2, remat=True,
        init_lengthscale=init_lengthscale,
    )
    model = ConvNP(cfg)
    times = u_base.coords["time"]
    train_tasks = tl(list(times[:-8]), datewise_deterministic=True)
    val_tasks = tl(list(times[-8:]), datewise_deterministic=True)

    t0 = time.time()
    trainer = Trainer(model, lr=5e-5, lengthscale_lr_mult=lengthscale_lr_mult)
    out = trainer.fit(train_tasks, val_tasks, n_epochs=n_epochs, batch_size=8,
                      verbose=True)
    train_s = time.time() - t0

    std_scale = fit_std_scale(model, out["params"], val_tasks)
    print("std_scale:", std_scale, flush=True)

    # --- holdout evaluation, per channel, THROUGH the shipped Validate
    # layer (VERDICT r4 item 5: a shipped capability validates through the
    # shipped API — per-channel loss/calibration/CRPS, each channel
    # unnormalised with its own stats) ---------------------------------------
    from deepsensornz_tpu.pipeline.validate import Validate

    run = {"model": model, "params": out["params"], "task_loader": tl,
           "data_processor": dp, "metadata": {}, "variable": "wind",
           "std_scale": std_scale}
    v = Validate(run=run)
    eval_times = list(times[-8:])
    loss = v.calculate_loss(eval_times)
    cal = v.calibration_stats(eval_times)
    crps = v.crps(eval_times)
    metrics = {"config": {"likelihood": likelihood, "dim_yt": 2,
                          "internal_density": density,
                          "unet_channels": [width] * 4},
               "epochs_run": len(out["train_losses"]),
               "train_wall_s": round(train_s, 1),
               "best_val_nll": float(out["best_val"]),
               "std_scale": std_scale,
               "evaluated_via": "pipeline.validate.Validate"}
    for c, name in enumerate(("u", "v")):
        vid = f"{name}_station"
        base = (u_base if c == 0 else v_base)
        # baseline: base field at nearest cell vs obs
        raw_obs = stations[stations["time"].isin(times[-8:])]
        bl = Validate._base_pairs_at_stations(
            base, raw_obs.rename(columns={vid: "w_station"})[
                ["time", "latitude", "longitude", "w_station"]])
        bl_rmse = float(np.sqrt(np.mean((bl[1] - bl[2]) ** 2)))
        metrics[name] = {
            "holdout_rmse": round(loss["per_channel"][vid]["rmse"], 3),
            "baseline_rmse": round(bl_rmse, 3),
            "z_std": round(cal["per_channel"][vid]["z_std"], 3),
            "coverage_95": round(cal["per_channel"][vid]["coverage_95"], 3),
            "crps": round(crps["per_channel"][vid], 3),
        }
    print(json.dumps(metrics, indent=2), flush=True)
    with open(os.path.join(out_dir, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=2)
    return metrics


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/wind_uv"
    extra = {}
    for kv in sys.argv[2:]:
        k, _, raw = kv.partition("=")
        extra[k] = json.loads(raw)
    main(out, **extra)
