"""Diagnose the flagship pressure run's holdout mean bias (+2.2σ).

Signed residual (pred − obs) at holdout stations vs station elevation:
if the bias is an elevation-slope underfit the regression slope is
significantly nonzero and the intercept small; if it is a flat offset the
slope vanishes. Run ON THE TPU against the saved run directory.
"""

import sys

import numpy as np


def main(model_dir="/tmp/flagship_pressure/model"):
    from deepsensornz_tpu.data.synthetic import synthetic_bundle
    from deepsensornz_tpu.pipeline.validate import Validate

    base, dem, stations = synthetic_bundle(
        variable="surface_pressure", n_times=40, base_hw=(32, 32),
        dem_hw=(128, 128), n_stations=100,
    )
    v = Validate(model_dir)
    eval_times = list(base.coords["time"][-8:])
    ids = sorted(stations["station_id"].unique())
    holdout = [str(i) for i in ids[::10]]
    loss = v.calculate_loss(eval_times, remove_stations=holdout)
    err, xt = loss["errors"], loss["xt"]  # err = pred − obs, physical units

    # station elevation at each target: nearest synthetic station
    st = stations.drop_duplicates("station_id")
    s_lat = st["latitude"].to_numpy()
    s_lon = st["longitude"].to_numpy()
    s_elev = st["elevation"].to_numpy()
    s_id = st["station_id"].to_numpy().astype(str)

    # task.xt is (B, M, 2) in NORMALISED coords (calculate_loss stores
    # np.asarray(task.xt) directly) — unmap back to lat/lon
    dp = v.run["data_processor"]
    xt = np.asarray(xt)  # (B, M, 2)
    lat = dp.unmap_x1(xt[..., 0])
    lon = dp.unmap_x2(xt[..., 1])
    e_flat, z_flat, held = [], [], []
    for t in range(err.shape[0]):
        for i in range(err.shape[1]):
            if not np.isfinite(err[t, i]):
                continue
            d2 = (s_lat - lat[t, i]) ** 2 + (s_lon - lon[t, i]) ** 2
            j = int(np.argmin(d2))
            e_flat.append(err[t, i])
            z_flat.append(s_elev[j])
            held.append(s_id[j] in holdout)
    e = np.asarray(e_flat)
    z = np.asarray(z_flat)
    held = np.asarray(held)

    for name, m in (("holdout", held), ("context/target", ~held)):
        if m.sum() < 3:
            continue
        A = np.stack([z[m], np.ones(m.sum())], 1)
        slope, intercept = np.linalg.lstsq(A, e[m], rcond=None)[0]
        print(f"{name}: n={int(m.sum())}  bias={e[m].mean():.1f} Pa  "
              f"rmse={np.sqrt((e[m]**2).mean()):.1f} Pa  "
              f"slope={slope:.3f} Pa/m  intercept={intercept:.1f} Pa  "
              f"elev range {z[m].min():.0f}-{z[m].max():.0f} m", flush=True)
    # elevation distribution of holdout vs rest
    print("holdout elevations:", np.sort(np.unique(z[held])).astype(int).tolist())
    print("all-station elev mean:", float(s_elev.mean()),
          "holdout mean:", float(z[held].mean() if held.any() else np.nan))


if __name__ == "__main__":
    main(*sys.argv[1:])
