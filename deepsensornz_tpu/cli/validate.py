"""Batch validation CLI.

Role parity with the reference's batch validation scripts
(``validation_script1.py``, ``validation_scripts/validation_script.py``):
predicts month-sized batches against held-out stations and writes
per-month prediction netCDFs + a JSON metrics summary.

    python -m deepsensornz_tpu.cli.validate --var temperature \
        --model_name model --year 2020 --months 1 2 3
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from deepsensornz_tpu.cli.infer import DEFAULT_HOLDOUT_STATIONS, month_hours
from deepsensornz_tpu.data.features import rmse
from deepsensornz_tpu.infer.writer import save_prediction
from deepsensornz_tpu.pipeline.validate import ValidateERA


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--var", required=True)
    ap.add_argument("--model_name", required=True)
    ap.add_argument("--year", type=int, required=True)
    ap.add_argument("--months", type=int, nargs="*", default=None)
    ap.add_argument("--out_dir", default="validation")
    ap.add_argument("--highres_factor", type=int, default=10)
    ap.add_argument("--remove_stations", nargs="*", default=DEFAULT_HOLDOUT_STATIONS)
    ns = ap.parse_args(argv)

    from deepsensornz_tpu.data.sources.era5 import ERA5Source
    from deepsensornz_tpu.data.sources.stations import StationSource
    from deepsensornz_tpu.data.sources.topography import topography_from_paths
    from deepsensornz_tpu.paths import get_data_paths

    paths = get_data_paths()
    model_dir = os.path.join(paths["save_model"]["fpath"], ns.var, ns.model_name)
    dem = topography_from_paths(paths).load()
    validate = ValidateERA(model_dir, dem, highres_factor=ns.highres_factor)
    era5 = ERA5Source(paths["era5"]["parent"])
    stations = StationSource(paths["stations"]["parent"])

    metrics = {}
    for month in ns.months or range(1, 13):
        hours = month_hours(ns.year, month)
        base = era5.load_time(ns.var, hours)
        sdf_all = stations.load_stations_time(ns.var, hours)
        pred = validate.predict(
            hours, {ns.var: base}, station_df=sdf_all,
            remove_stations=ns.remove_stations,
        )
        # skill at the held-out stations: nearest prediction cell vs obs
        holdout = sdf_all[sdf_all["station_name"].isin(ns.remove_stations)]
        col = [c for c in holdout.columns if c.endswith("_station")]
        errs = []
        if len(holdout) and col:
            for _, row in holdout.iterrows():
                try:
                    cell = pred["mean"].sel(
                        time=np.datetime64(row["time"]),
                        latitude=row["latitude"], longitude=row["longitude"],
                        method="nearest",
                    )
                except Exception:
                    continue
                if np.isfinite(cell.data) and np.isfinite(row[col[0]]):
                    errs.append(float(cell.data) - float(row[col[0]]))
        metrics[f"{ns.year}-{month:02d}"] = {
            "holdout_rmse": float(np.sqrt(np.mean(np.square(errs)))) if errs else None,
            "n_holdout_obs": len(errs),
        }
        out_path = os.path.join(
            ns.out_dir, ns.var, ns.model_name,
            f"val_{ns.var}_{ns.year:04d}_{month:02d}.nc",
        )
        save_prediction(pred, out_path, ns.var, ns.model_name)
        print(f"{ns.year}-{month:02d}: rmse={metrics[f'{ns.year}-{month:02d}']}")

    summary = os.path.join(ns.out_dir, ns.var, ns.model_name, "metrics.json")
    with open(summary, "w") as f:
        json.dump(metrics, f, indent=2)
    print(f"wrote {summary}")


if __name__ == "__main__":
    main()
