"""Operational-pattern benchmark: one MONTH of hourly inference end-to-end.

Mirrors the reference's production pattern (``outputs/infer.py:93-111``:
~720 tasks per monthly predict call, full prediction grid, one netCDF out),
at reference data scale: 619 stations, ERA5 0.1° context, 0.05° output grid,
flagship model. Measures wall time for task packing + device inference +
netCDF write.

    python perf/operational_bench.py [--hours 720] [--chunk 24]
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--hours", type=int, default=720)
    ap.add_argument("--chunk", type=int, default=24)
    ap.add_argument("--stations", type=int, default=619)
    ap.add_argument("--density", type=int, default=500)
    ns = ap.parse_args(argv)

    import jax

    from deepsensornz_tpu.data.processor import DataProcessor
    from deepsensornz_tpu.data.synthetic import synthetic_base_grid, synthetic_dem, synthetic_stations
    from deepsensornz_tpu.infer.predict import Predictor
    from deepsensornz_tpu.infer.writer import save_prediction
    from deepsensornz_tpu.models.convnp import ConvNP, ConvNPConfig
    from deepsensornz_tpu.task.loader import TaskLoader

    t_setup = time.perf_counter()
    dem = synthetic_dem(278, 260)  # 0.05° NZ grid
    base = synthetic_base_grid("temperature", n_times=ns.hours,
                               n_lat=139, n_lon=130, freq_hours=1)
    stations = synthetic_stations(base, dem, "temperature",
                                  n_stations=ns.stations, missing_frac=0.08)
    dp = DataProcessor()
    dp.set_coord_maps_from_extent(
        dem.coords["latitude"].min(), dem.coords["latitude"].max(),
        dem.coords["longitude"].min(), dem.coords["longitude"].max(),
    )
    base_n = dp(base, method="mean_std")
    dem_n = dp(dem.fillna(0.0).rename("elevation"), method="min_max")
    st_n = dp(stations, method="mean_std")
    tl = TaskLoader(context=[base_n, st_n], target=st_n, aux_at_targets=dem_n,
                    internal_density=ns.density, grid_multiple=16)
    cfg = ConvNPConfig(unet_channels=(64,) * 4, likelihood="gnp", rank=64,
                       internal_density=ns.density)
    model = ConvNP(cfg)
    times = base.coords["time"]
    task0 = tl(list(times[: ns.chunk]))
    params = model.init(jax.random.key(0), task0)
    predictor = Predictor(model, params, dp, [c for c in stations.columns if c.endswith("_station")][0])
    print(f"setup {time.perf_counter()-t_setup:.1f}s", flush=True)

    # warm compile with one chunk
    t0 = time.perf_counter()
    _ = predictor.predict_grid(task0, dem, aux_at_targets=dem_n)
    print(f"compile+first chunk {time.perf_counter()-t0:.1f}s", flush=True)

    t_pack = t_dev = 0.0
    out_dir = tempfile.mkdtemp()
    preds = []
    t_month = time.perf_counter()
    for s in range(0, ns.hours, ns.chunk):
        tp = time.perf_counter()
        task = tl(list(times[s: s + ns.chunk]))
        t_pack += time.perf_counter() - tp
        td = time.perf_counter()
        pred = predictor.predict_grid(task, dem, aux_at_targets=dem_n,
                                      times=times[s: s + ns.chunk])
        t_dev += time.perf_counter() - td
        preds.append(pred)
    t_write0 = time.perf_counter()
    save_prediction(preds[0], os.path.join(out_dir, "month_first_chunk.nc"),
                    "temperature", "bench", mean_only=True)
    t_write = time.perf_counter() - t_write0
    total = time.perf_counter() - t_month
    print(json.dumps({
        "metric": "month_hourly_inference_wall",
        "hours": ns.hours,
        "value": round(total, 2),
        "unit": "s",
        "pack_s": round(t_pack, 2),
        "device_s": round(t_dev, 2),
        "write_one_chunk_s": round(t_write, 2),
        "tasks_per_sec": round(ns.hours / total, 1),
        # NOTE: through a remote-device tunnel, device_s is dominated by
        # downloading the full mean/std maps (~14 MB/chunk); on a real TPU
        # host this is PCIe-speed and the cycle bench (bench.py) reflects
        # the compute latency.
    }), flush=True)


if __name__ == "__main__":
    main()
