"""Station-archive ingest benchmark: 619 stations × 1 year, month query.

VERDICT r4 item 7 'done' artifact: month-load wall time and peak RSS for
``StationSource.load_stations_time`` with and without the persisted archive
index + thread-pool load, on a synthetic archive written in the REFERENCE
on-disk schema. Also times the cold index build (the one-off cost).

    python perf/station_ingest_bench.py [--stations 619] [--out archive_dir]
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_archive(root: str, n_stations: int, year: int = 2020) -> None:
    from deepsensornz_tpu.data.sources.stations import save_station_file_reference

    rng = np.random.default_rng(0)
    times = np.arange(np.datetime64(f"{year}-01-01", "s"),
                      np.datetime64(f"{year + 1}-01-01", "s"),
                      np.timedelta64(1, "h"))
    os.makedirs(root, exist_ok=True)
    for i in range(n_stations):
        # ~10% of stations only cover half the year (coverage-filter work)
        t = times if i % 10 else times[: len(times) // 2]
        save_station_file_reference(
            os.path.join(root, f"st_{i:04d}.nc"), f"station {i}", 10000 + i,
            lat=float(rng.uniform(-47, -34)), lon=float(rng.uniform(166, 179)),
            elev=float(rng.uniform(0, 1500)),
            times=t,
            values_by_var={"dry_bulb": rng.normal(12, 5, len(t))},
        )


def rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--stations", type=int, default=619)
    ap.add_argument("--out", default=None)
    ns = ap.parse_args(argv)

    from deepsensornz_tpu.data.sources.stations import StationSource

    root = ns.out or os.path.join(tempfile.mkdtemp(), "stations")
    t0 = time.perf_counter()
    build_archive(root, ns.stations)
    t_build = time.perf_counter() - t0

    month = np.arange(np.datetime64("2020-09-01", "s"),
                      np.datetime64("2020-10-01", "s"),
                      np.timedelta64(1, "h"))

    src = StationSource(root)
    t0 = time.perf_counter()
    df_old = src.load_stations_time("temperature", month, use_index=False)
    t_noindex = time.perf_counter() - t0

    t0 = time.perf_counter()
    src.build_index("temperature")
    t_index_cold = time.perf_counter() - t0

    t0 = time.perf_counter()
    df_new = src.load_stations_time("temperature", month)
    t_indexed = time.perf_counter() - t0

    # a fresh source instance = a fresh operational process: index read
    # from disk, no in-memory warm state
    src2 = StationSource(root)
    t0 = time.perf_counter()
    df_cold = src2.load_stations_time("temperature", month)
    t_indexed_cold_proc = time.perf_counter() - t0

    same = (len(df_old) == len(df_new) == len(df_cold)
            and sorted(df_old["station_name"].unique())
            == sorted(df_new["station_name"].unique()))
    print(json.dumps({
        "metric": "station_month_ingest",
        "stations": ns.stations,
        "archive_build_s": round(t_build, 2),
        "load_noindex_s": round(t_noindex, 2),
        "index_build_cold_s": round(t_index_cold, 2),
        "load_indexed_s": round(t_indexed, 2),
        "load_indexed_fresh_process_s": round(t_indexed_cold_proc, 2),
        "speedup": round(t_noindex / t_indexed, 2),
        "rows": len(df_new),
        "outputs_identical": bool(same),
        "peak_rss_mb": round(rss_mb(), 1),
    }))


if __name__ == "__main__":
    main()
