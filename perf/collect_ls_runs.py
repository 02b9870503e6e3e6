"""Collect lengthscale-study run results: metrics + LEARNED lengthscales.

Usage: PYTHONPATH=/root/repo python perf/collect_ls_runs.py <run_dir>...

Each ``perf/train_flagship.py`` out_dir gets one JSON line: holdout/val
metrics from ``metrics.json`` plus the checkpoint's four effective SetConv
length-scales (softplus(raw) + 0.5/density), read straight from
``model/params.msgpack``. The learned-vs-init comparison is the evidence
behind the round-3 finding that length-scales are init-determined at the
reference recipe (docs/results/flagship_density_frontier.json), and the
readout for the ``lengthscale_lr_mult`` self-tuning runs.
"""
import json
import math
import os
import sys

from flax import serialization as fser


def softplus(x):
    return math.log1p(math.exp(-abs(x))) + max(x, 0.0)


def report(run_dir):
    with open(os.path.join(run_dir, "metrics.json")) as f:
        m = json.load(f)
    dens = m["config"]["internal_density"]
    floor = 0.5 / dens
    with open(os.path.join(run_dir, "model", "params.msgpack"), "rb") as f:
        params = fser.msgpack_restore(f.read())
    inner = params.get("params", params)
    ls = {
        k: round(softplus(float(v)) + floor, 5)
        for k, v in sorted(inner.items())
        if k.startswith("ls_")
    }
    row = {
        "run": os.path.basename(run_dir),
        "density": dens,
        "init_lengthscale": m["config"].get("init_lengthscale"),
        "epochs_run": m["epochs_run"],
        "best_val_nll": round(m["best_val_nll"], 4),
        "holdout_rmse": m["holdout_rmse_C"],
        "baseline_rmse": m["baseline_rmse_C"],
        "z_mean": round(m["calibration"]["z_mean"], 3),
        "z_std": round(m["calibration"]["z_std"], 3),
        "gate": m["calibration_gate"],
        "learned_ls": ls,
    }
    if "wet_dry_skill" in m:
        row["wet_dry_skill"] = m["wet_dry_skill"]
    return row


if __name__ == "__main__":
    for d in sys.argv[1:]:
        try:
            print(json.dumps(report(d)))
        except Exception as e:
            print(f"{d}: {type(e).__name__}: {e}")
