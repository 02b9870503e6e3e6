"""Flagship hardware training run: REGISTRY-DEFAULT gnp at density 500.

Trains the reference's default model configuration
(``nzdownscale/dataprocess/config.py:2685-2689``: U-Net (64,)×4,
``likelihood='gnp'``, ``internal_density=500``) with the reference recipe
(AdamW lr 5e-5, plateau LR, early stop; ``train.py:336-434``) on an
NZ-scale synthetic bundle, then evaluates holdout skill, the base-field
baseline, and calibration. The point of the run: the registry-default gnp
must be good OUT OF THE BOX now that the mean anchor defaults on
(``ConvNPConfig.anchor_weight``) — joint-NLL training otherwise decouples
from point RMSE (measured in round 1: 3.18 °C unanchored vs 0.81 °C
anchored at identical NLL).

Run ON THE TPU (PYTHONPATH must include /root/.axon_site):

    nohup python perf/train_flagship.py /tmp/flagship_run > /tmp/flagship.log &

Writes ``docs/results/flagship_gnp_default_metrics.json`` + loss curve.
"""

import json
import os
import sys
import time

import numpy as np


def main(out_dir="/tmp/flagship_run", n_epochs=30, variable="temperature",
         anchor_decay=None, internal_density=500, seed=0,
         lengthscale_lr_mult=1.0, batch_size=8, world=None, **convnp_extra):
    os.makedirs(out_dir, exist_ok=True)
    import jax

    print("devices:", jax.devices(), flush=True)

    from deepsensornz_tpu.data.synthetic import synthetic_bundle
    from deepsensornz_tpu.pipeline.preprocess import PreprocessForDownscaling
    from deepsensornz_tpu.pipeline.train import Train
    from deepsensornz_tpu.pipeline.validate import Validate
    from deepsensornz_tpu import plot as dplot

    base, dem, stations = synthetic_bundle(
        variable=variable, n_times=40, base_hw=(32, 32),
        dem_hw=(128, 128), n_stations=100, seed=seed, world=world,
    )
    pre = PreprocessForDownscaling(variable=variable)
    processed = pre.run_processing_sequence(
        dem, {variable: base}, stations,
        highres_factor=2, lowres_factor=4, include_time_of_year=True,
    )
    training = Train(processed)
    # reference training recipe: complementary station split
    # (TaskLoader_SampleStations, train.py:525-637)
    training.setup_task_loader(station_as_context="split",
                               internal_density=internal_density)
    # the reference's DEFAULT model kwargs (config.py:2685-2689): (64,)*4,
    # likelihood 'gnp', density 500 — passed explicitly because
    # initialise_model otherwise resolves the per-VARIABLE likelihood
    # (cnp for temperature)
    from deepsensornz_tpu import config as _cfg

    training.initialise_model(
        likelihood=convnp_extra.pop(
            "likelihood", _cfg.CONVNP_KWARGS_DEFAULT["likelihood"]),
        remat=True,
        **convnp_extra,
    )
    print("model config:", training.model_config_dict, flush=True)

    model_dir = os.path.join(out_dir, "model")
    # anchor_decay=k: full anchor for k epochs, then linear →0 by the end —
    # the final epochs optimise the pure joint NLL so the reported spread
    # can adapt to the anchored-mean residuals
    schedule = None
    if anchor_decay is not None:
        k = int(anchor_decay)
        span = max(n_epochs - k, 1)
        schedule = lambda e: 1.0 if e < k else max(1.0 - (e - k + 1) / span, 0.0)  # noqa: E731
    t0 = time.time()
    result = training.train_model(
        n_epochs=n_epochs, batch_size=batch_size, lr=5e-5, model_dir=model_dir,
        verbose=True, anchor_schedule=schedule,
        lengthscale_lr_mult=lengthscale_lr_mult,
    )
    train_s = time.time() - t0
    dplot.make_loss_plot(result["train_losses"], result["val_losses"],
                         os.path.join(out_dir, "loss.png"))

    v = Validate(model_dir)
    eval_times = list(base.coords["time"][-8:])
    ids = sorted(stations["station_id"].unique())
    holdout = [str(i) for i in ids[::10]]  # 10 held-out stations
    unseen = v.calculate_loss(eval_times, remove_stations=holdout)
    sel = stations[stations["time"].isin(eval_times)]
    baseline = v.calculate_loss_base(base, sel)
    calib = v.calibration_stats(eval_times, remove_stations=holdout)
    pit = v.pit_stats(eval_times, remove_stations=holdout)
    wet_dry = None
    if training.model.cfg.likelihood == "bernoulli-gamma":
        wet_dry = v.wet_dry_skill(eval_times, base_field=base,
                                  station_df=stations,
                                  remove_stations=holdout)
    # proper score of the whole predictive (round-4 Validate.crps)
    crps = v.crps(eval_times, remove_stations=holdout)
    # spatial-extrapolation holdout: ALL stations in the southern third of
    # the latitude span leave the context; skill scored AT them (the regime
    # a downscaler actually fails in) vs the interpolation remainder
    lat_lo = float(stations["latitude"].min())
    lat_hi = float(stations["latitude"].max())
    cut = lat_lo + (lat_hi - lat_lo) / 3.0
    try:
        extrap = v.extrapolation_loss(eval_times,
                                      lat_range=(lat_lo - 1e-6, cut))
        extrap_row = {
            "lat_range": [lat_lo, cut],
            "n_held_out_stations": len(extrap["held_out_stations"]),
            "extrapolation": extrap["extrapolation"],
            "interpolation": extrap["interpolation"],
        }
    except ValueError:
        extrap_row = None

    metrics = {
        "config": training.model_config_dict,
        "recipe": {"n_epochs": n_epochs, "batch_size": batch_size, "lr": 5e-5,
                   "station_as_context": "split",
                   "anchor_decay": anchor_decay,
                   "internal_density": internal_density, "seed": seed,
                   "world": world},
        "epochs_run": len(result["train_losses"]),
        "train_wall_s": round(train_s, 1),
        "best_val_nll": float(result["best_val"]),
        "holdout_rmse_C": round(unseen["rmse"], 3),
        "baseline_rmse_C": round(baseline["rmse"], 3),
        "std_scale": result.get("std_scale", 1.0),
        "calibration": calib,
        # randomized-PIT: head-agnostic calibration (the z diagnostic above
        # is only meaningful for Gaussian heads)
        "calibration_pit": pit,
        "calibration_gate": Validate.calibration_gate(calib),
        "calibration_gate_pit": Validate.calibration_gate(pit),
    }
    metrics["crps"] = crps
    # a deterministic forecast's CRPS is its MAE — the base-copy baseline's
    # proper score to beat (calculate_loss_base gained "mae" in round 4)
    if "mae" in baseline:
        metrics["crps"]["baseline_crps_det_mae"] = round(baseline["mae"], 5)
    if extrap_row is not None:
        metrics["extrapolation_holdout"] = extrap_row
    if wet_dry is not None:
        metrics["wet_dry_skill"] = wet_dry
    print(json.dumps(metrics, indent=2), flush=True)
    with open(os.path.join(out_dir, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=2)
    return metrics


if __name__ == "__main__":
    # usage: train_flagship.py [out_dir] [key=value ...]  (values are JSON,
    # e.g. top_kernel=3 for the fast-level-0 variant, docs/perf_unet.md)
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/flagship_run"
    extra = {}
    for kv in sys.argv[2:]:
        k, _, raw = kv.partition("=")
        extra[k] = json.loads(raw)
    main(out, **extra)
