"""End-to-end validation study on synthetic data.

Role parity with the reference's validation notebooks
(``validation_notebook.py``): trains a model, then evaluates

- seen vs UNSEEN (held-out) station skill,
- the base-field-at-station baseline (bilinear ERA5 interp analog),
- a linear-regression bias-corrected baseline,
- a daily loss curve,

and renders the gen_test_fig panels + timeseries comparison.

    python examples/validation_study.py [out_dir]
"""

import os
import sys

import numpy as np

from deepsensornz_tpu.data.synthetic import synthetic_bundle
from deepsensornz_tpu.pipeline.preprocess import PreprocessForDownscaling
from deepsensornz_tpu.pipeline.train import Train
from deepsensornz_tpu.pipeline.validate import Validate
from deepsensornz_tpu import plot as dplot


def main(out_dir="/tmp/validation_study"):
    tiny = os.environ.get("DEEPSENSORNZ_EXAMPLE_TINY") == "1"
    os.makedirs(out_dir, exist_ok=True)
    base, dem, stations = synthetic_bundle(
        variable="temperature", n_times=8 if tiny else 20, base_hw=(24, 24),
        dem_hw=(48, 48) if tiny else (96, 96), n_stations=24,
    )
    pre = PreprocessForDownscaling(variable="temperature")
    processed = pre.run_processing_sequence(
        dem, {"temperature": base}, stations,
        highres_factor=2, lowres_factor=4, include_time_of_year=True,
    )
    training = Train(processed)
    training.setup_task_loader(station_as_context="all", internal_density=32)
    training.initialise_model(
        unet_channels=(8, 8) if tiny else (16, 16, 16), likelihood="cnp",
        compute_dtype="float32")
    model_dir = os.path.join(out_dir, "model")
    result = training.train_model(n_epochs=1 if tiny else 6, batch_size=4,
                                  lr=1e-3, model_dir=model_dir, verbose=False)
    dplot.make_loss_plot(result["train_losses"], result["val_losses"],
                         os.path.join(out_dir, "loss.png"))

    v = Validate(model_dir)
    eval_times = list(base.coords["time"][-4:])

    # seen-station skill (all stations in context)
    seen = v.calculate_loss(eval_times)
    print(f"seen-station RMSE:    {seen['rmse']:.3f}")

    # unseen-station skill: hold half of the stations out of the context
    ids = sorted(stations["station_id"].unique())
    holdout = [str(i) for i in ids[::2]]
    unseen = v.calculate_loss(eval_times, remove_stations=holdout)
    print(f"unseen-station RMSE:  {unseen['rmse']:.3f}")

    # base-at-station baseline (ERA5-interp analog)
    sel = stations[stations["time"].isin(eval_times)]
    baseline = v.calculate_loss_base(base, sel)
    print(f"base-field baseline RMSE: {baseline['rmse']:.3f} (n={baseline['n']})")

    # linear-regression bias-corrected baseline (validation_notebook.py:814-842)
    col = [c for c in stations.columns if c.endswith("_station")][0]
    tr_rows = stations[~stations["time"].isin(eval_times)]
    xs, ys = [], []
    for _, row in tr_rows.iterrows():
        try:
            cell = base.sel(time=np.datetime64(row["time"]),
                            latitude=row["latitude"], longitude=row["longitude"],
                            method="nearest")
            xs.append(float(cell.data)); ys.append(float(row[col]))
        except Exception:
            pass
    A = np.vstack([xs, np.ones(len(xs))]).T
    coef, _, _, _ = np.linalg.lstsq(A, np.asarray(ys), rcond=None)
    errs = []
    for _, row in sel.iterrows():
        cell = base.sel(time=np.datetime64(row["time"]),
                        latitude=row["latitude"], longitude=row["longitude"],
                        method="nearest")
        errs.append(coef[0] * float(cell.data) + coef[1] - float(row[col]))
    print(f"regression-corrected baseline RMSE: {np.sqrt(np.mean(np.square(errs))):.3f}")

    # HiRes-base baseline study (validation_notebook.py:862-908): per-station
    # |error| stats of an alternative, higher-resolution base product —
    # here the base bilinearly refined to 2× resolution (the notebook loads
    # a HiRes ERA5 product); reported as mean-of-means / mean-of-stds
    # across stations, same as the notebook printout.
    hires = base.interp_like(dem.coarsen(2), method="linear",
                             dims=("latitude", "longitude"))
    hr = v.per_station_loss_base(hires, sel)
    lr = v.per_station_loss_base(base, sel)
    print(f"HiRes-base baseline: mean|err| {hr['mean_of_means']:.3f} "
          f"(std {hr['mean_of_stds']:.3f}, {hr['n_stations']} stations) "
          f"vs lowres base {lr['mean_of_means']:.3f}")

    # daily loss curve over the evaluation window
    daily = {str(t)[:10]: v.calculate_loss([t])["rmse"] for t in eval_times}
    print("daily RMSE:", {k: round(x, 3) for k, x in daily.items()})

    # panels + timeseries
    from deepsensornz_tpu.infer.predict import Predictor

    predictor = v.predictor
    task = v.task_loader(eval_times[:1], seed_override=42)
    pred = predictor.predict_grid(
        task, dem, aux_at_targets=v.task_loader.aux_at_targets, n_samples=2,
    )
    fig = dplot.gen_test_fig(base.sel(time=eval_times[:1]), pred)
    fig.savefig(os.path.join(out_dir, "panels.png"), dpi=110)
    print(f"figures written to {out_dir}")


if __name__ == "__main__":
    main(*(sys.argv[1:2] or ["/tmp/validation_study"]))
