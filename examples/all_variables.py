"""Train every supported variable family end-to-end (tiny configs).

Capability sweep over the full registry — temperature / precipitation /
surface_pressure / 10m u+v wind / humidity — with each variable's default
likelihood and normalisation (``config.LIKELIHOODS`` / ``NORMALISATION``).

    python examples/all_variables.py
"""

import os
import sys
import tempfile

import numpy as np

from deepsensornz_tpu import config as cfg
from deepsensornz_tpu.data.synthetic import synthetic_bundle
from deepsensornz_tpu.pipeline.preprocess import PreprocessForDownscaling
from deepsensornz_tpu.pipeline.train import Train
from deepsensornz_tpu.pipeline.validate import Validate


def main(out_root=None):
    tiny = os.environ.get("DEEPSENSORNZ_EXAMPLE_TINY") == "1"
    out_root = out_root or tempfile.mkdtemp(prefix="all_vars_")
    results = {}
    for variable in cfg.VARIABLE_OPTIONS:
        base, dem, stations = synthetic_bundle(
            variable=variable, n_times=6 if tiny else 10, base_hw=(20, 20),
            dem_hw=(40, 40) if tiny else (64, 64),
            n_stations=16, seed=hash(variable) % 1000,
        )
        pre = PreprocessForDownscaling(variable=variable)
        processed = pre.run_processing_sequence(
            dem, {variable: base}, stations,
            highres_factor=2, lowres_factor=4, test_norm=True,
        )
        training = Train(processed)
        training.setup_task_loader(station_as_context="all", internal_density=24)
        training.initialise_model(
            unet_channels=(8, 8), compute_dtype="float32",
            decoder_channels=8, mlp_hidden=8,
        )
        model_dir = os.path.join(out_root, variable)
        r = training.train_model(n_epochs=1 if tiny else 2, batch_size=4,
                                 lr=1e-3, model_dir=model_dir, verbose=False)
        v = Validate(model_dir)
        loss = v.calculate_loss(list(base.coords["time"][:2]))
        results[variable] = {
            "likelihood": cfg.LIKELIHOODS[variable],
            "normalisation": cfg.NORMALISATION[variable],
            "best_val_nll": round(float(r["best_val"]), 3),
            "holdout_rmse": round(loss["rmse"], 3),
        }
        print(f"{variable:28s} lik={results[variable]['likelihood']:16s} "
              f"val={results[variable]['best_val_nll']:<8} "
              f"rmse={results[variable]['holdout_rmse']}", flush=True)
        assert np.isfinite(r["best_val"]), variable
        assert np.isfinite(loss["rmse"]), variable
    print(f"all {len(results)} variable families trained + validated OK")
    return results


if __name__ == "__main__":
    main(*(sys.argv[1:2] or [None]))
