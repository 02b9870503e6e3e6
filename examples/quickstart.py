"""Canonical quickstart (role parity with the reference's ``ds_test.py``):
train a small ConvNP on synthetic NZ-like data and predict a gridded field.

Runs anywhere (CPU or TPU) in ~a minute:

    python examples/quickstart.py
"""

import os

import numpy as np

from deepsensornz_tpu.data.synthetic import synthetic_bundle
from deepsensornz_tpu.infer.predict import Predictor
from deepsensornz_tpu.pipeline.preprocess import PreprocessForDownscaling
from deepsensornz_tpu.pipeline.train import Train
from deepsensornz_tpu.pipeline.validate import Validate


def main(model_dir="/tmp/quickstart_model"):
    # DEEPSENSORNZ_EXAMPLE_TINY=1 shrinks every knob so the hermetic test
    # suite can exercise this example end-to-end in seconds
    tiny = os.environ.get("DEEPSENSORNZ_EXAMPLE_TINY") == "1"
    # 1. synthetic raw data: coarse base grid + DEM + ragged stations
    base, dem, stations = synthetic_bundle(
        variable="temperature", n_times=6 if tiny else 16, base_hw=(24, 24),
        dem_hw=(48, 48) if tiny else (96, 96), n_stations=24,
    )

    # 2. feature engineering + normalisation
    pre = PreprocessForDownscaling(variable="temperature")
    processed = pre.run_processing_sequence(
        dem, {"temperature": base}, stations,
        highres_factor=2, lowres_factor=4,
        include_landmask=True, include_time_of_year=True, test_norm=True,
    )

    # 3. tasks + model + training
    training = Train(processed)
    training.setup_task_loader(station_as_context="all", internal_density=32)
    training.initialise_model(
        unet_channels=(8, 8) if tiny else (16, 16, 16), likelihood="cnp",
        compute_dtype="float32")
    result = training.train_model(
        n_epochs=1 if tiny else 5, batch_size=4, lr=1e-3, model_dir=model_dir,
    )
    print("train losses:", [round(l, 3) for l in result["train_losses"]])

    # 4. gridded prediction in physical units
    predictor = Predictor(
        training.model, result["params"], training.dp,
        training.task_loader.target_var_IDs,
        std_scale=result.get("std_scale", 1.0),
    )
    task = training.task_loader([base.coords["time"][0]])
    pred = predictor.predict_grid(
        task, dem, aux_at_targets=training.task_loader.aux_at_targets,
    )
    land = ~np.isnan(dem.data)
    print("predicted mean range over land:",
          float(np.nanmin(pred['mean'].data)), "to",
          float(np.nanmax(pred['mean'].data)), "°C")

    # 5. holdout-station skill
    v = Validate(model_dir)
    loss = v.calculate_loss(list(base.coords["time"][:4]))
    print(f"holdout RMSE: {loss['rmse']:.2f} °C")


if __name__ == "__main__":
    main()
