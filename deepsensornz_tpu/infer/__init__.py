"""Inference: gridded/off-grid prediction, AR sampling, netCDF output."""

from deepsensornz_tpu.infer.predict import Predictor, Prediction  # noqa: F401
