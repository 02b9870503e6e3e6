"""Prediction output writer: compressed netCDF with provenance.

Parity with the operational writer (``outputs/infer.py:41-46,93-112`` +
``nzdownscale/dataprocess/utils.py:291-327``): float32, compressed,
chunked netCDF with standard provenance attributes, one file per month so
long jobs resume at the failed month.
"""

from __future__ import annotations

import datetime
import getpass
import os
import sys

from deepsensornz_tpu.data.grid import Dataset

STANDARD_ATTRS = {
    "institution": "Bodeker Scientific",
    "source": "deepsensornz_tpu ConvNP downscaling",
}


def standard_metadata(extra: dict | None = None) -> dict:
    """Provenance attrs (``write_standard_metadata``, infer.py:41-46)."""
    meta = dict(STANDARD_ATTRS)
    meta["author"] = getpass.getuser()
    meta["created"] = datetime.datetime.now(datetime.timezone.utc).isoformat()
    meta["script"] = os.path.abspath(sys.argv[0]) if sys.argv else ""
    meta.update(extra or {})
    return meta


def save_prediction(prediction: Dataset, path: str, variable: str,
                    model_name: str = "", attrs: dict | None = None,
                    mean_only: bool = False,
                    packing: str | None = None) -> None:
    """Write a Prediction to netCDF (monthly-file pattern in the CLI).

    ``packing="int16"`` writes CF-packed int16 variables (half the bytes,
    ~1/65000-of-range precision; standard readers unpack transparently) —
    pairs with ``Predictor(transfer_dtype="int16")`` for an end-to-end
    quantized serving path."""
    from deepsensornz_tpu.data.grid import save_dataset

    out = prediction
    if mean_only:  # infer.py:104 strips to the mean var
        out = Dataset({"mean": prediction["mean"]}, dict(prediction.attrs))
    out.attrs.update(standard_metadata(
        {"variable": variable, "model_name": model_name, **(attrs or {})}
    ))
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    save_dataset(out, path, compress=True, float32=True, packing=packing)
