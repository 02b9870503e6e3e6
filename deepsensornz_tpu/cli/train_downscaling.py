"""Training CLI: ``python -m deepsensornz_tpu.cli.train_downscaling -arg_path args.yaml``.

Rebuild of ``experiments/deepsensor/train/train_downscaling.py``:

- YAML argument file with typed validation (``train_downscaling.py:28-46``
  → :func:`deepsensornz_tpu.utils.validate_and_convert_args`),
- ERA5 year-range mode (``:58-77``); data-processor reuse-or-create
  (``:151-173``); ConvNP kwargs assembly with per-variable likelihood
  default and ``auto_set_internal_density`` (``:115-132``),
- the YAML is archived into the model directory for reproducibility
  (``:175``),
- artifacts written: params.msgpack / opt_state.msgpack / metadata.json /
  task_loader.pkl / data_processor.json under
  ``{save_model}/{variable}/{model_name}/``.

``synthetic: true`` runs the whole pipeline on generated NZ-like data —
the hermetic smoke path (reference analog: the tiny debug config,
``db_nz_downscaling.py``).
"""

from __future__ import annotations

import argparse
import os
import shutil

import yaml

from deepsensornz_tpu import config as cfg
from deepsensornz_tpu.data.processor import DataProcessor
from deepsensornz_tpu.pipeline.preprocess import PreprocessForDownscaling
from deepsensornz_tpu.pipeline.train import Train
from deepsensornz_tpu.utils import validate_and_convert_args


def load_real_data(args):
    """Load the training inputs from the on-disk archives.

    Returns ``(base_fields, dem, stations, wrf_source)`` — ``wrf_source``
    is None for the ERA5 base and the :class:`WRFSource` (needed by
    ``run_processing_sequence`` for regridding) for ``base: wrf``
    (reference trains from WRF too, ``train_downscaling.py:74-94``:
    midnight-init cycles over ``start_init``..``end_init``, every
    ``time_intervals``-th hourly file, hourly stations).
    """
    from deepsensornz_tpu.data.sources.era5 import ERA5Source
    from deepsensornz_tpu.data.sources.stations import StationSource
    from deepsensornz_tpu.data.sources.topography import topography_from_paths
    from deepsensornz_tpu.paths import get_data_paths

    paths = get_data_paths()
    variable = args["variable"]
    context_vars = list(dict.fromkeys([variable] + args.get("context_variables", [])))
    wrf_source = None
    if args.get("base") == "wrf":
        from datetime import datetime

        from deepsensornz_tpu.data.sources.wrf import WRFSource

        wrf_source = WRFSource(paths["wrf"]["parent"])
        start = datetime.strptime(str(args["start_init"]), "%Y%m%d")
        end = datetime.strptime(str(args.get("end_init") or args["start_init"]),
                                "%Y%m%d")
        fpaths = wrf_source.get_filepaths(start, end)
        fpaths = fpaths[:: args.get("time_intervals") or 1]
        if not fpaths:
            raise FileNotFoundError(
                f"no WRF files for inits {args['start_init']}.."
                f"{args.get('end_init')} under {paths['wrf']['parent']}")
        base_fields = wrf_source.load(fpaths, context_vars)
    else:
        years = list(range(args.get("train_start_year", 2000),
                           args.get("val_end_year", args.get("train_end_year", 2001)) + 1,
                           args.get("year_step") or 1))
        era5 = ERA5Source(paths["era5"]["parent"])
        base_fields = {v: era5.load(v, years) for v in context_vars}
    base = base_fields[variable]
    dem = topography_from_paths(paths).load(area=args.get("area"))
    stations = StationSource(paths["stations"]["parent"]).load_stations_time(
        variable, base.coords["time"],
        # WRF training matches stations at the hourly stamps of the cycle
        # files; the ERA5 recipe is daily (reference use_daily_data)
        daily=args.get("base") != "wrf",
        remove_stations=args.get("remove_stations", []),
    )
    return base_fields, dem, stations, wrf_source


def load_synthetic_data(args):
    from deepsensornz_tpu.data.synthetic import synthetic_bundle

    return synthetic_bundle(
        variable=args["variable"], n_times=24, base_hw=(24, 24),
        dem_hw=(96, 96), n_stations=24,
    )


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-arg_path", "--arg_path", required=True,
                    help="YAML arguments file")
    ns = ap.parse_args(argv)
    with open(ns.arg_path) as f:
        raw_args = yaml.safe_load(f)
    args = cfg.apply_profile(validate_and_convert_args(raw_args))

    variable = args["variable"]
    model_name = args.get("model_name") or "model"
    try:
        from deepsensornz_tpu.paths import get_data_paths

        save_root = get_data_paths().get("save_model", {}).get("fpath", "models")
    except FileNotFoundError:
        save_root = "models"
    model_dir = os.path.join(save_root, variable, model_name)
    os.makedirs(model_dir, exist_ok=True)
    shutil.copy(ns.arg_path, os.path.join(model_dir, "args.yaml"))

    wrf_source = None
    if args.get("synthetic"):
        base, dem, stations = load_synthetic_data(args)
        base_fields = {variable: base}
    else:
        base_fields, dem, stations, wrf_source = load_real_data(args)

    # data-processor reuse-or-create (train_downscaling.py:151-173)
    dp_path = os.path.join(model_dir, "..", "data_processor.json")
    data_processor = DataProcessor.load(dp_path) if os.path.exists(dp_path) else None

    pre = PreprocessForDownscaling(
        variable=variable, base=args.get("base", "era5"), area=args.get("area"),
    )
    processed = pre.run_processing_sequence(
        dem, base_fields, stations,
        highres_factor=args.get("highres_coarsen_factor") or 10,
        lowres_factor=args.get("lowres_coarsen_factor") or 50,
        coarsen_factor=args.get("era5_coarsen_factor") or 1,
        include_landmask=args.get("include_landmask", False),
        include_time_of_year=args.get("include_time_of_year", True),
        include_coordinates=args.get("include_coordinates", False),
        data_processor=data_processor,
        wrf_source=wrf_source,
        test_norm=True,
    )

    training = Train(processed)
    training.setup_task_loader(
        station_as_context=args.get("station_as_context", "all"),
        internal_density=args.get("internal_density"),
        auto_set_internal_density=args.get("auto_set_internal_density", False),
    )
    training.initialise_model(
        unet_channels=args.get("unet_channels") or cfg.CONVNP_KWARGS_DEFAULT["unet_channels"],
        likelihood=args.get("likelihood") or cfg.LIKELIHOODS[variable],
        pretrained_dir=args.get("pretrained_model"),
        # fast level-0 k3 U-Net variant (docs/perf_unet.md); None = parity
        top_kernel=args.get("top_kernel"),
        # physical smoothing-scale override — the round-3 density-mechanism
        # study's quality lever; None = 2/internal_density + floor
        init_lengthscale=args.get("init_lengthscale"),
        # U-Net backward rematerialisation (memory knob for big grids /
        # batches on one chip) + its selective policy (perf knob)
        **({"remat": args["remat"]} if args.get("remat") is not None else {}),
        **({"remat_policy": args["remat_policy"]}
           if "remat_policy" in args else {}),
    )
    result = training.train_model(
        n_epochs=args.get("n_epochs") or cfg.TRAIN_DEFAULTS["n_epochs"],
        batch_size=args.get("batch_size") or cfg.TRAIN_DEFAULTS["batch_size"],
        lr=args.get("lr") or cfg.TRAIN_DEFAULTS["lr"],
        weight_decay=args.get("weight_decay") or cfg.TRAIN_DEFAULTS["weight_decay"],
        model_dir=model_dir,
        # explicit None check: 0.0 is meaningful (zeroes the ls params'
        # ADAM step; decoupled weight decay still applies — use
        # frozen_patterns for a true freeze), so `or 1.0` would silently
        # turn it into parity
        lengthscale_lr_mult=(1.0 if args.get("lengthscale_lr_mult") is None
                             else args["lengthscale_lr_mult"]),
    )
    print(f"best val loss: {result['best_val']:.4f}; artifacts in {model_dir}")
    return model_dir


if __name__ == "__main__":
    main()
