"""Training CLI smoke (synthetic mode), arg validation, writer, plots."""

import json
import os

import numpy as np
import pytest
import yaml

from deepsensornz_tpu.utils import (
    bool_or_float_or_str,
    int_or_none,
    str2bool,
    validate_and_convert_args,
)


def test_arg_coercers():
    assert str2bool("True") is True and str2bool("0") is False
    assert int_or_none("None") is None and int_or_none("5") == 5
    assert bool_or_float_or_str("0.5") == 0.5
    assert bool_or_float_or_str("random") == "random"
    assert bool_or_float_or_str(True) is True


def test_validate_args_rejects_unknown():
    with pytest.raises(KeyError):
        validate_and_convert_args({"not_a_real_arg": 1})


def test_validate_args_coerces():
    out = validate_and_convert_args({
        "variable": "temperature", "n_epochs": "3",
        "station_as_context": "0.3", "unet_channels": [8, 8],
        "include_landmask": "true",
    })
    assert out["n_epochs"] == 3
    assert out["station_as_context"] == 0.3
    assert out["unet_channels"] == (8, 8)
    assert out["include_landmask"] is True
    out2 = validate_and_convert_args({
        "init_lengthscale": "0.00714", "lengthscale_lr_mult": "100",
    })
    assert out2["init_lengthscale"] == pytest.approx(0.00714)
    assert out2["lengthscale_lr_mult"] == 100.0


def test_tuned_profile_resolution():
    from deepsensornz_tpu import config as cfg

    # fills unset keys per variable
    out = cfg.apply_profile(validate_and_convert_args(
        {"variable": "temperature", "profile": "tuned"}))
    assert out["internal_density"] == 350
    # flagship capstone: temperature self-tuning is neutral-to-harmful at
    # the flagship budget, so the tuned profile no longer sets a mult
    assert out.get("lengthscale_lr_mult") is None
    out = cfg.apply_profile(validate_and_convert_args(
        {"variable": "precipitation", "profile": "tuned"}))
    assert out["internal_density"] == 350
    assert out["init_lengthscale"] == pytest.approx(0.005)
    # explicit per-run values always win
    out = cfg.apply_profile(validate_and_convert_args(
        {"variable": "temperature", "profile": "tuned",
         "internal_density": 500}))
    assert out["internal_density"] == 500
    # parity/absent is a no-op; unknown profile is loud
    out = cfg.apply_profile({"variable": "surface_pressure"})
    assert "internal_density" not in out
    with pytest.raises(ValueError):
        cfg.apply_profile({"variable": "temperature", "profile": "bogus"})
    # a profile-filled init_lengthscale that falls below the SetConv floor
    # of an EXPLICIT density override is dropped, not shipped invalid
    with pytest.warns(UserWarning, match="grid floor"):
        out = cfg.apply_profile(validate_and_convert_args(
            {"variable": "precipitation", "profile": "tuned",
             "internal_density": 24}))
    assert out["internal_density"] == 24
    assert out["init_lengthscale"] is None
    # ...but an explicit user init_lengthscale is never touched
    out = cfg.apply_profile(validate_and_convert_args(
        {"variable": "precipitation", "profile": "tuned",
         "internal_density": 24, "init_lengthscale": 0.03}))
    assert out["init_lengthscale"] == pytest.approx(0.03)
    # the mirror case: an EXPLICIT init_lengthscale invalidated by the
    # PROFILE-filled density drops the profile's density fill instead
    # (explicit per-run values always win)
    with pytest.warns(UserWarning, match="dropping the profile's density"):
        out = cfg.apply_profile(validate_and_convert_args(
            {"variable": "temperature", "profile": "tuned",
             "init_lengthscale": 0.0012}))
    assert out["init_lengthscale"] == pytest.approx(0.0012)
    assert out.get("internal_density") is None
    # both explicit and invalid is left alone — even when the ls happens
    # to equal the profile's value — so the model raises its own loud
    # error instead of the profile silently rewriting a user setting
    out = cfg.apply_profile(validate_and_convert_args(
        {"variable": "precipitation", "profile": "tuned",
         "init_lengthscale": 0.005, "internal_density": 100}))
    assert out["init_lengthscale"] == pytest.approx(0.005)
    assert out["internal_density"] == 100
    # the throughput profile ships the grid-floor operating points: d120
    # with the per-variable pinned smoothing scale (valid vs the d120
    # floor 0.5/120), wind keeping its mult=30
    out = cfg.apply_profile(validate_and_convert_args(
        {"variable": "temperature", "profile": "throughput"}))
    assert out["internal_density"] == 120
    assert out["init_lengthscale"] == pytest.approx(0.00714)
    out = cfg.apply_profile(validate_and_convert_args(
        {"variable": "10m_u_component_of_wind", "profile": "throughput"}))
    assert out["lengthscale_lr_mult"] == 30.0
    # an empty per-scale mapping means "all scales default" — the floor
    # back-off must not choke on it
    out = cfg.apply_profile({"variable": "temperature", "profile": "tuned",
                             "init_lengthscale": {}})
    assert out["internal_density"] == 350
    # every core variable has a row of known training keys in BOTH
    # profiles, and every profile ls clears its own density's floor
    allowed = {"internal_density", "lengthscale_lr_mult", "init_lengthscale"}
    for prof in cfg.PROFILES.values():
        for var, row in prof.items():
            assert row and set(row) <= allowed
            assert var in cfg.LIKELIHOODS
            ls = row.get("init_lengthscale")
            if ls is not None:
                assert ls > 0.5 / row["internal_density"]


def test_train_cli_synthetic(tmp_path, monkeypatch):
    """Full training CLI run in synthetic mode produces loadable artifacts."""
    from deepsensornz_tpu.cli.train_downscaling import main

    args = {
        "variable": "temperature",
        "model_name": "cli_smoke",
        "synthetic": True,
        "n_epochs": 1,
        "batch_size": 4,
        "lr": 0.001,
        "unet_channels": [8, 8],
        "likelihood": "cnp",
        "internal_density": 24,
        "highres_coarsen_factor": 2,
        "lowres_coarsen_factor": 4,
        "include_time_of_year": True,
        # YAML surface for the memory/perf knobs: must reach the model cfg
        "remat": True,
        "remat_policy": "acts",
    }
    arg_path = tmp_path / "args.yaml"
    with open(arg_path, "w") as f:
        yaml.safe_dump(args, f)
    monkeypatch.chdir(tmp_path)
    model_dir = main(["-arg_path", str(arg_path)])
    for fname in ("params.msgpack", "metadata.json", "task_loader.pkl",
                  "data_processor.json", "args.yaml"):
        assert os.path.exists(os.path.join(model_dir, fname)), fname
    with open(os.path.join(model_dir, "metadata.json")) as f:
        meta = json.load(f)
    assert meta["data_settings"]["variable"] == "temperature"
    assert meta["model_config"]["remat"] is True
    assert meta["model_config"]["remat_policy"] == "acts"

    # reconstruction must work on CLI artifacts too
    from deepsensornz_tpu.pipeline.validate import load_run

    run = load_run(model_dir)
    assert run["variable"] == "temperature"


def test_prediction_writer(tmp_path):
    from deepsensornz_tpu.data.grid import Dataset, Field, open_dataset
    from deepsensornz_tpu.infer.writer import save_prediction

    lat = np.linspace(-34, -47, 8)
    lon = np.linspace(166, 178, 9)
    t = np.datetime64("2020-01-01", "s") + np.arange(3) * np.timedelta64(1, "h")
    mean = Field(np.random.default_rng(0).random((3, 8, 9)),
                 ("time", "latitude", "longitude"),
                 {"time": t, "latitude": lat, "longitude": lon}, "mean")
    std = mean.copy().rename("std")
    pred = Dataset({"mean": mean, "std": std})
    path = str(tmp_path / "out" / "pred.nc")
    save_prediction(pred, path, "temperature", "m1", mean_only=True)
    back = open_dataset(path)
    assert "mean" in back and "std" not in back
    assert back.attrs["variable"] == "temperature"
    assert back.attrs["institution"]
    assert "created" in back.attrs


def test_plots_render(tmp_path):
    import matplotlib

    from deepsensornz_tpu.data.grid import Dataset, Field
    from deepsensornz_tpu.plot import (
        make_loss_plot,
        plot_errors_at_stations,
        plot_field,
        plot_prediction,
        plot_timeseries_comparison,
    )

    lat = np.linspace(-34, -47, 10)
    lon = np.linspace(166, 178, 12)
    t = np.array([np.datetime64("2020-01-01")])
    data = np.random.default_rng(0).random((1, 10, 12))
    mean = Field(data, ("time", "latitude", "longitude"),
                 {"time": t, "latitude": lat, "longitude": lon}, "mean")
    pred = Dataset({"mean": mean, "std": mean.copy().rename("std")})
    fig = plot_prediction(pred)
    fig.savefig(tmp_path / "pred.png")
    fig2 = plot_timeseries_comparison(
        np.arange(5), np.zeros(5), np.ones(5), obs=np.zeros(5), base=np.ones(5)
    )
    fig3 = plot_errors_at_stations(lat[:5], lon[:5], np.linspace(-1, 1, 5))
    fig4 = make_loss_plot([3, 2, 1], [3.1, 2.2, 1.5], str(tmp_path / "loss.png"))
    assert (tmp_path / "loss.png").exists()
    matplotlib.pyplot.close("all")


def test_plot_task_and_context_encoding():
    import jax
    import matplotlib

    from deepsensornz_tpu.data.processor import DataProcessor
    from deepsensornz_tpu.data.synthetic import synthetic_bundle
    from deepsensornz_tpu.models.convnp import ConvNP, ConvNPConfig
    from deepsensornz_tpu.plot import plot_context_encoding, plot_task
    from deepsensornz_tpu.task.loader import TaskLoader

    base, dem, stations = synthetic_bundle(n_times=2, base_hw=(8, 8),
                                           dem_hw=(16, 16), n_stations=6)
    dp = DataProcessor()
    dp.set_coord_maps_from_extent(-47, -34, 166, 178)
    tl = TaskLoader(context=[dp(base, method="mean_std"),
                             dp(stations, method="mean_std")],
                    target=dp(stations), internal_density=16, grid_multiple=16)
    task = tl([base.coords["time"][0]])
    fig = plot_task(task)
    cfg = ConvNPConfig(unet_channels=(8,), likelihood="cnp", internal_density=16,
                       decoder_channels=8, mlp_hidden=8, compute_dtype="float32")
    model = ConvNP(cfg)
    params = model.init(jax.random.key(0), task)
    fig2 = plot_context_encoding(model, params, task, max_channels=4)
    matplotlib.pyplot.close("all")


def test_hourly_time_of_year():
    from deepsensornz_tpu.data.synthetic import synthetic_bundle
    from deepsensornz_tpu.pipeline.preprocess import PreprocessForDownscaling

    base, dem, stations = synthetic_bundle(n_times=6, base_hw=(8, 8),
                                           dem_hw=(16, 16), n_stations=6)
    # hourly timestamps
    import numpy as np

    base.coords["time"] = (np.datetime64("2020-06-01T00", "s")
                           + np.arange(6) * np.timedelta64(1, "h"))
    stations["time"] = np.repeat(base.coords["time"],
                                 len(stations) // 6 + 1)[: len(stations)]
    pre = PreprocessForDownscaling(variable="temperature")
    out = pre.run_processing_sequence(
        dem, {"temperature": base}, stations,
        highres_factor=2, lowres_factor=4, daily=False,
        include_time_of_year=True, time_of_year_freq="H",
    )
    assert "cos_H" in out["base_ds"] and "sin_H" in out["base_ds"]


def test_combined_map_panels(tmp_path):
    """The three combined panels from the reference plotting suite
    (validate.py:638-860): stations+prediction, base+prediction(+zoom),
    prediction-with-station-overlay."""
    import matplotlib

    from deepsensornz_tpu.data.grid import Dataset, Field
    from deepsensornz_tpu.plot import (
        plot_base_and_prediction,
        plot_prediction_with_stations,
        plot_stations_and_prediction,
    )

    lat = np.linspace(-34, -47, 20)
    lon = np.linspace(166, 178, 24)
    t = np.array([np.datetime64("2020-01-01")])
    rng = np.random.default_rng(0)
    mk = lambda name: Field(rng.random((1, 20, 24)), ("time", "latitude", "longitude"),
                            {"time": t, "latitude": lat, "longitude": lon}, name)
    pred = Dataset({"mean": mk("mean"), "std": mk("std")})
    base = mk("t2m")
    st_lat = rng.uniform(-46, -35, 8)
    st_lon = rng.uniform(167, 177, 8)
    st_val = rng.random(8)

    fig1 = plot_stations_and_prediction(pred, st_lat, st_lon, st_val, base_field=base)
    assert len(fig1.axes) >= 3
    fig1.savefig(tmp_path / "p1.png")

    # named-city zoom resolves through LOCATION_LATLON (config.py:181-205)
    fig2 = plot_base_and_prediction(base, pred, location="wellington")
    fig2.savefig(tmp_path / "p2.png")
    fig2b = plot_base_and_prediction(base, pred)  # nationwide

    fig3 = plot_prediction_with_stations(
        pred, st_lat, st_lon, location=(-41.3, 174.8), zoom_to_location=True,
        labels={(-41.3, 174.8): "0.42"},
    )
    fig3.savefig(tmp_path / "p3.png")
    for p in ("p1.png", "p2.png", "p3.png"):
        assert (tmp_path / p).exists()
    matplotlib.pyplot.close("all")


def test_plot_calibration(tmp_path):
    from deepsensornz_tpu.plot import plot_calibration

    rng = np.random.default_rng(0)
    z = rng.standard_normal(500)
    out = str(tmp_path / "calib.png")
    fig = plot_calibration(z, path=out)
    assert fig is not None
    import os

    assert os.path.exists(out)
