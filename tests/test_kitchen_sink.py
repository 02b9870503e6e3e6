"""Kitchen-sink integration: every feature enabled simultaneously.

landmask + time-of-year + coordinate channels + aux_at_contexts + delta_t +
split station context + gnp joint head + remat + checkpoint/resume +
gridded prediction with joint samples + AR samples + greedy placement.
"""

import numpy as np
import pytest

from deepsensornz_tpu.data.processor import DataProcessor
from deepsensornz_tpu.data.synthetic import synthetic_bundle
from deepsensornz_tpu.pipeline.preprocess import PreprocessForDownscaling
from deepsensornz_tpu.pipeline.train import Train
from deepsensornz_tpu.pipeline.validate import Validate


@pytest.fixture(scope="module")
def sink(tmp_path_factory):
    base, dem, stations = synthetic_bundle(
        variable="temperature", n_times=12, base_hw=(24, 24), dem_hw=(64, 64),
        n_stations=18,
    )
    pre = PreprocessForDownscaling(variable="temperature")
    out = pre.run_processing_sequence(
        dem, {"temperature": base}, stations,
        highres_factor=2, lowres_factor=4,
        include_landmask=True, include_time_of_year=True,
        include_coordinates=True, fill_missing_stations=True, test_norm=True,
    )
    training = Train(out)
    tl = training.setup_task_loader(station_as_context="split", internal_density=24)
    # add aux_at_contexts + a one-day lag on the base grid after the fact
    tl.aux_at_contexts = out["highres_aux_ds"]["elevation"]
    tl.delta_t = [0] * len(tl.context)
    training.initialise_model(
        unet_channels=(8, 8), likelihood="gnp", compute_dtype="float32",
        decoder_channels=8, mlp_hidden=8, rank=4, remat=True,
    )
    model_dir = str(tmp_path_factory.mktemp("sink") / "model")
    result = training.train_model(n_epochs=2, batch_size=4, lr=1e-3,
                                  model_dir=model_dir, verbose=False)
    return model_dir, training, result, (base, dem, stations), out


def test_sink_training_converged_finitely(sink):
    model_dir, training, result, raw, out = sink
    assert np.isfinite(result["best_val"])
    assert len(result["train_losses"]) == 2


def test_sink_context_composition(sink):
    model_dir, training, result, raw, out = sink
    tl = training.task_loader
    base, dem, stations = raw
    task = tl([base.coords["time"][0]], seed_override=1)
    # grids: base(+cos/sin) + aux(+x1x2) + landmask; points: stations
    assert len(task.grids) == 3
    assert len(task.points) == 1
    # aux_at_contexts adds the elevation channel to station values
    assert task.points[0].y.shape[-1] == 2
    # split: context and target stations disjoint
    pm = np.asarray(task.points[0].mask)[0].astype(bool)
    tm = np.asarray(task.yt_mask)[0].astype(bool)
    ctx = {tuple(p) for p in np.asarray(task.points[0].x)[0][pm].round(6).tolist()}
    tgt = {tuple(p) for p in np.asarray(task.xt)[0][tm].round(6).tolist()}
    assert not (ctx & tgt)


def test_sink_resume_continues(sink, tmp_path):
    model_dir, training, result, raw, out = sink
    from deepsensornz_tpu.train.trainer import Trainer

    tl = training.task_loader
    base = raw[0]
    tasks = tl(list(base.coords["time"][:8]), datewise_deterministic=True)
    tr = Trainer(training.model, lr=1e-3)
    out2 = tr.fit(tasks, None, n_epochs=3, batch_size=4,
                  resume_from=model_dir, verbose=False)
    assert len(out2["train_losses"]) == 3


def test_sink_gridded_predict_with_samples(sink):
    model_dir, training, result, raw, out = sink
    base, dem, stations = raw
    from deepsensornz_tpu.infer.predict import Predictor

    predictor = Predictor(training.model, result["params"], training.dp,
                          training.task_loader.target_var_IDs[0])
    task = training.task_loader([base.coords["time"][0]], seed_override=2)
    pred = predictor.predict_grid(
        task, dem, aux_at_targets=training.task_loader.aux_at_targets,
        n_samples=2,
    )
    assert pred["samples"].shape[0] == 2
    land = ~np.isnan(dem.data)
    assert np.isfinite(pred["mean"].data[:, land]).all()

    ar = predictor.ar_sample_grid(
        task, dem, aux_at_targets=training.task_loader.aux_at_targets,
        n_samples=1, subsample_factor=8, n_blocks=2)
    assert np.isfinite(ar[:, :, land]).all()


def test_sink_greedy_placement(sink):
    model_dir, training, result, raw, out = sink
    from deepsensornz_tpu.al.greedy import GreedyAlgorithm

    base = raw[0]
    task = training.task_loader([base.coords["time"][0]], seed_override=3)
    rng = np.random.default_rng(0)
    cand = rng.random((5, 2)).astype(np.float32)
    aux = rng.normal(size=(5, task.yt_aux.shape[-1])).astype(np.float32)
    alg = GreedyAlgorithm(training.model, result["params"], mode="fast")
    placed = alg.run(task, cand, n_placements=2, candidate_aux=aux)
    assert placed["placements"].shape == (2, 2)


def test_sink_validation_roundtrip(sink):
    model_dir, training, result, raw, out = sink
    base = raw[0]
    v = Validate(model_dir)
    loss = v.calculate_loss(list(base.coords["time"][:2]))
    assert np.isfinite(loss["rmse"])
