"""AR sampling + active learning on a tiny trained-ish model."""

import jax
import numpy as np
import pytest

from deepsensornz_tpu.al.greedy import GreedyAlgorithm, Stddev
from deepsensornz_tpu.data.processor import DataProcessor
from deepsensornz_tpu.data.synthetic import synthetic_bundle
from deepsensornz_tpu.infer.ar import ar_sample
from deepsensornz_tpu.models.convnp import ConvNP, ConvNPConfig
from deepsensornz_tpu.task.loader import TaskLoader


@pytest.fixture(scope="module")
def setting():
    base, dem, stations = synthetic_bundle(
        n_times=4, base_hw=(16, 16), dem_hw=(48, 48), n_stations=12
    )
    dp = DataProcessor()
    dp.set_coord_maps_from_extent(
        dem.coords["latitude"].min(), dem.coords["latitude"].max(),
        dem.coords["longitude"].min(), dem.coords["longitude"].max(),
    )
    tl = TaskLoader(
        context=[dp(base, method="mean_std"), dp(stations, method="mean_std")],
        target=dp(stations),
        aux_at_targets=dp(dem.fillna(0.0).rename("elevation"), method="min_max"),
        internal_density=32, grid_multiple=16,
    )
    cfg = ConvNPConfig(unet_channels=(8, 8), likelihood="cnp", internal_density=32,
                       decoder_channels=8, mlp_hidden=8, compute_dtype="float32")
    model = ConvNP(cfg)
    times = base.coords["time"]
    task = tl(list(times[:1]))
    params = model.init(jax.random.key(0), task)
    return model, params, task


def test_ar_sample_shapes_and_finiteness(setting):
    model, params, task = setting
    samples = ar_sample(model, params, task, n_samples=2, n_blocks=3)
    B, M = task.xt.shape[:2]
    assert samples.shape == (2, B, M, 1)
    mask = np.asarray(task.yt_mask).astype(bool)
    assert np.isfinite(samples[:, mask]).all()


def test_ar_samples_differ_between_draws(setting):
    model, params, task = setting
    samples = ar_sample(model, params, task, n_samples=2, n_blocks=2)
    mask = np.asarray(task.yt_mask).astype(bool)
    assert not np.allclose(samples[0][mask], samples[1][mask])


def test_ar_feedback_changes_distribution(setting):
    """AR conditioning must make later draws differ from marginal sampling
    in more than noise: the sample covariance across points should be
    non-trivial (marginal sampling would be ~independent)."""
    model, params, task = setting
    n = 24
    samples = ar_sample(model, params, task, n_samples=n, n_blocks=4)
    mask = np.asarray(task.yt_mask)[0].astype(bool)
    s = samples[:, 0, mask, 0]  # (n, M_valid)
    corr = np.corrcoef(s.T)
    off_diag = corr[~np.eye(corr.shape[0], dtype=bool)]
    assert np.nanmax(np.abs(off_diag)) > 0.15


def test_greedy_fast_mode(setting):
    model, params, task = setting
    rng = np.random.default_rng(0)
    cand = rng.random((10, 2)).astype(np.float32)
    aux = rng.normal(size=(10, task.yt_aux.shape[-1])).astype(np.float32)
    alg = GreedyAlgorithm(model, params, mode="fast")
    out = alg.run(task, cand, n_placements=3, candidate_aux=aux)
    assert out["placements"].shape == (3, 2)
    assert len(out["acquisition_history"]) == 3
    # placed points must come from the candidate set
    for p in out["placements"]:
        assert any(np.allclose(p, c) for c in cand)


def test_greedy_exhaustive_reduces_stddev(setting):
    model, params, task = setting
    cand = np.random.default_rng(1).random((6, 2)).astype(np.float32)
    alg = GreedyAlgorithm(model, params, mode="exhaustive")
    acq = Stddev()

    # acquisition before any placement
    probe = alg._probe_at(task, jax.numpy.asarray(task.xt[0]), None)
    mean0, std0 = alg._predict(params, task)
    before = float(acq(mean0, std0, task.yt_mask)[0])

    aux = np.random.default_rng(1).normal(
        size=(6, task.yt_aux.shape[-1])).astype(np.float32)
    out = alg.run(task, cand, n_placements=2, candidate_aux=aux)
    final = out["final_task"]
    mean1, std1 = alg._predict(params, final)
    after = float(acq(mean1, std1, final.yt_mask)[0])
    assert after <= before + 1e-6


def test_greedy_never_places_same_candidate_twice(setting):
    """Placed candidates leave the pool (deepsensor GreedyAlgorithm
    semantics): n_placements distinct sites even when score gaps are tiny."""
    model, params, task = setting
    cand = np.random.default_rng(2).random((5, 2)).astype(np.float32)
    alg = GreedyAlgorithm(model, params, mode="exhaustive")
    aux = np.random.default_rng(2).normal(
        size=(5, task.yt_aux.shape[-1])).astype(np.float32)
    out = alg.run(task, cand, n_placements=4, candidate_aux=aux)
    seen = {tuple(np.round(p, 6)) for p in out["placements"]}
    assert len(seen) == 4


def test_greedy_input_validation(setting):
    """Misuse fails loudly: more placements than candidates, and a missing
    candidate_aux on an aux-trained model (zero-filled aux would score
    candidates at dataset-mean covariates)."""
    model, params, task = setting
    cand = np.random.default_rng(3).random((3, 2)).astype(np.float32)
    alg = GreedyAlgorithm(model, params)
    with pytest.raises(ValueError, match="exceeds the 3 candidates"):
        alg.run(task, cand, n_placements=4,
                candidate_aux=np.zeros((3, task.yt_aux.shape[-1]), np.float32))
    with pytest.raises(ValueError, match="candidate_aux"):
        alg.run(task, cand, n_placements=1)
