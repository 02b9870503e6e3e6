"""Edge cases: multi-channel targets, gnp training, Field corner cases."""

import jax
import numpy as np
import optax
import pytest

from deepsensornz_tpu.data.grid import Field
from deepsensornz_tpu.data.processor import DataProcessor
from deepsensornz_tpu.data.synthetic import synthetic_bundle
from deepsensornz_tpu.models.convnp import ConvNP, ConvNPConfig
from deepsensornz_tpu.task.loader import TaskLoader


def test_field_sel_unsorted_nearest():
    c = np.array([5.0, 1.0, 3.0])
    f = Field(np.array([50.0, 10.0, 30.0]), ("x",), {"x": c}, "f")
    g = f.sel(x=2.9, method="nearest")
    assert float(g.data) == 30.0


def test_field_empty_slice():
    f = Field(np.arange(5.0), ("x",), {"x": np.arange(5.0)}, "f")
    g = f.sel(x=slice(10.0, 20.0))
    assert g.sizes()["x"] == 0


def test_coarsen_smaller_than_factor_raises():
    f = Field(np.ones((3, 3)), ("latitude", "longitude"),
              {"latitude": np.arange(3.0), "longitude": np.arange(3.0)}, "f")
    with pytest.raises(ValueError):
        f.coarsen(5)


@pytest.fixture(scope="module")
def dual_target_setting():
    """Target frame with TWO value columns (dim_yt = 2, e.g. u+v wind)."""
    base, dem, stations = synthetic_bundle(
        n_times=6, base_hw=(16, 16), dem_hw=(32, 32), n_stations=12
    )
    rng = np.random.default_rng(0)
    stations = stations.copy()
    stations["v_wind_station"] = rng.normal(size=len(stations))
    dp = DataProcessor()
    dp.set_coord_maps_from_extent(
        dem.coords["latitude"].min(), dem.coords["latitude"].max(),
        dem.coords["longitude"].min(), dem.coords["longitude"].max(),
    )
    st_n = dp(stations, method="mean_std")
    tl = TaskLoader(
        context=[dp(base, method="mean_std"), st_n], target=st_n,
        aux_at_targets=dp(dem.fillna(0.0).rename("elevation"), method="min_max"),
        internal_density=24, grid_multiple=16,
    )
    return tl, base.coords["time"]


def test_multichannel_targets_train(dual_target_setting):
    tl, times = dual_target_setting
    assert tl.target_dim() == 2
    cfg = ConvNPConfig(unet_channels=(8,), likelihood="cnp", internal_density=24,
                       dim_yt=2, decoder_channels=8, mlp_hidden=8,
                       compute_dtype="float32")
    model = ConvNP(cfg)
    task = tl(list(times[:4]))
    assert task.yt.shape[-1] == 2
    params = model.init(jax.random.key(0), task)
    raw = model.apply(params, task)
    assert raw.shape[-1] == 4  # 2 means + 2 scales
    loss0 = float(model.loss(params, task))
    assert np.isfinite(loss0)


def test_gnp_training_decreases_loss(dual_target_setting):
    """The low-rank joint head must train stably end-to-end."""
    tl, times = dual_target_setting
    cfg = ConvNPConfig(unet_channels=(8, 8), likelihood="gnp", rank=4,
                       internal_density=24, dim_yt=2, decoder_channels=8,
                       mlp_hidden=8, compute_dtype="float32")
    model = ConvNP(cfg)
    task = tl(list(times[:4]))
    params = model.init(jax.random.key(0), task)
    opt = optax.adam(1e-3)
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        loss, grads = jax.value_and_grad(model.loss)(params, task)
        updates, state = opt.update(grads, state)
        return optax.apply_updates(params, updates), state, loss

    losses = []
    for _ in range(25):
        params, state, l = step(params, state)
        losses.append(float(l))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] - 0.1


def test_station_context_disabled(dual_target_setting):
    """A pure grid-context model (no station context) runs fine."""
    tl, times = dual_target_setting
    base_ctx = tl.context[0]
    tl2 = TaskLoader(context=[base_ctx], target=tl.target,
                     aux_at_targets=tl.aux_at_targets,
                     internal_density=24, grid_multiple=16)
    task = tl2(list(times[:2]))
    assert len(task.points) == 0 and len(task.grids) == 1
    cfg = ConvNPConfig(unet_channels=(8,), likelihood="cnp", internal_density=24,
                       dim_yt=2, decoder_channels=8, mlp_hidden=8,
                       compute_dtype="float32")
    model = ConvNP(cfg)
    params = model.init(jax.random.key(0), task)
    assert np.isfinite(float(model.loss(params, task)))


def test_mean_anchor_improves_rmse(dual_target_setting):
    """gnp + mean anchor: anchored training yields a lower mean-MSE than
    pure joint NLL at equal steps."""
    import optax

    tl, times = dual_target_setting
    task = tl(list(times[:4]))

    def train(anchor):
        cfg = ConvNPConfig(unet_channels=(8, 8), likelihood="gnp", rank=4,
                           internal_density=24, dim_yt=2, decoder_channels=8,
                           mlp_hidden=8, compute_dtype="float32",
                           mean_anchor=anchor)
        model = ConvNP(cfg)
        params = model.init(jax.random.key(0), task)
        opt = optax.adam(3e-3)
        state = opt.init(params)

        @jax.jit
        def step(params, state):
            loss, grads = jax.value_and_grad(model.loss)(params, task)
            updates, state = opt.update(grads, state)
            return optax.apply_updates(params, updates), state, loss

        for _ in range(40):
            params, state, _ = step(params, state)
        raw = model.apply(params, task)
        mean, _ = cfg.make_likelihood().mean_std(raw)
        m = np.asarray(task.yt_mask).astype(bool)
        err = np.asarray(mean)[m] - np.asarray(task.yt)[m]
        return float(np.mean(err ** 2))

    mse_plain = train(0.0)
    mse_anchored = train(1.0)
    assert np.isfinite(mse_plain) and np.isfinite(mse_anchored)
    assert mse_anchored <= mse_plain * 1.05  # anchored at least as good


def test_multichannel_predictor(dual_target_setting):
    """dim_yt=2 Predictor: per-channel unnormalisation, per-channel grid
    fields, (B, M, 2) point predictions (closes the dim_yt>1 refusal)."""
    from deepsensornz_tpu.data.synthetic import synthetic_dem
    from deepsensornz_tpu.infer.predict import Predictor

    tl, times = dual_target_setting
    cfg = ConvNPConfig(unet_channels=(8,), likelihood="cnp", internal_density=24,
                       dim_yt=2, decoder_channels=8, mlp_hidden=8,
                       compute_dtype="float32")
    model = ConvNP(cfg)
    task = tl(list(times[:2]))
    params = model.init(jax.random.key(0), task)
    # Predictor needs the processor the fixture normalised with; the fixture
    # data is seed-deterministic, so refit an identical one
    from deepsensornz_tpu.data.processor import DataProcessor as _DP

    base, dem, stations = synthetic_bundle(
        n_times=6, base_hw=(16, 16), dem_hw=(32, 32), n_stations=12
    )
    rng = np.random.default_rng(0)
    stations = stations.copy()
    stations["v_wind_station"] = rng.normal(size=len(stations))
    proc = _DP()
    proc.set_coord_maps_from_extent(
        dem.coords["latitude"].min(), dem.coords["latitude"].max(),
        dem.coords["longitude"].min(), dem.coords["longitude"].max(),
    )
    proc(stations, method="mean_std")

    cols = [c for c in stations.columns if c.endswith("_station")]
    pred = Predictor(model, params, proc, cols)
    pts = pred.predict_points(task)
    assert pts["mean"].shape == (2, task.num_targets, 2)
    assert pts["std"].shape == (2, task.num_targets, 2)

    out = pred.predict_grid(task, dem, aux_at_targets=tl.aux_at_targets,
                            n_samples=2)
    for c in cols:
        assert f"mean_{c}" in out and f"std_{c}" in out
        assert out[f"mean_{c}"].shape[0] == 2
        assert f"samples_{c}" in out

    # wrong name count refused loudly
    with pytest.raises(ValueError):
        Predictor(model, params, proc, cols[0])
