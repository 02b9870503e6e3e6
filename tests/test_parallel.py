"""Multi-device mesh: dp gradient equivalence + spatial sharding compile.

Runs on the 8-device virtual CPU mesh (conftest) — the same path the driver
uses to validate multi-chip sharding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from deepsensornz_tpu.data.processor import DataProcessor
from deepsensornz_tpu.data.synthetic import synthetic_bundle
from deepsensornz_tpu.models.convnp import ConvNP, ConvNPConfig
from deepsensornz_tpu.parallel.mesh import (
    DATA_AXIS,
    SPATIAL_AXIS,
    make_mesh,
    pad_batch_to_multiple,
    shard_task,
)
from deepsensornz_tpu.task.batching import take
from deepsensornz_tpu.task.loader import TaskLoader
from deepsensornz_tpu.train.trainer import init_state, make_train_step


@pytest.fixture(scope="module")
def setting():
    base, dem, stations = synthetic_bundle(
        n_times=8, base_hw=(16, 16), dem_hw=(48, 48), n_stations=16
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
    times = base.coords["time"]
    return tl, times


def test_eight_devices_present():
    assert len(jax.devices()) == 8


def test_dp_loss_matches_single_device(setting):
    tl, times = setting
    cfg = ConvNPConfig(unet_channels=(8, 8), likelihood="cnp", internal_density=32,
                       decoder_channels=8, mlp_hidden=8, compute_dtype="float32")
    model = ConvNP(cfg)
    task = tl(list(times[:8]))
    params = model.init(jax.random.key(0), take(task, np.arange(1)))
    single = float(model.loss(params, task))

    mesh = make_mesh(n_data=8, n_spatial=1)
    sharded = shard_task(task, mesh)
    with jax.set_mesh(mesh):
        dp_loss = float(jax.jit(model.loss)(params, sharded))
    assert dp_loss == pytest.approx(single, rel=1e-5)


def test_dp_train_step_matches_single_device(setting):
    tl, times = setting
    cfg = ConvNPConfig(unet_channels=(8, 8), likelihood="cnp", internal_density=32,
                       decoder_channels=8, mlp_hidden=8, compute_dtype="float32")
    model = ConvNP(cfg)
    task = tl(list(times[:8]))
    state = init_state(model, jax.random.key(0), take(task, np.arange(2)))
    step = make_train_step(model, donate=False)

    s_single, l_single = step(state, task, 1e-3)

    mesh = make_mesh(n_data=4, n_spatial=2)
    sharded = shard_task(task, mesh)
    with jax.set_mesh(mesh):
        s_mesh, l_mesh = step(state, sharded, 1e-3)
    assert float(l_mesh) == pytest.approx(float(l_single), rel=1e-5)
    a = np.asarray(s_single.params["params"]["head_out"]["kernel"])
    b = np.asarray(s_mesh.params["params"]["head_out"]["kernel"])
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)


def test_spatial_sharding_full_train_step(setting):
    """tp/sp-style spatial partitioning of the internal grid compiles+runs."""
    tl, times = setting
    cfg = ConvNPConfig(
        unet_channels=(8, 8), likelihood="cnp", internal_density=32,
        decoder_channels=8, mlp_hidden=8, compute_dtype="float32",
        mesh_axes=(DATA_AXIS, SPATIAL_AXIS),
    )
    model = ConvNP(cfg)
    task = tl(list(times[:4]))
    mesh = make_mesh(n_data=2, n_spatial=4)
    with jax.set_mesh(mesh):
        state = init_state(model, jax.random.key(0), take(task, np.arange(2)))
        step = make_train_step(model, donate=False)
        sharded = shard_task(task, mesh)
        s2, loss = step(state, sharded, 1e-3)
        assert np.isfinite(float(loss))


def test_pad_batch_to_multiple(setting):
    tl, times = setting
    task = tl(list(times[:3]))
    padded, n_real = pad_batch_to_multiple(task, 4)
    assert padded.batch_size == 4 and n_real == 3
    assert float(np.asarray(padded.yt_mask)[3].sum()) == 0.0


def test_multihost_helpers_single_process():
    from deepsensornz_tpu.parallel.multihost import (
        initialize_multihost,
        make_global_mesh,
        shard_batch_for_host,
    )

    info = initialize_multihost()
    assert info["process_count"] == 1 and info["process_index"] == 0
    mesh = make_global_mesh(n_spatial=2)
    assert mesh.shape["spatial"] == 2
    assert mesh.shape["data"] == len(jax.devices()) // 2
    per, off = shard_batch_for_host(16)
    assert per == 16 and off == 0
    with pytest.raises(ValueError):
        make_global_mesh(n_spatial=3)


def test_spatial_sharding_equivalence_density256():
    """Flagship-style spatial sharding at density ≥256 with n_spatial=4:
    loss AND gradients of the sharded step must match single-device within
    f32 tolerance (the halo-exchange partitioning is semantics-free)."""
    base, dem, stations = synthetic_bundle(
        n_times=2, base_hw=(16, 16), dem_hw=(48, 48), n_stations=16
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
        internal_density=256, grid_multiple=16,
    )
    import dataclasses

    cfg = ConvNPConfig(
        unet_channels=(8, 8, 8, 8), likelihood="gnp", rank=64,
        internal_density=256, decoder_channels=8, mlp_hidden=8,
        compute_dtype="float32", mesh_axes=(DATA_AXIS, SPATIAL_AXIS),
    )
    model_mesh = ConvNP(cfg)
    # identical model without the sharding constraint for the single-device
    # reference (params pytrees are identical)
    model = ConvNP(dataclasses.replace(cfg, mesh_axes=None))
    task = tl(list(base.coords["time"][:2]))
    assert len(np.asarray(task.x1g)) >= 320  # density 256 over the margin-padded extent

    params = model.init(jax.random.key(0), task)
    loss_single, grads_single = jax.value_and_grad(model.loss)(params, task)

    mesh = make_mesh(n_data=2, n_spatial=4)
    sharded = shard_task(task, mesh)
    with jax.set_mesh(mesh):
        loss_mesh, grads_mesh = jax.jit(jax.value_and_grad(model_mesh.loss))(
            params, sharded)
        loss_mesh = float(loss_mesh)

    assert loss_mesh == pytest.approx(float(loss_single), rel=2e-5)
    flat_s = jax.tree_util.tree_leaves_with_path(grads_single)
    flat_m = jax.tree.leaves(grads_mesh)
    worst = 0.0
    for (path, gs), gm in zip(flat_s, flat_m):
        gs, gm = np.asarray(gs), np.asarray(gm)
        scale = max(float(np.abs(gs).max()), 1e-8)
        diff = float(np.abs(gs - gm).max()) / scale
        worst = max(worst, diff)
        np.testing.assert_allclose(
            gm, gs, rtol=5e-4, atol=5e-5 * scale,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
        )
    print(f"sharded-vs-unsharded: loss diff {abs(loss_mesh - float(loss_single)):.2e}, "
          f"worst relative grad diff {worst:.2e}")


# ---------------------------------------------------------------------------
# Beyond the train step: batch-sharded inference, the AR chain, and the AL
# placement scan under the mesh (VERDICT r2 #6; north-star hardware v5e-8).
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def inference_setting(setting):
    from deepsensornz_tpu.infer.predict import Predictor

    tl, times = setting
    cfg = ConvNPConfig(unet_channels=(8, 8), likelihood="gnp", rank=4,
                       internal_density=32, decoder_channels=8, mlp_hidden=8,
                       compute_dtype="float32")
    model = ConvNP(cfg)
    task = tl(list(times[:8]))
    params = model.init(jax.random.key(0), take(task, np.arange(1)))
    return model, params, task, tl


def test_dp_predict_grid_matches_single_device(inference_setting):
    """Batch-sharded gridded prediction (the operational serving path,
    ~720 tasks/call) is value-identical to single-device."""
    from deepsensornz_tpu.infer.predict import _grid_forward_fn

    model, params, task, tl = inference_setting
    xt1 = jnp.linspace(0.1, 0.9, 16)
    xt2 = jnp.linspace(0.1, 0.9, 16)
    B = task.batch_size
    aux = jnp.zeros((B, 16, 16, task.yt_aux.shape[-1]), jnp.float32)
    fwd = _grid_forward_fn(model, 0)
    one = jnp.asarray(1.0, jnp.float32)
    single = fwd(params, task, (xt1, xt2, aux), jnp.asarray(0), one)

    mesh = make_mesh(n_data=8, n_spatial=1)
    sharded = shard_task(task, mesh)
    with jax.set_mesh(mesh):
        multi = fwd(params, sharded, (xt1, xt2, aux), jnp.asarray(0), one)
    np.testing.assert_allclose(np.asarray(multi["mean"]),
                               np.asarray(single["mean"]), rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(multi["std"]),
                               np.asarray(single["std"]), rtol=2e-5, atol=1e-6)


def test_dp_ar_chain_matches_single_device(inference_setting):
    """The compiled AR scan under the dp mesh: same keys → same samples."""
    from deepsensornz_tpu.infer.ar import ar_sample

    model, params, task, tl = inference_setting
    single = ar_sample(model, params, task, n_samples=1, n_blocks=3,
                       rng=jax.random.key(5))
    mesh = make_mesh(n_data=8, n_spatial=1)
    sharded = shard_task(task, mesh)
    with jax.set_mesh(mesh):
        multi = ar_sample(model, params, sharded, n_samples=1, n_blocks=3,
                          rng=jax.random.key(5))
    mask = np.asarray(task.yt_mask) > 0
    np.testing.assert_allclose(multi[0][mask], single[0][mask],
                               rtol=5e-4, atol=1e-5)


def test_al_chain_under_spatial_mesh(inference_setting):
    """Greedy AL placement scan runs under a spatially-sharded mesh and
    reproduces the unsharded placement sequence."""
    from deepsensornz_tpu.al.greedy import GreedyAlgorithm

    model, params, task, tl = inference_setting
    one_task = take(task, np.arange(1))
    cand = np.stack(np.meshgrid(np.linspace(0.2, 0.8, 4),
                                np.linspace(0.2, 0.8, 4), indexing="ij"),
                    -1).reshape(-1, 2).astype(np.float32)
    aux = np.zeros((len(cand), task.yt_aux.shape[-1]), np.float32)
    single = GreedyAlgorithm(model, params).run(
        one_task, cand, n_placements=2, candidate_aux=aux)

    import dataclasses
    model_mesh = ConvNP(dataclasses.replace(
        model.cfg, mesh_axes=(DATA_AXIS, SPATIAL_AXIS)))
    mesh = make_mesh(n_data=1, n_spatial=8)
    with jax.set_mesh(mesh):
        multi = GreedyAlgorithm(model_mesh, params).run(
            one_task, cand, n_placements=2, candidate_aux=aux)
    np.testing.assert_allclose(multi["placements"], single["placements"],
                               atol=1e-6)
