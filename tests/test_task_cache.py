"""Task cache: shard round-trip + epoch streaming + training from cache."""

import numpy as np
import pytest

from deepsensornz_tpu.data.processor import DataProcessor
from deepsensornz_tpu.data.synthetic import synthetic_bundle
from deepsensornz_tpu.task.cache import TaskCache
from deepsensornz_tpu.task.loader import TaskLoader


@pytest.fixture(scope="module")
def loader():
    base, dem, stations = synthetic_bundle(n_times=8, base_hw=(16, 16),
                                           dem_hw=(32, 32), n_stations=10)
    dp = DataProcessor()
    dp.set_coord_maps_from_extent(
        dem.coords["latitude"].min(), dem.coords["latitude"].max(),
        dem.coords["longitude"].min(), dem.coords["longitude"].max(),
    )
    tl = TaskLoader(
        context=[dp(base, method="mean_std"), dp(stations, method="mean_std")],
        target=dp(stations),
        aux_at_targets=dp(dem.fillna(0.0).rename("elevation"), method="min_max"),
        internal_density=24, grid_multiple=16,
    )
    return tl, base.coords["time"]


def test_cache_roundtrip(loader, tmp_path):
    tl, times = loader
    cache = TaskCache(str(tmp_path / "cache"))
    n = cache.build(tl, list(times), shard_size=4)
    assert n == 2
    direct = tl(list(times[:4]))
    shard = cache.load_shard(cache.shards()[0])
    np.testing.assert_array_equal(np.asarray(shard.xt), np.asarray(direct.xt))
    np.testing.assert_array_equal(np.asarray(shard.yt), np.asarray(direct.yt))
    np.testing.assert_array_equal(
        np.asarray(shard.points[0].y), np.asarray(direct.points[0].y))
    np.testing.assert_array_equal(
        np.asarray(shard.grids[0].y), np.asarray(direct.grids[0].y))
    np.testing.assert_allclose(
        np.asarray(shard.yt_aux), np.asarray(direct.yt_aux), rtol=1e-6)


def test_epoch_streaming_shuffles(loader, tmp_path):
    tl, times = loader
    cache = TaskCache(str(tmp_path / "cache2"))
    cache.build(tl, list(times), shard_size=2)
    batches = list(cache.iter_epochs(2, shuffle=True, seed=0))
    assert len(batches) == 8  # 4 shards × 2 epochs
    assert all(b.batch_size == 2 for b in batches)


def test_training_from_cache(loader, tmp_path):
    import jax

    from deepsensornz_tpu.models.convnp import ConvNP, ConvNPConfig
    from deepsensornz_tpu.train.trainer import init_state, make_train_step

    tl, times = loader
    cache = TaskCache(str(tmp_path / "cache3"))
    cache.build(tl, list(times), shard_size=4)
    cfg = ConvNPConfig(unet_channels=(8,), likelihood="cnp", internal_density=24,
                       decoder_channels=8, mlp_hidden=8, compute_dtype="float32")
    model = ConvNP(cfg)
    first = cache.load_shard(cache.shards()[0])
    state = init_state(model, jax.random.key(0), first)
    step = make_train_step(model, donate=False)
    losses = []
    for batch in cache.iter_epochs(3):
        state, loss = step(state, batch, 1e-3)
        losses.append(float(loss))
    assert np.isfinite(losses).all() if hasattr(np, "isfinite") else True
    assert losses[-1] < losses[0]


def test_prefetch_iterator_order_and_errors():
    from deepsensornz_tpu.task.cache import prefetch_iterator

    assert list(prefetch_iterator(iter(range(10)), depth=3)) == list(range(10))

    def boom():
        yield 1
        raise RuntimeError("shard corrupt")

    it = prefetch_iterator(boom(), depth=2)
    assert next(it) == 1
    with pytest.raises(RuntimeError):
        next(it)


def test_iter_epochs_prefetched(loader, tmp_path):
    tl, times = loader
    cache = TaskCache(str(tmp_path / "cachep"))
    cache.build(tl, list(times), shard_size=4)
    batches = list(cache.iter_epochs(2, prefetch=2))
    assert len(batches) == 4
    plain = list(cache.iter_epochs(2, prefetch=0))
    np.testing.assert_array_equal(
        np.asarray(batches[0].xt), np.asarray(plain[0].xt)
    )
