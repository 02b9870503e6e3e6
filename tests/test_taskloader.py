"""TaskLoader: sampling strategies, padding, split semantics, determinism."""

import numpy as np
import pytest

from deepsensornz_tpu.data.processor import DataProcessor
from deepsensornz_tpu.data.synthetic import synthetic_bundle
from deepsensornz_tpu.task.loader import TaskLoader, interp_grid_at_points
from deepsensornz_tpu.data.grid import Field


@pytest.fixture(scope="module")
def pipeline():
    base, dem, stations = synthetic_bundle(
        n_times=6, base_hw=(16, 16), dem_hw=(48, 48), n_stations=24
    )
    dp = DataProcessor()
    dp.set_coord_maps_from_extent(
        dem.coords["latitude"].min(), dem.coords["latitude"].max(),
        dem.coords["longitude"].min(), dem.coords["longitude"].max(),
    )
    base_n = dp(base, method="mean_std")
    dem_n = dp(dem.fillna(0.0).rename("elevation"), method="min_max")
    st_n = dp(stations, method="mean_std")
    return dp, base_n, dem_n, st_n, base


def make_loader(pipeline, **kw):
    dp, base_n, dem_n, st_n, base = pipeline
    defaults = dict(
        context=[base_n, st_n],
        target=st_n,
        aux_at_targets=dem_n,
        internal_density=32,
        grid_multiple=16,
    )
    defaults.update(kw)
    return TaskLoader(**defaults), base.coords["time"]


def test_basic_task_shapes(pipeline):
    tl, times = make_loader(pipeline)
    task = tl([times[0], times[1]])
    assert task.batch_size == 2
    assert len(task.grids) == 1 and len(task.points) == 1
    B, N, _ = task.points[0].x.shape
    assert N == tl.point_capacity and N % 8 == 0
    assert task.xt.shape == (2, tl.target_capacity, 2)
    assert task.yt_aux.shape[:2] == (2, tl.target_capacity)
    assert len(task.x1g) % 16 == 0


def test_internal_grid_covers_data(pipeline):
    tl, _ = make_loader(pipeline)
    assert tl.x1g.min() < 0 and tl.x1g.max() > 1


def test_fraction_sampling_reduces_context(pipeline):
    tl, times = make_loader(pipeline, context_sampling=["all", 0.3])
    task = tl(times[0], seed_override=0)
    full = tl(times[0], context_sampling=["all", "all"])
    n_frac = float(np.asarray(task.points[0].mask).sum())
    n_all = float(np.asarray(full.points[0].mask).sum())
    assert n_frac == pytest.approx(0.3 * n_all, abs=2)


def test_int_sampling(pipeline):
    tl, times = make_loader(pipeline, context_sampling=["all", 5])
    task = tl(times[0], seed_override=0)
    assert float(np.asarray(task.points[0].mask).sum()) == 5


def test_split_complementarity(pipeline):
    """Split context stations and target stations must be disjoint."""
    tl, times = make_loader(pipeline, context_sampling=["all", "split"],
                            target_sampling="split", links=[(1, 0)])
    task = tl(times[2], seed_override=7)
    pm = np.asarray(task.points[0].mask)[0].astype(bool)
    tm = np.asarray(task.yt_mask)[0].astype(bool)
    ctx_pts = {tuple(p) for p in np.asarray(task.points[0].x)[0][pm].round(6).tolist()}
    tgt_pts = {tuple(p) for p in np.asarray(task.xt)[0][tm].round(6).tolist()}
    assert ctx_pts and tgt_pts
    assert not (ctx_pts & tgt_pts)


def test_datewise_deterministic(pipeline):
    tl, times = make_loader(pipeline, context_sampling=["all", 0.5])
    a = tl(times[0], datewise_deterministic=True)
    b = tl(times[0], datewise_deterministic=True)
    np.testing.assert_array_equal(np.asarray(a.points[0].x), np.asarray(b.points[0].x))
    c = tl(times[1], datewise_deterministic=True)
    assert not np.array_equal(np.asarray(a.points[0].x), np.asarray(c.points[0].x))


def test_seed_override(pipeline):
    tl, times = make_loader(pipeline, context_sampling=["all", 0.5])
    a = tl(times[0], seed_override=42)
    b = tl(times[0], seed_override=42)
    np.testing.assert_array_equal(np.asarray(a.points[0].x), np.asarray(b.points[0].x))


def test_aux_at_targets_values(pipeline):
    dp, base_n, dem_n, st_n, base = pipeline
    tl, times = make_loader(pipeline)
    task = tl(times[0])
    tm = np.asarray(task.yt_mask)[0].astype(bool)
    aux = np.asarray(task.yt_aux)[0][tm, 0]
    # aux channel is min_max-normalised elevation: must lie in [-1, 1]
    assert aux.min() >= -1.0 - 1e-5 and aux.max() <= 1.0 + 1e-5


def test_interp_grid_at_points_exact_on_nodes():
    lat = np.linspace(0, 1, 5)
    lon = np.linspace(0, 1, 7)
    data = np.add.outer(lat, 2 * lon)
    f = Field(data, ("x1", "x2"), {"x1": lat, "x2": lon}, "f")
    got = interp_grid_at_points(f, np.array([0.25, 0.6]), np.array([0.5, 1 / 6]))
    np.testing.assert_allclose(got, [0.25 + 1.0, 0.6 + 1 / 3], atol=1e-12)


def test_pickle_roundtrip(pipeline, tmp_path):
    import pickle

    tl, times = make_loader(pipeline)
    p = tmp_path / "tl.pkl"
    with open(p, "wb") as f:
        pickle.dump(tl, f)
    with open(p, "rb") as f:
        tl2 = pickle.load(f)
    t1 = tl(times[0])
    t2 = tl2(times[0])
    np.testing.assert_array_equal(np.asarray(t1.xt), np.asarray(t2.xt))


def test_delta_t_time_lag(pipeline):
    """delta_t shifts which time slice feeds each context set."""
    dp, base_n, dem_n, st_n, base = pipeline
    times = base.coords["time"]
    tl_lag = TaskLoader(
        context=[base_n, st_n], target=st_n, aux_at_targets=dem_n,
        internal_density=32, grid_multiple=16, delta_t=[-1, 0],
    )
    tl_now = TaskLoader(
        context=[base_n, st_n], target=st_n, aux_at_targets=dem_n,
        internal_density=32, grid_multiple=16,
    )
    lagged = tl_lag(times[2])
    plain = tl_now(times[2])
    want_prev = tl_now(times[1])
    np.testing.assert_array_equal(
        np.asarray(lagged.grids[0].y), np.asarray(want_prev.grids[0].y)
    )
    assert not np.array_equal(
        np.asarray(lagged.grids[0].y), np.asarray(plain.grids[0].y)
    )
    # targets still at the requested date
    np.testing.assert_array_equal(np.asarray(lagged.xt), np.asarray(plain.xt))


def test_aux_at_contexts_appends_channels(pipeline):
    dp, base_n, dem_n, st_n, base = pipeline
    times = base.coords["time"]
    tl_aux = TaskLoader(
        context=[base_n, st_n], target=st_n, aux_at_targets=dem_n,
        aux_at_contexts=dem_n,
        internal_density=32, grid_multiple=16,
    )
    tl_plain = TaskLoader(
        context=[base_n, st_n], target=st_n, aux_at_targets=dem_n,
        internal_density=32, grid_multiple=16,
    )
    a = tl_aux(times[0])
    b = tl_plain(times[0])
    assert a.points[0].y.shape[-1] == b.points[0].y.shape[-1] + 1
    assert tl_aux.context_dims()[1] == tl_plain.context_dims()[1] + 1
    # aux channel values are in the normalised elevation range
    m = np.asarray(a.points[0].mask)[0].astype(bool)
    aux_vals = np.asarray(a.points[0].y)[0][m, -1]
    assert aux_vals.min() >= -1.01 and aux_vals.max() <= 1.01


def test_random_sampling_varies_per_task(pipeline):
    """'random': a FRESH uniform fraction per task (train.py:311-314)."""
    tl, times = make_loader(pipeline, context_sampling=["all", "random"])
    counts = []
    for t in times[:5]:
        task = tl(t, datewise_deterministic=True)
        counts.append(float(np.asarray(task.points[0].mask).sum()))
    assert len(set(counts)) > 1  # fractions differ across dates
    # deterministic per date
    again = tl(times[0], datewise_deterministic=True)
    assert float(np.asarray(again.points[0].mask).sum()) == counts[0]


def test_bool_true_means_all(pipeline):
    """station_as_context=True (bool YAML arg) must behave as 'all', not
    as an int-1 sample."""
    tl, times = make_loader(pipeline, context_sampling=["all", True])
    task = tl(times[0])
    full = tl(times[0], context_sampling=["all", "all"])
    assert float(np.asarray(task.points[0].mask).sum()) == \
        float(np.asarray(full.points[0].mask).sum())


def test_nan_context_rows_dropped_slow_path(pipeline, monkeypatch):
    """A NaN station reading must never enter the encoder as a valid 0
    (reference drops NaN rows, train.py:530 dropna)."""
    import deepsensornz_tpu.native.taskpack as tp

    monkeypatch.setattr(tp, "available", lambda: False)  # force slow path
    dp, base_n, dem_n, st_n, base = pipeline
    times = base.coords["time"]
    st_bad = st_n.copy()
    col = [c for c in st_bad.columns if c.endswith("_station")][0]
    t0 = st_bad["time"].iloc[0]
    first_rows = st_bad.index[st_bad["time"] == t0][:3]
    st_bad.loc[first_rows, col] = np.nan
    tl = TaskLoader(context=[base_n, st_bad], target=st_n,
                    aux_at_targets=dem_n, internal_density=32, grid_multiple=16)
    task = tl([t0])
    clean = TaskLoader(context=[base_n, st_n], target=st_n,
                       aux_at_targets=dem_n, internal_density=32, grid_multiple=16)
    ref = clean([t0])
    n_bad = float(np.asarray(task.points[0].mask).sum())
    n_clean = float(np.asarray(ref.points[0].mask).sum())
    assert n_bad == n_clean - 3
    # every surviving context value is finite and none is a fake nan->0
    m = np.asarray(task.points[0].mask)[0].astype(bool)
    vals = np.asarray(task.points[0].y)[0][m]
    assert np.isfinite(vals).all()


def test_nan_context_rows_dropped_fast_path(pipeline):
    """Same dropna semantics on the native fast path (if built)."""
    from deepsensornz_tpu.native.taskpack import available

    if not available():
        pytest.skip("native taskpack unavailable")
    dp, base_n, dem_n, st_n, base = pipeline
    times = base.coords["time"]
    st_bad = st_n.copy()
    col = [c for c in st_bad.columns if c.endswith("_station")][0]
    t0 = st_bad["time"].iloc[0]
    first_rows = st_bad.index[st_bad["time"] == t0][:3]
    st_bad.loc[first_rows, col] = np.nan
    tl = TaskLoader(context=[base_n, st_bad], target=st_n,
                    aux_at_targets=dem_n, internal_density=32, grid_multiple=16)
    task = tl([t0, times[1]])
    m0 = np.asarray(task.points[0].mask)[0].astype(bool)
    vals = np.asarray(task.points[0].y)[0][m0]
    assert np.isfinite(vals).all()
    clean = TaskLoader(context=[base_n, st_n], target=st_n,
                       aux_at_targets=dem_n, internal_density=32, grid_multiple=16)
    ref = clean([t0, times[1]])
    assert m0.sum() == np.asarray(ref.points[0].mask)[0].astype(bool).sum() - 3


def test_flat_cache_invalidated_on_swap(pipeline):
    """The fast-path flat cache must never serve a stale frame: entries are
    identity-checked and _rebuild_static clears the cache (operational
    in-place swap path, pipeline/validate.py)."""
    dp, base_n, dem_n, st_n, base = pipeline
    times = base.coords["time"]
    tl = TaskLoader(context=[base_n, st_n], target=st_n,
                    aux_at_targets=dem_n, internal_density=32, grid_multiple=16)
    task1 = tl([times[0]])
    ref_vals = np.asarray(task1.yt).copy()
    # swap in a shifted frame (fresh object, same shape) WITHOUT telling the
    # cache — identity check must still pick up the new data
    col = [c for c in st_n.columns if c.endswith("_station")][0]
    shifted = st_n.copy()
    shifted[col] = shifted[col] + 5.0
    tl.target = shifted
    tl.context = [base_n, shifted]
    task2 = tl([times[0]])
    m = np.asarray(task2.yt_mask)[0].astype(bool)
    diff = np.asarray(task2.yt)[0][m] - ref_vals[0][m]
    np.testing.assert_allclose(diff, 5.0, atol=1e-5)
    # _rebuild_static clears the cache outright
    tl._rebuild_static()
    assert tl._flat_cache == {}


def test_time_resolution_mismatch_snaps_same_day(pipeline):
    """Daily-resampled station frame queried at an hourly timestamp must not
    silently return an empty task; it snaps to the frame's same-day rows."""
    dp, base_n, dem_n, st_n, base = pipeline
    t0 = np.datetime64(st_n["time"].iloc[0], "s")
    hourly = t0 + np.timedelta64(14, "h")
    tl = TaskLoader(context=[base_n, st_n], target=st_n,
                    aux_at_targets=dem_n, internal_density=32, grid_multiple=16)
    import warnings as _w

    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        task = tl([hourly])
    assert float(np.asarray(task.yt_mask).sum()) > 0
    assert any("resolution" in str(r.message) for r in rec)
    # a date whose whole day is absent still yields an empty set
    task2 = tl([t0 + np.timedelta64(3650, "D")])
    assert float(np.asarray(task2.yt_mask).sum()) == 0


def test_swap_data_roundtrip(pipeline):
    """swap_data: tasks reflect swapped data inside the block; the loader is
    bit-identical to its pre-swap self afterwards (public API for the
    reference's operational loader mutation, validate_ERA.py:117-127)."""
    tl, times = make_loader(pipeline)
    dp, base_n, dem_n, st_n, base = pipeline

    before = tl(times[0], seed_override=3)
    saved_ids = (list(map(list, tl.context_var_IDs)), list(tl.target_var_IDs))
    saved_caps = (tl.point_capacity, tl.target_capacity)
    saved_grid = (tl.x1g.copy(), tl.x2g.copy())

    # swap in a reduced station frame (half the stations) as both
    # context set 1 and target
    keep = sorted(st_n["station_id"].unique())[: 12]
    sub = st_n[st_n["station_id"].isin(keep)]
    with tl.swap_data(context=[base_n, sub], target=sub) as swapped:
        assert swapped is tl
        task = tl(times[0], seed_override=3)
        n_sub = float(np.asarray(task.points[0].mask).sum())
        n_full = float(np.asarray(before.points[0].mask).sum())
        assert n_sub < n_full
        # capacities never shrink: compiled programs survive the swap
        assert tl.point_capacity == saved_caps[0]
        assert tl.target_capacity == saved_caps[1]

    # restored: var IDs, geometry, and task content identical
    assert (list(map(list, tl.context_var_IDs)), list(tl.target_var_IDs)) == saved_ids
    np.testing.assert_array_equal(tl.x1g, saved_grid[0])
    np.testing.assert_array_equal(tl.x2g, saved_grid[1])
    after = tl(times[0], seed_override=3)
    np.testing.assert_array_equal(np.asarray(before.points[0].x),
                                  np.asarray(after.points[0].x))
    np.testing.assert_array_equal(np.asarray(before.yt),
                                  np.asarray(after.yt))


def test_swap_data_rejects_wrong_set_count(pipeline):
    tl, _ = make_loader(pipeline)
    with pytest.raises(ValueError, match="sets"):
        with tl.swap_data(context=[tl.context[0]]):
            pass


def test_swap_data_restores_on_exception(pipeline):
    tl, times = make_loader(pipeline)
    dp, base_n, dem_n, st_n, base = pipeline
    before = tl(times[1], seed_override=5)
    with pytest.raises(RuntimeError):
        with tl.swap_data(context=[base_n, st_n.iloc[:4]]):
            raise RuntimeError("boom")
    after = tl(times[1], seed_override=5)
    np.testing.assert_array_equal(np.asarray(before.points[0].x),
                                  np.asarray(after.points[0].x))
