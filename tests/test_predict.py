"""Predictor: gridded/point prediction, unnormalisation, sea mask, samples."""

import numpy as np
import pytest

from deepsensornz_tpu.data.processor import DataProcessor
from deepsensornz_tpu.data.synthetic import synthetic_bundle
from deepsensornz_tpu.infer.predict import Predictor
from deepsensornz_tpu.models.convnp import ConvNP, ConvNPConfig
from deepsensornz_tpu.task.loader import TaskLoader
import jax


@pytest.fixture(scope="module")
def setting():
    base, dem, stations = synthetic_bundle(
        n_times=6, base_hw=(16, 16), dem_hw=(48, 48), n_stations=16
    )
    dp = DataProcessor()
    dp.set_coord_maps_from_extent(
        dem.coords["latitude"].min(), dem.coords["latitude"].max(),
        dem.coords["longitude"].min(), dem.coords["longitude"].max(),
    )
    dem_n = dp(dem.fillna(0.0).rename("elevation"), method="min_max")
    st_col = [c for c in stations.columns if c.endswith("_station")][0]
    tl = TaskLoader(
        context=[dp(base, method="mean_std"), dp(stations, method="mean_std")],
        target=dp(stations),
        aux_at_targets=dem_n,
        internal_density=32, grid_multiple=16,
    )
    cfg = ConvNPConfig(unet_channels=(8, 8), likelihood="gnp", internal_density=32,
                       decoder_channels=8, mlp_hidden=8, rank=4, compute_dtype="float32")
    model = ConvNP(cfg)
    times = base.coords["time"]
    task = tl(list(times[:2]))
    params = model.init(jax.random.key(0), task)
    pred = Predictor(model, params, dp, st_col)
    return pred, task, dem, dem_n, times, stations, st_col


def test_gridded_prediction_fields(setting):
    pred, task, dem, dem_n, times, stations, st_col = setting
    out = pred.predict_grid(task, dem, aux_at_targets=dem_n, times=times[:2])
    mean, std = out["mean"], out["std"]
    assert mean.dims == ("time", "latitude", "longitude")
    assert mean.shape == (2, 48, 48)
    np.testing.assert_array_equal(mean.coords["latitude"], dem.coords["latitude"])
    # sea cells masked
    sea = np.isnan(dem.data)
    assert np.isnan(mean.data[:, sea]).all()
    land = ~sea
    assert np.isfinite(mean.data[:, land]).all()
    assert (std.data[:, land] > 0).all()


def test_transfer_dtype_halves_bytes_same_answer(setting):
    """float16 transfer mode (remote-serving option) matches the f32 path to
    half precision; NaN sea mask and coords survive."""
    pred, task, dem, dem_n, times, stations, st_col = setting
    p16 = Predictor(pred.model, pred.params, pred.dp, st_col,
                    transfer_dtype="float16")
    a = pred.predict_grid(task, dem, aux_at_targets=dem_n)
    b = p16.predict_grid(task, dem, aux_at_targets=dem_n)
    land = ~np.isnan(dem.data)
    ma, mb = a["mean"].data[:, land], b["mean"].data[:, land]
    # f16 resolves ~1e-3 of the normalised value; after unnormalisation the
    # tolerance scales with the target's std (~5 here)
    np.testing.assert_allclose(mb, ma, atol=2e-2 * max(1.0, np.abs(ma).max()))
    assert np.isnan(b["mean"].data[:, ~land]).all()


@pytest.mark.parametrize("tdt,rel", [("int16", 1.0 / 65000), ("int8", 1.0 / 250)])
def test_quantized_transfer_matches_f32(setting, tdt, rel):
    """int16/int8 transfer modes (in-graph affine quantization with
    per-(task, channel) scale/offset) match the f32 path within the
    quantization step: max abs error ≤ map range/(2ᵇ−1). Samples dequantize
    through the same path; sea mask survives."""
    pred, task, dem, dem_n, times, stations, st_col = setting
    pq = Predictor(pred.model, pred.params, pred.dp, st_col,
                   transfer_dtype=tdt)
    a = pred.predict_grid(task, dem, aux_at_targets=dem_n, n_samples=2)
    b = pq.predict_grid(task, dem, aux_at_targets=dem_n, n_samples=2)
    land = ~np.isnan(dem.data)
    for key in ("mean", "std", "samples"):
        ma = a[key].data[..., land]
        mb = b[key].data[..., land]
        rng_per_map = np.nanmax(ma) - np.nanmin(ma)
        assert np.nanmax(np.abs(mb - ma)) <= rel * max(rng_per_map, 1e-6) * 1.01
    assert np.isnan(b["mean"].data[:, ~land]).all()


def test_cf_int16_packed_netcdf_roundtrip(setting, tmp_path):
    """save_prediction(packing='int16') writes CF scale_factor/add_offset
    packed variables that open_dataset unpacks transparently: values within
    range/65000, NaN sea cells round-trip via _FillValue, file smaller."""
    import os

    from deepsensornz_tpu.data.grid import open_dataset
    from deepsensornz_tpu.infer.writer import save_prediction

    pred, task, dem, dem_n, times, stations, st_col = setting
    out = pred.predict_grid(task, dem, aux_at_targets=dem_n, times=times[:2])
    p32 = str(tmp_path / "f32.nc")
    p16 = str(tmp_path / "i16.nc")
    save_prediction(out, p32, "temperature", "t")
    save_prediction(out, p16, "temperature", "t", packing="int16")
    back = open_dataset(p16)
    m0, m1 = out["mean"].data, back["mean"].data
    land = ~np.isnan(dem.data)
    span = np.nanmax(m0) - np.nanmin(m0)
    assert np.nanmax(np.abs(m1[:, land] - m0[:, land])) <= span / 65000 * 1.01
    assert np.isnan(m1[:, ~land]).all()
    # gzip already squeezes the tiny fixture hard; just require smaller
    # (the 2× raw-bytes win shows at operational sizes)
    assert os.path.getsize(p16) < os.path.getsize(p32)


def test_unnormalisation_scale(setting):
    pred, task, dem, dem_n, times, stations, st_col = setting
    phys = pred.predict_grid(task, dem, aux_at_targets=dem_n)
    norm = pred.predict_grid(task, dem, aux_at_targets=dem_n, unnormalise=False)
    scale = pred.dp.config[st_col]["params"]["std"]
    offset = pred.dp.config[st_col]["params"]["mean"]
    land = ~np.isnan(dem.data)
    np.testing.assert_allclose(
        phys["mean"].data[:, land],
        norm["mean"].data[:, land] * scale + offset, rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        phys["std"].data[:, land], norm["std"].data[:, land] * scale,
        rtol=1e-5, atol=1e-5,
    )


def test_joint_samples(setting):
    pred, task, dem, dem_n, times, stations, st_col = setting
    out = pred.predict_grid(task, dem, aux_at_targets=dem_n, n_samples=64)
    s = out["samples"]
    assert s.shape == (64, 2, 48, 48)
    land = ~np.isnan(dem.data)
    assert np.isfinite(s.data[:, :, land]).all()
    # samples scatter around the mean: z-stats consistent with N(0,1)
    # (samples are spatially CORRELATED — low-rank joint — so per-sample
    # field means vary; across 64 samples the aggregate mean tightens)
    z = (s.data[:, :, land] - out["mean"].data[None, :, land]) / out["std"].data[None, :, land]
    assert abs(float(np.nanmean(z))) < 0.35
    assert 0.6 < float(np.nanstd(z)) < 1.5
    assert np.isfinite(z).all()


def test_point_prediction(setting):
    pred, task, dem, dem_n, times, stations, st_col = setting
    out = pred.predict_points(task)
    assert out["mean"].shape == (2, task.num_targets)
    m = out["mask"]
    assert np.isfinite(out["mean"][m]).all()
    assert np.isnan(out["mean"][~m]).all()
    # physical-unit sanity: predictions near the observed value range
    obs = stations[st_col]
    assert out["mean"][m].min() > obs.min() - 50
    assert out["mean"][m].max() < obs.max() + 50


def test_resolution_factor(setting):
    pred, task, dem, dem_n, times, stations, st_col = setting
    out = pred.predict_grid(task, dem, aux_at_targets=dem_n, resolution_factor=0.5)
    assert out["mean"].shape == (2, 24, 24)
    out2 = pred.predict_grid(task, dem, aux_at_targets=dem_n, resolution_factor=2.0)
    assert out2["mean"].shape == (2, 96, 96)


def test_ar_sample_grid(setting):
    pred, task, dem, dem_n, times, stations, st_col = setting
    samples = pred.ar_sample_grid(task, dem, aux_at_targets=dem_n,
                                  n_samples=2, subsample_factor=8, n_blocks=3)
    assert samples.shape == (2, 2, 48, 48)
    sea = np.isnan(dem.data)
    assert np.isnan(samples[:, :, sea]).all()
    land = ~sea
    assert np.isfinite(samples[:, :, land]).all()
    # different draws differ
    assert not np.allclose(samples[0][:, land], samples[1][:, land])


def test_std_scale_recalibration(setting):
    """Predictor(std_scale=s) scales std by s and joint samples around the
    mean by s, on both the gridded and point paths; the mean is untouched."""
    pred, task, dem, dem_n, times, stations, st_col = setting
    scaled = Predictor(pred.model, pred.params, pred.dp, st_col, std_scale=2.0)
    land = ~np.isnan(dem.data)

    a = pred.predict_grid(task, dem, aux_at_targets=dem_n, n_samples=4, seed=7)
    b = scaled.predict_grid(task, dem, aux_at_targets=dem_n, n_samples=4, seed=7)
    np.testing.assert_allclose(b["mean"].data[:, land], a["mean"].data[:, land],
                               rtol=1e-6)
    np.testing.assert_allclose(b["std"].data[:, land],
                               2.0 * a["std"].data[:, land], rtol=1e-5)
    # same seed → same base noise; deviations from the mean double
    da = a["samples"].data[:, :, land] - a["mean"].data[None, :, land]
    db = b["samples"].data[:, :, land] - b["mean"].data[None, :, land]
    np.testing.assert_allclose(db, 2.0 * da, rtol=1e-4, atol=1e-5)

    pa = pred.predict_points(task)
    pb = scaled.predict_points(task)
    m = pa["mask"]
    np.testing.assert_allclose(pb["mean"][m], pa["mean"][m], rtol=1e-6)
    np.testing.assert_allclose(pb["std"][m], 2.0 * pa["std"][m], rtol=1e-5)


def test_batch_chunked_predict_matches_unchunked(setting):
    """batch_chunk + download_threads is a pure execution strategy: the
    chunked (padded-tail, thread-fetched) month pipeline returns the SAME
    mean/std as the one-shot forward."""
    pred, task, dem, dem_n, times, stations, st_col = setting
    from deepsensornz_tpu.task.loader import TaskLoader  # noqa: F401 (docs)

    # 5 tasks with chunk 2 → chunks [0:2], [2:4], [4:5]+pad
    import deepsensornz_tpu.task.batching as batching

    tl_task = task
    big = batching.concat([tl_task, tl_task, batching.take(tl_task, [0])])
    assert big.batch_size == 5
    chunked = Predictor(pred.model, pred.params, pred.dp, st_col,
                        batch_chunk=2, download_threads=3)
    a = pred.predict_grid(big, dem, aux_at_targets=dem_n)
    b = chunked.predict_grid(big, dem, aux_at_targets=dem_n)
    for k in ("mean", "std"):
        # different batch shapes compile different XLA programs; f32
        # reduction order may reassociate → tiny per-element drift
        np.testing.assert_allclose(a[k].data, b[k].data, rtol=1e-4, atol=1e-6)


def test_batch_chunked_samples_shape(setting):
    """Chunked joint samples concatenate on the batch axis (per-chunk
    seeds — sampled fields legitimately differ from the one-shot draw)."""
    pred, task, dem, dem_n, times, stations, st_col = setting
    chunked = Predictor(pred.model, pred.params, pred.dp, st_col,
                        batch_chunk=1, download_threads=2)
    out = chunked.predict_grid(task, dem, aux_at_targets=dem_n, n_samples=3)
    s = out["samples"]
    assert s.shape == (3, task.batch_size, 48, 48)
    land = ~np.isnan(dem.data)
    assert np.isfinite(s.data[:, :, land]).all()


def test_mean_only_outputs_matches_full(setting):
    """outputs=("mean",) (reference-operational: infer.py:104 keeps only the
    mean) fetches an identical mean map and simply omits the std field."""
    pred, task, dem, dem_n, times, stations, st_col = setting
    full = pred.predict_grid(task, dem, aux_at_targets=dem_n)
    m = pred.predict_grid(task, dem, aux_at_targets=dem_n, outputs=("mean",))
    np.testing.assert_array_equal(m["mean"].data, full["mean"].data)
    assert "std" not in m
    with pytest.raises(ValueError):
        pred.predict_grid(task, dem, aux_at_targets=dem_n, outputs=("std",))


def test_upload_dtype_compression(setting):
    """upload_dtype="float16" halves the upload of the task's VALUE leaves;
    outputs match the f32 path to input-rounding precision (coordinates and
    on-device compute stay f32), chunked or not."""
    from deepsensornz_tpu.infer.predict import _prepare_grid_task

    pred, task, dem, dem_n, times, stations, st_col = setting
    p16 = Predictor(pred.model, pred.params, pred.dp, st_col,
                    upload_dtype="float16")
    a = pred.predict_grid(task, dem, aux_at_targets=dem_n)
    b = p16.predict_grid(task, dem, aux_at_targets=dem_n)
    land = ~np.isnan(dem.data)
    ma, mb = a["mean"].data[:, land], b["mean"].data[:, land]
    np.testing.assert_allclose(mb, ma, atol=2e-2 * max(1.0, np.abs(ma).max()))
    np.testing.assert_allclose(b["std"].data[:, land], a["std"].data[:, land],
                               rtol=2e-2, atol=1e-3)
    # chunked + compressed pipeline agrees with its own one-shot result
    import deepsensornz_tpu.task.batching as batching

    big = batching.concat([task, task, batching.take(task, [0])])
    pc = Predictor(pred.model, pred.params, pred.dp, st_col,
                   upload_dtype="float16", batch_chunk=2, download_threads=2)
    c = pc.predict_grid(big, dem, aux_at_targets=dem_n)
    np.testing.assert_allclose(c["mean"].data[:2], b["mean"].data,
                               rtol=1e-4, atol=1e-6)
    # the upload shaping: target leaves are stripped, VALUE leaves are f16,
    # coordinate leaves are untouched f32
    import jax.numpy as jnp

    t = _prepare_grid_task(task, "float16")
    assert t.yt is None and t.yt_aux is None
    assert t.xt.shape == (task.batch_size, 1, 2)
    assert t.grids[0].y.dtype == jnp.float16
    assert t.points[0].y.dtype == jnp.float16
    assert t.points[0].x.dtype == jnp.float32
    assert t.x1g.dtype == jnp.float32


def test_land_only_transfer_exact(setting):
    """sea_mask=True transfers ONLY land cells (in-graph gather, host
    scatter). Land values must equal the full-map path bit-for-bit (same
    program up to the gather), sea cells NaN; quantized modes agree to
    their documented step."""
    pred, task, dem, dem_n, times, stations, st_col = setting
    a = pred.predict_grid(task, dem, aux_at_targets=dem_n, sea_mask=False)
    b = pred.predict_grid(task, dem, aux_at_targets=dem_n, sea_mask=True)
    land = ~np.isnan(dem.data)
    for k in ("mean", "std"):
        np.testing.assert_array_equal(b[k].data[:, land], a[k].data[:, land])
        assert np.isnan(b[k].data[:, ~land]).all()
    # int16 quantization over the gathered land axis
    q = Predictor(pred.model, pred.params, pred.dp, st_col,
                  transfer_dtype="int16")
    c = q.predict_grid(task, dem, aux_at_targets=dem_n, sea_mask=True)
    ma = a["mean"].data[:, land]
    np.testing.assert_allclose(c["mean"].data[:, land], ma,
                               atol=(ma.max() - ma.min()) / 65535 + 1e-6)
