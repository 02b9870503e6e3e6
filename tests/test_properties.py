"""Property tests: equivariance, numerical stress, fine-tune semantics."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepsensornz_tpu.models.likelihoods import LowRankGaussian
from deepsensornz_tpu.ops.setconv import (
    setconv_decode_offgrid,
    setconv_encode_offgrid,
)


def test_setconv_translation_equivariance(rng):
    """Shifting points and grid together leaves the encoding unchanged —
    the CNN translation-equivariance property the ConvNP relies on (and
    which the reference deliberately breaks only via the explicit x1/x2
    channels, preprocess.py:917-924)."""
    H = W = 24
    x1g = np.linspace(0, 1, H).astype(np.float32)
    x2g = np.linspace(0, 1, W).astype(np.float32)
    x = rng.random((1, 6, 2)).astype(np.float32) * 0.5 + 0.25
    y = rng.normal(size=(1, 6, 1)).astype(np.float32)
    m = np.ones((1, 6), np.float32)
    base = np.asarray(setconv_encode_offgrid(x1g, x2g, x, y, m, 0.1))
    delta = 0.37
    shifted = np.asarray(setconv_encode_offgrid(
        x1g + delta, x2g - delta,
        x + np.array([delta, -delta], np.float32), y, m, 0.1,
    ))
    np.testing.assert_allclose(shifted, base, rtol=1e-4, atol=1e-5)


def test_decode_then_encode_roundtrip_scale(rng):
    """Decoding at the grid nodes of a smooth encoded field approximates the
    field (normalised decoder = interpolation)."""
    H = W = 32
    x1g = np.linspace(0, 1, H).astype(np.float32)
    x2g = np.linspace(0, 1, W).astype(np.float32)
    f = np.sin(4 * x1g)[None, :, None, None] * np.cos(3 * x2g)[None, None, :, None]
    f = np.broadcast_to(f, (1, H, W, 1)).astype(np.float32)
    pts = rng.random((1, 40, 2)).astype(np.float32) * 0.8 + 0.1
    dec = np.asarray(setconv_decode_offgrid(x1g, x2g, f, pts, 1.5 / H))
    want = np.sin(4 * pts[..., 0]) * np.cos(3 * pts[..., 1])
    np.testing.assert_allclose(dec[..., 0], want, atol=0.05)


def test_gnp_numerical_stress():
    """Low-rank NLL must stay finite under extreme raw parameters and
    large M (grid-scale joint)."""
    M, R = 2048, 64
    lik = LowRankGaussian(dim_y=1, rank=R)
    rng = np.random.default_rng(0)
    raw = (rng.standard_normal((1, M, lik.num_params())) * 20).astype(np.float32)
    y = (rng.standard_normal((1, M, 1)) * 50).astype(np.float32)
    mask = np.ones((1, M), np.float32)
    nll = float(lik.nll(jnp.asarray(raw), jnp.asarray(y), jnp.asarray(mask)))
    assert np.isfinite(nll)
    mean, std = lik.mean_std(jnp.asarray(raw))
    assert np.isfinite(np.asarray(mean)).all()
    assert np.isfinite(np.asarray(std)).all() and (np.asarray(std) > 0).all()
    # gradient is finite too
    g = jax.grad(lambda r: lik.nll(r, jnp.asarray(y), jnp.asarray(mask)))(
        jnp.asarray(raw)
    )
    assert np.isfinite(np.asarray(g)).all()


def test_finetune_warm_start(tmp_path):
    """pretrained_dir loads weights and freezes the encoder except for
    surface_pressure (train.py:243-258)."""
    from deepsensornz_tpu.data.synthetic import synthetic_bundle
    from deepsensornz_tpu.pipeline.preprocess import PreprocessForDownscaling
    from deepsensornz_tpu.pipeline.train import Train

    base, dem, stations = synthetic_bundle(n_times=6, base_hw=(16, 16),
                                           dem_hw=(32, 32), n_stations=10)
    pre = PreprocessForDownscaling(variable="temperature")
    out = pre.run_processing_sequence(dem, {"temperature": base}, stations,
                                      highres_factor=2, lowres_factor=4)
    tr = Train(out)
    tr.setup_task_loader(station_as_context="all", internal_density=24)
    tr.initialise_model(unet_channels=(8, 8), likelihood="cnp",
                        compute_dtype="float32", decoder_channels=8, mlp_hidden=8)
    d1 = str(tmp_path / "m1")
    r1 = tr.train_model(n_epochs=1, batch_size=4, lr=1e-3, model_dir=d1,
                        verbose=False)

    tr2 = Train(out)
    tr2.setup_task_loader(station_as_context="all", internal_density=24)
    tr2.initialise_model(unet_channels=(8, 8), likelihood="cnp",
                         compute_dtype="float32", decoder_channels=8,
                         mlp_hidden=8, pretrained_dir=d1)
    # warm start loaded the checkpointed params
    a = np.asarray(r1["params"]["params"]["unet"]["down_0"]["kernel"])
    b = np.asarray(tr2.params["params"]["unet"]["down_0"]["kernel"])
    np.testing.assert_array_equal(a, b)
    assert tr2.frozen_patterns  # temperature → encoder frozen

    head_before = np.asarray(tr2.params["params"]["head_out"]["kernel"]).copy()
    r2 = tr2.train_model(n_epochs=1, batch_size=4, lr=1e-2,
                         model_dir=str(tmp_path / "m2"), verbose=False)
    # encoder unchanged after fine-tune steps; head moved
    after = np.asarray(r2["final_state"].params["params"]["unet"]["down_0"]["kernel"])
    np.testing.assert_array_equal(after, b)
    head_after = np.asarray(r2["final_state"].params["params"]["head_out"]["kernel"])
    assert not np.array_equal(head_before, head_after)


def test_finetune_surface_pressure_unfrozen(tmp_path):
    from deepsensornz_tpu.data.synthetic import synthetic_bundle
    from deepsensornz_tpu.pipeline.preprocess import PreprocessForDownscaling
    from deepsensornz_tpu.pipeline.train import Train

    base, dem, stations = synthetic_bundle(
        variable="surface_pressure", n_times=4, base_hw=(16, 16),
        dem_hw=(32, 32), n_stations=8,
    )
    pre = PreprocessForDownscaling(variable="surface_pressure")
    out = pre.run_processing_sequence(dem, {"surface_pressure": base}, stations,
                                      highres_factor=2, lowres_factor=4)
    tr = Train(out)
    tr.setup_task_loader(station_as_context="all", internal_density=24)
    tr.initialise_model(unet_channels=(8,), likelihood="cnp",
                        compute_dtype="float32", decoder_channels=8, mlp_hidden=8)
    d1 = str(tmp_path / "sp")
    tr.train_model(n_epochs=1, batch_size=2, lr=1e-3, model_dir=d1, verbose=False)

    tr2 = Train(out)
    tr2.setup_task_loader(station_as_context="all", internal_density=24)
    tr2.initialise_model(unet_channels=(8,), likelihood="cnp",
                         compute_dtype="float32", decoder_channels=8,
                         mlp_hidden=8, pretrained_dir=d1)
    assert tr2.frozen_patterns == ()  # surface_pressure keeps encoder live
