"""ConvNP end-to-end: forward shapes, loss decrease, gridded/offgrid parity."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from deepsensornz_tpu.data.processor import DataProcessor
from deepsensornz_tpu.data.synthetic import synthetic_bundle
from deepsensornz_tpu.models.convnp import ConvNP, ConvNPConfig, count_params
from deepsensornz_tpu.task.loader import TaskLoader


@pytest.fixture(scope="module")
def setup():
    base, dem, stations = synthetic_bundle(
        n_times=8, base_hw=(16, 16), dem_hw=(48, 48), n_stations=24
    )
    dp = DataProcessor()
    dp.set_coord_maps_from_extent(
        dem.coords["latitude"].min(), dem.coords["latitude"].max(),
        dem.coords["longitude"].min(), dem.coords["longitude"].max(),
    )
    base_n = dp(base, method="mean_std")
    dem_n = dp(dem.fillna(0.0).rename("elevation"), method="min_max")
    st_n = dp(stations, method="mean_std")
    tl = TaskLoader(
        context=[base_n, st_n], target=st_n, aux_at_targets=dem_n,
        internal_density=32, grid_multiple=16,
    )
    times = base.coords["time"]
    cfg = ConvNPConfig(
        unet_channels=(16, 16), likelihood="cnp", internal_density=32,
        decoder_channels=16, mlp_hidden=16, rank=8, compute_dtype="float32",
    )
    model = ConvNP(cfg)
    task = tl(list(times[:4]))
    params = model.init(jax.random.key(0), task)
    return model, params, tl, times, cfg


def test_forward_shapes(setup):
    model, params, tl, times, cfg = setup
    task = tl(list(times[:2]))
    raw = model.apply(params, task)
    assert raw.shape == (2, tl.target_capacity, 2)  # cnp: mean + scale


def test_loss_finite_and_positive_params(setup):
    model, params, tl, times, cfg = setup
    task = tl(list(times[:2]))
    loss = float(model.loss(params, task))
    assert np.isfinite(loss)
    assert count_params(params) > 1000


def test_loss_decreases_under_training(setup):
    model, params, tl, times, cfg = setup
    task = tl(list(times[:6]))
    opt = optax.adamw(1e-3)
    state = opt.init(params)

    @jax.jit
    def step(params, state, task):
        loss, grads = jax.value_and_grad(model.loss)(params, task)
        updates, state = opt.update(grads, state, params)
        return optax.apply_updates(params, updates), state, loss

    losses = []
    p = params
    for _ in range(30):
        p, state, l = step(p, state, task)
        losses.append(float(l))
    assert losses[-1] < losses[0] - 0.2, losses[::10]


def test_gridded_prediction_matches_offgrid(setup):
    """Decoding on a grid must equal off-grid decoding at the grid nodes."""
    model, params, tl, times, cfg = setup
    task = tl(list(times[:1]))
    xt1 = np.linspace(0.2, 0.8, 8).astype(np.float32)
    xt2 = np.linspace(0.2, 0.8, 8).astype(np.float32)
    aux_dim = task.yt_aux.shape[-1]
    aux_grid = jnp.zeros((1, 8, 8, aux_dim))
    raw_grid = model.apply(params, task, target_grid=(jnp.asarray(xt1), jnp.asarray(xt2), aux_grid))
    assert raw_grid.shape == (1, 8, 8, 2)
    pts = np.stack(np.meshgrid(xt1, xt2, indexing="ij"), -1).reshape(1, -1, 2)
    task_pts = task.replace(
        xt=jnp.asarray(pts), yt_aux=jnp.zeros((1, 64, aux_dim)),
        yt_mask=jnp.ones((1, 64)),
    )
    raw_pts = model.apply(params, task_pts)
    # the two decode paths contract in different orders; TPU's bf16-pass
    # matmuls round them apart more than CPU f32 does
    rtol, atol = (5e-3, 1e-4) if jax.default_backend() == "cpu" else (5e-2, 1e-2)
    np.testing.assert_allclose(
        np.asarray(raw_grid).reshape(1, -1, 2), np.asarray(raw_pts),
        rtol=rtol, atol=atol,
    )


def test_all_likelihood_heads_run(setup):
    model, params, tl, times, _ = setup
    task = tl(list(times[:1]))
    for lik in ["cnp", "gnp", "bernoulli-gamma", "cnp-spikes-beta"]:
        cfg = ConvNPConfig(
            unet_channels=(8, 8), likelihood=lik, internal_density=32,
            decoder_channels=8, mlp_hidden=8, rank=4, compute_dtype="float32",
        )
        m = ConvNP(cfg)
        p = m.init(jax.random.key(1), task)
        y = task.yt
        if lik == "bernoulli-gamma":
            y = jnp.abs(y)
        elif lik == "cnp-spikes-beta":
            y = jax.nn.sigmoid(y)
        t = task.replace(yt=y)
        loss = float(m.loss(p, t))
        assert np.isfinite(loss), lik


def test_sigmoid_output_bounds(setup):
    model, params, tl, times, _ = setup
    task = tl(list(times[:1]))
    cfg = ConvNPConfig(
        unet_channels=(8, 8), likelihood="cnp", internal_density=32,
        decoder_channels=8, mlp_hidden=8, compute_dtype="float32",
        sigmoid_output=True,
    )
    m = ConvNP(cfg)
    p = m.init(jax.random.key(2), task)
    raw = m.apply(p, task)
    mu = np.asarray(raw[..., 0])
    assert (mu >= 0).all() and (mu <= 1).all()


def test_lengthscale_floor(setup):
    """Driving the raw lengthscale param to -inf must not produce NaN
    (softplus→0 made the RBF exponent 0·inf at coincident coordinates)."""
    import jax.numpy as jnp

    model, params, tl, times, cfg = setup
    task = tl(list(times[:1]))
    bad = jax.tree_util.tree_map(lambda x: x, params)
    p = dict(bad["params"])
    for k in list(p):
        if k.startswith("ls_"):
            p[k] = jnp.asarray(-1e9, jnp.float32)
    bad = {"params": p}
    loss = float(model.loss(bad, task))
    assert np.isfinite(loss)


def test_init_lengthscale_override(setup):
    """``init_lengthscale`` pins the EFFECTIVE SetConv length-scale at init
    (softplus(raw)+floor == requested value exactly), decoupling the
    smoothing scale from ``internal_density``. Measured motivation: flagship
    length-scales never move from their effective init (round-3 density
    mechanism study), so the init IS the model's smoothing scale."""
    import dataclasses

    model, params, tl, times, cfg = setup
    target = 0.0911
    cfg2 = dataclasses.replace(cfg, init_lengthscale=target)
    model2 = ConvNP(cfg2)
    task = tl(list(times[:1]))
    params2 = model2.init(jax.random.key(0), task)
    floor = 0.5 / cfg.internal_density
    for k, v in params2["params"].items():
        if k.startswith("ls_"):
            eff = float(jax.nn.softplus(v) + floor)
            assert abs(eff - target) < 1e-6, (k, eff)
    # default (None) keeps the shipped behaviour: 2/density + floor
    for k, v in params["params"].items():
        if k.startswith("ls_"):
            eff = float(jax.nn.softplus(v) + floor)
            assert abs(eff - (2.0 / cfg.internal_density + floor)) < 1e-6
    # below the resolution floor must refuse loudly
    with pytest.raises(ValueError):
        ConvNP(dataclasses.replace(cfg, init_lengthscale=floor / 2)).init(
            jax.random.key(0), task
        )
    # PER-SCALE form: a dict (normalised to a hashable tuple) pins the
    # named scales, unlisted ones keep the uniform default — the learned
    # optimum is per-scale (selftune_cpu_scale.json: decoder 2.6× sharper,
    # aux grid wider), which a uniform value cannot express
    per = {"ls_decoder": 0.0402, "ls_grid_0": 0.0733}
    cfg3 = dataclasses.replace(cfg, init_lengthscale=per)
    assert isinstance(cfg3.init_lengthscale, tuple)
    hash(cfg3)  # must stay usable as a flax module attribute
    params3 = ConvNP(cfg3).init(jax.random.key(0), task)
    for k, v in params3["params"].items():
        if k.startswith("ls_"):
            eff = float(jax.nn.softplus(v) + floor)
            want = per.get(k, 2.0 / cfg.internal_density + floor)
            assert abs(eff - want) < 1e-6, (k, eff, want)
    # a named scale below the floor refuses with the scale's name
    with pytest.raises(ValueError, match="ls_decoder"):
        ConvNP(dataclasses.replace(
            cfg, init_lengthscale={"ls_decoder": floor / 2})
        ).init(jax.random.key(0), task)
    # an unknown scale name refuses at CONFIG construction (a silently
    # ignored typo would train a different model than the YAML claims)
    with pytest.raises(ValueError, match="ls_decocer"):
        dataclasses.replace(cfg, init_lengthscale={"ls_decocer": 0.02})


def test_gnp_mean_anchor_default_on():
    """The reference's DEFAULT likelihood (gnp, config.py:2685-2689) must be
    good out of the box: the mean anchor that fixes joint-NLL/RMSE
    decoupling defaults ON for gnp and OFF for per-point heads."""
    from deepsensornz_tpu.models.convnp import ConvNPConfig

    assert ConvNPConfig(likelihood="gnp").anchor_weight() == 1.0
    assert ConvNPConfig(likelihood="cnp").anchor_weight() == 0.0
    assert ConvNPConfig(likelihood="bernoulli-gamma").anchor_weight() == 0.0
    # explicit values still win
    assert ConvNPConfig(likelihood="gnp", mean_anchor=0.0).anchor_weight() == 0.0
    assert ConvNPConfig(likelihood="cnp", mean_anchor=0.5).anchor_weight() == 0.5


def test_top_kernel_overrides_level0_only():
    """top_kernel shrinks only the full-res level's taps; deeper levels and
    the bottleneck keep kernel_size (docs/perf_unet.md variant)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from deepsensornz_tpu.models.unet import UNet

    x = jnp.zeros((1, 32, 32, 5))
    m = UNet(channels=(8, 8), out_channels=4, kernel_size=5,
             compute_dtype=jnp.float32, top_kernel=3)
    p = m.init(jax.random.key(0), x)["params"]
    assert p["down_0"]["kernel"].shape[:2] == (3, 3)
    assert p["up_0"]["kernel"].shape[:2] == (3, 3)
    assert p["up_mix_0"]["kernel"].shape[:2] == (3, 3)
    assert p["down_1"]["kernel"].shape[:2] == (5, 5)
    assert p["up_mix_1"]["kernel"].shape[:2] == (5, 5)
    assert p["bottleneck"]["kernel"].shape[:2] == (5, 5)
    out = m.apply({"params": p}, x)
    assert out.shape == (1, 32, 32, 4)
    assert bool(np.isfinite(np.asarray(out)).all())


def test_subpixel_upsample_exactly_matches_transpose():
    """The subpixel up-path is the SAME model as ConvTranspose: identical
    parameter tree, f32 outputs equal to rounding, so checkpoints trained
    with either lowering load into the other."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from deepsensornz_tpu.models.unet import UNet

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 7)).astype(np.float32))
    for k in (3, 5):
        a = UNet(channels=(8, 8), out_channels=8, kernel_size=k,
                 compute_dtype=jnp.float32, upsample="transpose")
        b = UNet(channels=(8, 8), out_channels=8, kernel_size=k,
                 compute_dtype=jnp.float32, upsample="subpixel")
        pa = a.init(jax.random.key(0), x)
        pb = b.init(jax.random.key(1), x)
        # identical parameter trees (names AND shapes)
        sa = jax.tree.map(lambda v: v.shape, pa)
        sb = jax.tree.map(lambda v: v.shape, pb)
        assert sa == sb
        # same params -> same outputs (checkpoint interchange both ways)
        np.testing.assert_allclose(
            np.asarray(a.apply(pa, x)), np.asarray(b.apply(pa, x)),
            atol=2e-6, rtol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(b.apply(pb, x)), np.asarray(a.apply(pb, x)),
            atol=2e-6, rtol=1e-5,
        )


def test_s2d_downsample_exactly_matches_strided():
    """The space-to-depth down-path is the SAME model as the strided conv:
    identical parameter tree, f32 outputs equal to rounding — checkpoints
    trained with either lowering load into the other (the down-path mirror
    of the subpixel test above)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from deepsensornz_tpu.models.unet import UNet

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 7)).astype(np.float32))
    for k in (3, 5):
        a = UNet(channels=(8, 8), out_channels=8, kernel_size=k,
                 compute_dtype=jnp.float32, downsample="strided")
        b = UNet(channels=(8, 8), out_channels=8, kernel_size=k,
                 compute_dtype=jnp.float32, downsample="s2d")
        pa = a.init(jax.random.key(0), x)
        pb = b.init(jax.random.key(1), x)
        sa = jax.tree.map(lambda v: v.shape, pa)
        sb = jax.tree.map(lambda v: v.shape, pb)
        assert sa == sb
        np.testing.assert_allclose(
            np.asarray(a.apply(pa, x)), np.asarray(b.apply(pa, x)),
            atol=2e-6, rtol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(b.apply(pb, x)), np.asarray(a.apply(pb, x)),
            atol=2e-6, rtol=1e-5,
        )


def test_lane_pack_exactly_matches_default():
    """The width-packed lane lowering (lane_pack=True mix/bottleneck convs,
    downsample="packw") is the SAME model as the default: identical
    parameter tree, f32 outputs equal to rounding — checkpoints trained with
    either lowering load into the other. Also checks the guards: k=3 mixes
    and odd widths fall back to nn.Conv with the same names."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from deepsensornz_tpu.models.unet import UNet

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 32, 48, 7)).astype(np.float32))
    for k in (3, 5):
        a = UNet(channels=(8, 8), out_channels=8, kernel_size=k,
                 compute_dtype=jnp.float32)
        b = UNet(channels=(8, 8), out_channels=8, kernel_size=k,
                 compute_dtype=jnp.float32, lane_pack=True,
                 downsample="packw")
        pa = a.init(jax.random.key(0), x)
        pb = b.init(jax.random.key(1), x)
        sa = jax.tree.map(lambda v: v.shape, pa)
        sb = jax.tree.map(lambda v: v.shape, pb)
        assert sa == sb
        np.testing.assert_allclose(
            np.asarray(a.apply(pa, x)), np.asarray(b.apply(pa, x)),
            atol=2e-6, rtol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(b.apply(pb, x)), np.asarray(a.apply(pb, x)),
            atol=2e-6, rtol=1e-5,
        )


def test_hoisted_head_matches_unhoisted_grid_path():
    """hoist_head applies the first head layer on the internal grid
    (decode(f)@W ≡ decode(f@W)); outputs must match the unhoisted gridded
    path to f32 rounding, for models with and without aux channels and for
    mlp_layers ∈ {0, 1, 2}. Param trees identical (checkpoint compat)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from deepsensornz_tpu.models.convnp import ConvNP, ConvNPConfig
    from tests.test_convnp import _tiny_task  # self-import for clarity

    task = _tiny_task()
    # target grid LARGER than the internal grid so the hoist engages
    xt1 = jnp.linspace(0.05, 0.95, 48)
    xt2 = jnp.linspace(0.05, 0.95, 40)
    rng = np.random.default_rng(0)
    for mlp_layers, with_aux in [(1, True), (1, False), (0, True), (2, True)]:
        # mlp_hidden < decoder_channels so the measured hoist gate engages
        # (the hoist only pays when the first layer NARROWS the decode)
        cfg = ConvNPConfig(
            unet_channels=(8, 8), likelihood="cnp", internal_density=16,
            decoder_channels=8, mlp_hidden=4, mlp_layers=mlp_layers,
            compute_dtype="float32", hoist_head=True,
        )
        t = task if with_aux else task.replace(yt_aux=None)
        aux_g = (
            jnp.asarray(rng.normal(size=(t.batch_size, 48, 40, 1)), jnp.float32)
            if with_aux else None
        )
        model = ConvNP(cfg)
        params = model.init(jax.random.key(0), t)
        out_h = model.apply(params, t, target_grid=(xt1, xt2, aux_g))
        model_u = ConvNP(dataclasses.replace(cfg, hoist_head=False))
        out_u = model_u.apply(params, t, target_grid=(xt1, xt2, aux_g))
        np.testing.assert_allclose(np.asarray(out_h), np.asarray(out_u),
                                   atol=2e-5, rtol=1e-5)
        # point path unaffected by the flag
        np.testing.assert_allclose(
            np.asarray(model.apply(params, t)),
            np.asarray(model_u.apply(params, t)), atol=0, rtol=0)


def _tiny_task(B=2, n_grid=12, n_pts=6, seed=0):
    import jax.numpy as jnp
    import numpy as np

    from deepsensornz_tpu.task.task import GridContext, PointContext, TaskBatch

    rng = np.random.default_rng(seed)
    gx1 = jnp.linspace(0, 1, n_grid)
    gx2 = jnp.linspace(0, 1, n_grid)
    x1g = jnp.linspace(0, 1, 16)
    x2g = jnp.linspace(0, 1, 16)
    return TaskBatch(
        grids=(GridContext(
            x1=gx1, x2=gx2,
            y=jnp.asarray(rng.normal(size=(B, n_grid, n_grid, 2)), jnp.float32)),),
        points=(PointContext(
            x=jnp.asarray(rng.random((B, n_pts, 2)), jnp.float32),
            y=jnp.asarray(rng.normal(size=(B, n_pts, 1)), jnp.float32),
            mask=jnp.ones((B, n_pts), jnp.float32)),),
        xt=jnp.asarray(rng.random((B, 5, 2)), jnp.float32),
        yt=jnp.asarray(rng.normal(size=(B, 5, 1)), jnp.float32),
        yt_mask=jnp.ones((B, 5), jnp.float32),
        yt_aux=jnp.asarray(rng.normal(size=(B, 5, 1)), jnp.float32),
        x1g=x1g, x2g=x2g,
    )


def test_packed_domain_unet_exactly_matches_default():
    """lane_pack='domain' (pack once, every level op packed, unpack once) is
    the SAME model as the default graph: identical parameter tree, f32
    outputs equal to rounding, both init directions, k ∈ {3, 5}."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from deepsensornz_tpu.models.unet import UNet

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 32, 64, 7)).astype(np.float32))
    for k, top in ((3, None), (5, None), (5, 3)):
        a = UNet(channels=(8, 8, 8), out_channels=8, kernel_size=k,
                 top_kernel=top, compute_dtype=jnp.float32)
        b = UNet(channels=(8, 8, 8), out_channels=8, kernel_size=k,
                 top_kernel=top, compute_dtype=jnp.float32,
                 lane_pack="domain")
        pa = a.init(jax.random.key(0), x)
        pb = b.init(jax.random.key(1), x)
        assert jax.tree.map(lambda v: v.shape, pa) == \
            jax.tree.map(lambda v: v.shape, pb)
        np.testing.assert_allclose(
            np.asarray(a.apply(pa, x)), np.asarray(b.apply(pa, x)),
            atol=2e-5, rtol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(b.apply(pb, x)), np.asarray(a.apply(pb, x)),
            atol=2e-5, rtol=1e-5,
        )


def test_packw_convT_exact():
    """_packw_convT_packed == nn.ConvTranspose(stride 2, SAME) bit-closely
    in f32 across kernel sizes and channel counts."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import linen as nn

    from deepsensornz_tpu.models.unet import _packw_convT_packed

    rng = np.random.default_rng(5)
    for (B, H, W, Cin, Cout, k) in [
        (2, 8, 12, 5, 7, 5), (1, 6, 10, 3, 4, 3), (2, 8, 8, 64, 64, 5),
    ]:
        x = jnp.asarray(rng.normal(size=(B, H, W, Cin)).astype(np.float32))
        mod = nn.ConvTranspose(Cout, (k, k), strides=(2, 2), padding="SAME")
        params = mod.init(jax.random.key(0), x)
        ref = mod.apply(params, x)
        kern = params["params"]["kernel"]
        bias = params["params"]["bias"]
        u = x.reshape(B, H, W // 2, 2 * Cin)
        got = _packw_convT_packed(u, kern, bias)
        got = got.reshape(B, 2 * H, 2 * W, Cout)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-4, rtol=1e-5)


def test_packw_conv_primitives_exact():
    """_packw_mix / _packw_down match lax SAME convs bit-closely in f32
    across kernel sizes and channel counts (incl. the flagship 128->64 k5
    mix shape at reduced spatial size)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from deepsensornz_tpu.models.unet import _packw_down, _packw_mix

    rng = np.random.default_rng(1)
    for (B, H, W, Cin, Cout, k) in [
        (2, 16, 24, 5, 7, 5), (1, 8, 12, 3, 4, 3), (2, 12, 16, 128, 64, 5),
    ]:
        x = jnp.asarray(rng.normal(size=(B, H, W, Cin)).astype(np.float32))
        kern = jnp.asarray(rng.normal(size=(k, k, Cin, Cout)).astype(np.float32))
        bias = jnp.asarray(rng.normal(size=(Cout,)).astype(np.float32))
        ref1 = jax.lax.conv_general_dilated(
            x, kern, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
        np.testing.assert_allclose(np.asarray(_packw_mix(x, kern, bias)),
                                   np.asarray(ref1), atol=1e-4, rtol=1e-5)
        ref2 = jax.lax.conv_general_dilated(
            x, kern, (2, 2), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
        for po in (True, False):
            np.testing.assert_allclose(
                np.asarray(_packw_down(x, kern, bias, pack_out=po)),
                np.asarray(ref2), atol=1e-4, rtol=1e-5)


def test_remat_policies_numerically_exact():
    """remat_policy is a perf knob only: loss AND grads identical (to float
    tolerance) across no-remat / full remat / 'dots' / 'acts' policies, in
    both the packed and unpacked lane domains."""
    task = _tiny_task()
    ref_loss = ref_grads = None
    for lane in (False, "domain"):
        for remat, policy in ((False, None), (True, None), (True, "dots"),
                              (True, "acts")):
            cfg = ConvNPConfig(
                unet_channels=(8, 8), likelihood="cnp", internal_density=16,
                compute_dtype="float32", lane_pack=lane, hoist_head=False,
                remat=remat, remat_policy=policy,
            )
            model = ConvNP(cfg)
            params = model.init(jax.random.key(0), task)
            loss, grads = jax.value_and_grad(
                lambda p: model.loss(p, task))(params)
            if ref_loss is None:
                ref_loss, ref_grads = loss, grads
            else:
                np.testing.assert_allclose(float(loss), float(ref_loss),
                                           rtol=1e-5)
                jax.tree.map(
                    lambda a, b: np.testing.assert_allclose(
                        np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3),
                    grads, ref_grads)


def test_remat_policy_unknown_raises():
    task = _tiny_task()
    cfg = ConvNPConfig(unet_channels=(8, 8), likelihood="cnp",
                       internal_density=16, compute_dtype="float32",
                       remat=True, remat_policy="bogus")
    model = ConvNP(cfg)
    with pytest.raises(ValueError, match="remat_policy"):
        model.init(jax.random.key(0), task)
