"""Trainer: schedules, NaN protection, checkpointing, freezing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepsensornz_tpu.data.processor import DataProcessor
from deepsensornz_tpu.data.synthetic import synthetic_bundle
from deepsensornz_tpu.models.convnp import ConvNP, ConvNPConfig
from deepsensornz_tpu.task.batching import concat, take
from deepsensornz_tpu.task.loader import TaskLoader
from deepsensornz_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from deepsensornz_tpu.train.trainer import (
    EarlyStopping,
    PlateauScheduler,
    Trainer,
    freeze_mask,
    init_state,
    make_train_step,
)


@pytest.fixture(scope="module")
def setting():
    base, dem, stations = synthetic_bundle(
        n_times=10, base_hw=(16, 16), dem_hw=(48, 48), n_stations=16
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
    cfg = ConvNPConfig(unet_channels=(8, 8), likelihood="cnp", internal_density=32,
                       decoder_channels=8, mlp_hidden=8, compute_dtype="float32")
    model = ConvNP(cfg)
    tasks = tl(list(times[:8]))
    val = tl(list(times[8:10]))
    return model, tasks, val


def test_plateau_scheduler():
    s = PlateauScheduler(lr=1.0, factor=0.1, patience=2)
    assert s.step(1.0) == 1.0
    assert s.step(0.9) == 1.0
    s.step(0.95)
    s.step(0.95)
    lr = s.step(0.95)  # 3rd bad epoch > patience → drop
    assert lr == pytest.approx(0.1)


def test_early_stopping():
    e = EarlyStopping(patience=2)
    assert not e.step(1.0)
    assert not e.step(1.1)
    assert e.step(1.2)


def test_trainer_fit_and_checkpoint(setting, tmp_path):
    model, tasks, val = setting
    tr = Trainer(model, lr=1e-3)
    out = tr.fit(tasks, val, n_epochs=3, batch_size=4,
                 checkpoint_dir=str(tmp_path / "ckpt"),
                 metadata={"variable": "temperature"}, verbose=False)
    assert len(out["train_losses"]) == 3
    assert np.isfinite(out["best_val"])
    loaded = load_checkpoint(str(tmp_path / "ckpt"), out["params"])
    chex_equal = jax.tree.map(
        lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
        loaded["params"], out["params"],
    )
    assert all(jax.tree.leaves(chex_equal))
    assert loaded["metadata"]["variable"] == "temperature"
    assert "val_losses" in loaded["metadata"]


def test_nan_loss_does_not_poison_params(setting):
    model, tasks, val = setting
    state = init_state(model, jax.random.key(0), take(tasks, np.arange(2)))
    step = make_train_step(model)
    poisoned = take(tasks, np.arange(2))
    poisoned = poisoned.replace(yt=poisoned.yt.at[...].set(jnp.nan))
    state2, loss = step(state, poisoned, 1e-3)
    assert np.isnan(float(loss))
    finite = jax.tree.map(lambda p: np.isfinite(np.asarray(p)).all(), state2.params)
    assert all(jax.tree.leaves(finite))


def test_nonfinite_step_is_true_noop(setting):
    """A non-finite step must not move params AT ALL (Adam moments + weight
    decay produce nonzero updates even from zeroed grads) and must roll back
    the optimizer state including the int step count."""
    model, tasks, val = setting
    state = init_state(model, jax.random.key(0), take(tasks, np.arange(2)),
                       weight_decay=1e-2)
    step = make_train_step(model, weight_decay=1e-2, donate=False)
    # one good step first so Adam moments are nonzero
    state, _ = step(state, take(tasks, np.arange(2)), 1e-3)
    poisoned = take(tasks, np.arange(2))
    poisoned = poisoned.replace(yt=poisoned.yt.at[...].set(jnp.nan))
    state2, loss = step(state, poisoned, 1e-3)
    assert np.isnan(float(loss))
    same = jax.tree.map(
        lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
        state2.params, state.params,
    )
    assert all(jax.tree.leaves(same)), "params moved on a skipped step"
    same_opt = jax.tree.map(
        lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
        state2.opt_state, state.opt_state,
    )
    assert all(jax.tree.leaves(same_opt)), "opt state (incl. count) not rolled back"


def test_tail_partial_batch_is_trained(setting):
    """Every task is stepped on each epoch: with 8 tasks and batch_size 5 the
    3-task tail is padded (masked) rather than dropped, and the padded batch
    loss equals the unpadded 3-task loss exactly."""
    from deepsensornz_tpu.train.trainer import train_epoch

    model, tasks, val = setting
    state = init_state(model, jax.random.key(0), take(tasks, np.arange(5)))
    step = make_train_step(model, donate=False)
    state2, losses = train_epoch(model, state, tasks, batch_size=5, lr=0.0,
                                 shuffle=False, step_fn=step)
    assert len(losses) == 2  # ceil(8/5) batches, tail included
    # padded-batch loss (lr=0 → params unchanged between batches) must match
    # evaluating the raw 3-task tail directly: padding contributes nothing
    from deepsensornz_tpu.parallel.mesh import pad_batch_to_multiple

    tail = take(tasks, np.arange(5, 8))
    tail_loss = float(model.loss(state.params, pad_batch_to_multiple(tail, 5)[0]))
    raw_tail_loss = float(model.loss(state.params, tail))
    assert tail_loss == pytest.approx(raw_tail_loss, rel=1e-6)
    assert losses[1] == pytest.approx(raw_tail_loss, rel=1e-6)


def test_freeze_mask_and_frozen_training(setting):
    model, tasks, val = setting
    state = init_state(model, jax.random.key(0), take(tasks, np.arange(2)))
    mask = freeze_mask(state.params, ("unet", "ls_grid", "ls_points"))
    leaves_with_path = jax.tree_util.tree_flatten_with_path(mask)[0]
    frozen = [v for p, v in leaves_with_path if "unet" in jax.tree_util.keystr(p)]
    free = [v for p, v in leaves_with_path if "head_out" in jax.tree_util.keystr(p)]
    assert frozen and all(frozen)
    assert free and not any(free)

    step = make_train_step(model, frozen_patterns=("unet", "ls_grid", "ls_points"),
                           donate=False)
    batch = take(tasks, np.arange(2))
    state2, _ = step(state, batch, 1e-2)
    before = state.params["params"]["unet"]["down_0"]["kernel"]
    after = state2.params["params"]["unet"]["down_0"]["kernel"]
    np.testing.assert_array_equal(np.asarray(before), np.asarray(after))
    h_before = state.params["params"]["head_out"]["kernel"]
    h_after = state2.params["params"]["head_out"]["kernel"]
    assert not np.array_equal(np.asarray(h_before), np.asarray(h_after))


def test_lengthscale_lr_mult_scales_only_ls_updates(setting):
    """``lengthscale_lr_mult`` multiplies the post-Adam UPDATE on the
    SetConv length-scale params exactly, and leaves every other param's
    first-step update bit-identical. Motivation: measured flagship
    checkpoints end with length-scales EXACTLY at init (Adam's lr×steps
    budget is too small on their scale), so without this the smoothing
    scale is silently init-determined."""
    model, tasks, val = setting
    state = init_state(model, jax.random.key(0), take(tasks, np.arange(2)))
    batch = take(tasks, np.arange(2))
    step1 = make_train_step(model, donate=False)
    step100 = make_train_step(model, donate=False, lengthscale_lr_mult=100.0)
    s1, _ = step1(state, batch, 1e-4)
    s100, _ = step100(state, batch, 1e-4)
    p0, p1, p100 = (state.params["params"], s1.params["params"],
                    s100.params["params"])
    for k in p0:
        if k.startswith("ls_"):
            d1 = np.asarray(p1[k]) - np.asarray(p0[k])
            d100 = np.asarray(p100[k]) - np.asarray(p0[k])
            assert abs(d1) > 0
            # Both deltas are recovered as f32 (p + u) - p, so each carries
            # up to one ulp(p) of rounding; after the ×100 the d1-side ulp
            # dominates (~1e-3 relative when |p|≈3, u≈1e-4).
            ulp = np.finfo(np.float32).eps * np.maximum(
                1.0, np.abs(np.asarray(p0[k]))).max()
            np.testing.assert_allclose(
                d100, 100.0 * d1, rtol=1e-4, atol=202.0 * ulp)
    np.testing.assert_array_equal(
        np.asarray(p1["head_out"]["kernel"]),
        np.asarray(p100["head_out"]["kernel"]),
    )


def test_lengthscale_lr_mult_does_not_amplify_weight_decay(setting):
    """The multiplier amplifies only the ADAM step on the ls params — not
    the decoupled weight-decay pull. With zero gradients the update is pure
    decay (-wd*lr*p); under mult=100 the ls params must decay at the SAME
    rate as every other param (amplifying the pull 100× would drag the
    length-scales toward softplus(0)+floor regardless of the data, a regime
    the self-tuning study — run at weight_decay=0 — never measured)."""
    model, tasks, _ = setting
    batch = take(tasks, np.arange(2))
    wd, lr = 0.1, 1e-2
    state = init_state(model, jax.random.key(0), batch, weight_decay=wd)

    class _ZeroLoss:
        @staticmethod
        def loss(params, task, anchor_scale=1.0):
            return jax.tree_util.tree_reduce(
                lambda a, x: a + 0.0 * jnp.sum(x), params, jnp.float32(0.0))

    step = make_train_step(_ZeroLoss(), donate=False, weight_decay=wd,
                           lengthscale_lr_mult=100.0)
    s2, _ = step(state, batch, lr)
    p0, p2 = state.params["params"], s2.params["params"]
    checked = 0
    for k in p0:
        if k.startswith("ls_"):
            d = np.asarray(p2[k]) - np.asarray(p0[k])
            np.testing.assert_allclose(
                d, -wd * lr * np.asarray(p0[k]), rtol=1e-3, atol=5e-7)
            checked += 1
    assert checked > 0
    # a non-ls param decays at exactly the same rate
    k0 = np.asarray(p0["head_out"]["kernel"])
    k2 = np.asarray(p2["head_out"]["kernel"])
    np.testing.assert_allclose(k2 - k0, -wd * lr * k0, rtol=1e-3, atol=5e-7)


def test_lengthscale_lr_mult_learns_over_fit(setting):
    """End-to-end over a full ``Trainer.fit``: at the parity default
    (mult=1) the effective SetConv length-scales stay at init — the
    init-determined regime measured in every flagship checkpoint — while
    mult=100 moves them materially. The single-step scaling test above
    covers the update math; this covers the practical claim that the knob
    turns the smoothing scale into a LEARNED quantity."""
    model, tasks, val = setting
    dens = model.cfg.internal_density
    init_eff = 2.0 / dens + 0.5 / dens  # default_lengthscale + floor

    def effective_ls(params):
        inner = params.get("params", params)
        return {
            k: float(jax.nn.softplus(jnp.asarray(v)) + 0.5 / dens)
            for k, v in inner.items() if k.startswith("ls_")
        }

    moves = {}
    for mult in (1.0, 100.0):
        tr = Trainer(model, lr=1e-3, lengthscale_lr_mult=mult)
        out = tr.fit(tasks, val, n_epochs=6, batch_size=4, verbose=False)
        ls = effective_ls(out["params"])
        assert len(ls) == 3  # ls_grid_0, ls_points_0, ls_decoder
        moves[mult] = max(abs(v - init_eff) / init_eff for v in ls.values())
    # parity: init-determined — measured 0.76% max drift over this fit
    # (and the fixture lr is 20× the flagship's, so the flagship drifts
    # far less: every hardware checkpoint sits at init to 4 decimals)
    assert moves[1.0] < 2e-2
    # mult=100: genuinely learned — measured 44% movement on ls_decoder
    assert moves[100.0] > 1e-1
    assert moves[100.0] > 10 * moves[1.0]


def test_take_and_concat_roundtrip(setting):
    model, tasks, val = setting
    a = take(tasks, np.arange(3))
    b = take(tasks, np.arange(3, 6))
    c = concat([a, b])
    np.testing.assert_array_equal(np.asarray(c.xt), np.asarray(take(tasks, np.arange(6)).xt))
    np.testing.assert_array_equal(np.asarray(c.grids[0].y), np.asarray(take(tasks, np.arange(6)).grids[0].y))


def test_resume_from_checkpoint(setting, tmp_path):
    """Resume restores optimizer state + loss history and continues epochs."""
    model, tasks, val = setting
    tr = Trainer(model, lr=1e-3)
    ckpt = str(tmp_path / "resume_ckpt")
    out1 = tr.fit(tasks, val, n_epochs=2, batch_size=4,
                  checkpoint_dir=ckpt, verbose=False)
    tr2 = Trainer(model, lr=1e-3)
    out2 = tr2.fit(tasks, val, n_epochs=4, batch_size=4,
                   checkpoint_dir=None, resume_from=ckpt, verbose=False)
    # history continues from the saved run (2 old + 2 new epochs)
    assert len(out2["train_losses"]) == 4
    assert out2["train_losses"][:2] == out1["train_losses"][:2]
    assert np.isfinite(out2["best_val"])


def test_donated_step_does_not_delete_caller_params(setting):
    """init_state COPIES caller params and fit snapshots best params: the
    donated train step deletes the buffers of every state it consumes, so
    aliases would become deleted arrays (returned-deleted-params bug)."""
    model, tasks, val = setting
    task0 = take(tasks, [0, 1])
    params0 = model.init(jax.random.key(0), task0)
    state = init_state(model, jax.random.key(0), task0, params=params0)
    step = make_train_step(model)  # donate=True
    state, _ = step(state, task0, 1e-3)
    # the caller's own tree must survive the donation
    for leaf in jax.tree.leaves(params0):
        np.asarray(leaf)

    # fit's returned best params must be live arrays even when training
    # continues past the best epoch (high LR forces val to bounce)
    tr = Trainer(model, lr=0.3)
    result = tr.fit(tasks, val, n_epochs=4, batch_size=4, verbose=False)
    for leaf in jax.tree.leaves(result["params"]):
        np.asarray(leaf)  # raises RuntimeError("deleted") on the old bug


def test_resume_restores_schedule_state(setting, tmp_path):
    """Checkpoints carry plateau-LR and early-stop state; a resumed run
    continues at the decayed LR instead of the initial one."""
    model, tasks, val = setting
    s = PlateauScheduler(lr=1e-3, factor=0.1, patience=0)
    s.step(1.0); s.step(2.0); s.step(2.0)   # two bad epochs → two decays
    d = s.state_dict()
    s2 = PlateauScheduler(lr=1e-3, factor=0.1, patience=0)
    s2.load_state_dict(d)
    assert s2.lr == pytest.approx(s.lr) and s.lr < 1e-3

    ck = str(tmp_path / "ck")
    tr = Trainer(model, lr=1e-3)
    tr.fit(tasks, val, n_epochs=2, batch_size=4, verbose=False,
           checkpoint_dir=ck)
    meta = load_checkpoint(ck, None, None)["metadata"]
    assert "sched" in meta and "stopper" in meta and "lr" in meta["sched"]


def test_resume_is_replay_equivalent(setting, tmp_path):
    """A 2+2-with-resume run reproduces the uninterrupted 4-epoch run
    exactly: per-epoch shuffle seeds + post-step schedule state in the
    checkpoint make resume a deterministic replay."""
    model, tasks, val = setting
    full = Trainer(model, lr=1e-3).fit(
        tasks, val, n_epochs=4, batch_size=4, verbose=False)

    ck = str(tmp_path / "replay_ckpt")
    Trainer(model, lr=1e-3).fit(
        tasks, val, n_epochs=2, batch_size=4, checkpoint_dir=ck,
        verbose=False)
    resumed = Trainer(model, lr=1e-3).fit(
        tasks, val, n_epochs=4, batch_size=4, resume_from=ck, verbose=False)

    assert len(resumed["train_losses"]) == 4
    np.testing.assert_allclose(
        resumed["train_losses"], full["train_losses"], rtol=1e-6)
    np.testing.assert_allclose(
        resumed["val_losses"], full["val_losses"], rtol=1e-6)
