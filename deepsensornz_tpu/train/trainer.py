"""Training loop: jitted AdamW step, plateau LR, early stopping, NaN masking.

Recipe parity with the reference training loop (``nzdownscale/downscaler/
train.py:336-434``): AdamW (lr 5e-5 default), ReduceLROnPlateau(factor 0.1,
patience 5), early stopping (patience 10), NaN-loss filtering
(``train.py:371,395``), best-validation checkpointing + metadata
(``train.py:409-417``), optional encoder freezing for fine-tunes
(``train.py:243-258``).

TPU-native mechanics:

- one compiled train step serves every batch (static shapes via padded
  TaskBatches) — no shape-bucketed re-tracing,
- the learning rate is a traced argument, so plateau LR changes never
  trigger recompilation,
- NaN protection is in-graph (``jnp.where`` on loss/grads), not host-side
  filtering,
- data parallelism: pass a mesh and the step is jitted with the TaskBatch
  batch-sharded over the ``data`` axis; XLA inserts the psum gradient
  reduction over ICI.
"""

from __future__ import annotations

import functools as _functools
import re
import time
from typing import Callable, Optional, Sequence

import flax.struct as struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from deepsensornz_tpu.parallel.mesh import pad_batch_to_multiple
from deepsensornz_tpu.task.batching import take
from deepsensornz_tpu.task.task import TaskBatch


def _batches(idx: np.ndarray, batch_size: int):
    """Yield index slices covering ALL of ``idx``; the tail partial batch is
    included (the reference trains every task — ``train.py:388-394``). The
    caller pads it to full size with masked tasks so one compiled program
    serves every batch."""
    for s in range(0, len(idx), batch_size):
        yield idx[s: s + batch_size]


def _take_padded(tasks: TaskBatch, sel: np.ndarray, batch_size: int) -> TaskBatch:
    batch = take(tasks, sel)
    if len(sel) < batch_size:
        batch, _ = pad_batch_to_multiple(batch, batch_size)
    return batch


@struct.dataclass
class TrainState:
    params: dict
    opt_state: tuple
    step: jnp.ndarray


def _adamw_core(weight_decay: float) -> optax.GradientTransformation:
    """Adam moments + decoupled weight decay; LR applied separately so it
    can be a traced runtime value."""
    return optax.chain(
        optax.clip_by_global_norm(10.0),
        optax.scale_by_adam(),
        optax.add_decayed_weights(weight_decay),
        optax.scale(-1.0),
    )


def freeze_mask(params, patterns: Sequence[str]):
    """True where the parameter path matches any regex → update zeroed.

    Used for fine-tune encoder freezing (reference freezes the encoder
    unless training surface_pressure, ``train.py:243-258``). Our encoder =
    SetConv length-scales + U-Net, matched with e.g.
    ``("ls_grid", "ls_points", "unet")``.
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    compiled = [re.compile(p) for p in patterns]

    def frozen(path) -> bool:
        s = "/".join(str(getattr(k, "key", k)) for k in path)
        return any(c.search(s) for c in compiled)

    frozen_paths = {jax.tree_util.keystr(path) for path, _ in flat if frozen(path)}

    def mask_leaf(path, _):
        return jax.tree_util.keystr(path) in frozen_paths

    return jax.tree_util.tree_map_with_path(mask_leaf, params)


def make_train_step(
    model,
    weight_decay: float = 0.0,
    frozen_patterns: Sequence[str] = (),
    donate: bool = True,
    lengthscale_lr_mult: float = 1.0,
) -> Callable:
    """Build the jitted (state, task, lr) → (state, loss) step.

    ``lengthscale_lr_mult`` scales the ADAM STEP (post-Adam, so gradient
    magnitude is irrelevant) on the SetConv length-scale params; the
    decoupled weight-decay pull is NOT amplified (and at mult=0 it still
    applies — use ``frozen_patterns`` for a true freeze). Measured
    motivation (round 3 density-mechanism study): at the flagship recipe,
    Adam's lr×steps budget moves the raw length-scales by ≲0.02 — they end
    EXACTLY at init, so the model's physical smoothing scale was silently
    init-determined. A multiplier of ~100 gives them a usable step size
    without touching the rest of the net."""
    # lane_pack="auto" means "packed exactly where measured to win" — and
    # the fwd+bwd train step is measured to LOSE with the packed domain
    # (80.4/82.5 vs 83.8/85.9 tasks/s at batch 8/16 on v5e, remat on),
    # while the forward-only serving path wins (cycle 0.1291→0.1251 s). So
    # auto resolves to unpacked HERE and packed in the Predictor.
    # Round-5 decomposition (perf/train_bench.py, remat_policy sweep): most
    # of that packed training loss WAS the backward replaying the lane
    # shuffles under full remat — saving the tagged level activations
    # (remat_policy="acts", now the default) narrows the packed deficit
    # from ~4.5% to ~1.7% (packed 0.106 vs unpacked 0.1041 s/step pipelined,
    # batch 8) — but does not flip the sign: the residual is the forward
    # pack/unpack cost itself, so auto still resolves to unpacked for
    # training. Activation-level packing is exact, so params/losses are
    # bit-identical either way; an EXPLICIT lane_pack="domain"/True is
    # honored unchanged.
    if getattr(getattr(model, "cfg", None), "lane_pack", None) == "auto":
        import dataclasses

        model = type(model)(dataclasses.replace(model.cfg, lane_pack=False))
    opt = _adamw_core(weight_decay)

    def step(state: TrainState, task: TaskBatch, lr,
             anchor_scale=1.0) -> tuple[TrainState, jnp.ndarray]:
        loss, grads = jax.value_and_grad(model.loss)(
            state.params, task, anchor_scale)
        # a step is only applied if BOTH the loss and every gradient are
        # finite — a finite loss with exploding grads (e.g. through a
        # near-singular Cholesky backward) would otherwise poison params.
        # The guard is a lax.cond, NOT jnp.where gating: where-gating keeps
        # the OLD and NEW optimizer states live simultaneously (4×-params
        # of Adam moments at peak), which is what pushed density-1000
        # batch-2 past 16 GB HBM in round 2; with cond only the taken
        # branch's buffers exist and XLA reuses the donated state in place.
        ok = jnp.isfinite(loss) & jnp.isfinite(optax.global_norm(grads))

        def apply_branch(args):
            grads, params, opt_state = args
            updates, new_opt = opt.update(grads, opt_state, params)
            updates = jax.tree.map(lambda u: u * lr, updates)
            if lengthscale_lr_mult != 1.0:
                # opt.update's output on a param p is -(adam_u + wd*p)
                # (decoupled decay is inside the chain); the multiplier
                # must amplify only the ADAM step, not the decay pull —
                # a 30-100x decay on just the ls params would drag them
                # toward softplus(0)+floor regardless of the data. Adding
                # (mult-1)*wd*p*lr back restores the un-amplified decay:
                # mult*(-(a+wd*p)*lr) + (mult-1)*wd*p*lr = -(mult*a+wd*p)*lr.
                ls_mask = freeze_mask(params, (r"/ls_",))
                updates = jax.tree.map(
                    lambda u, m, p: jnp.where(
                        m,
                        u * lengthscale_lr_mult
                        + (lengthscale_lr_mult - 1.0) * weight_decay * p * lr,
                        u),
                    updates, ls_mask, params,
                )
            if frozen_patterns:
                mask = freeze_mask(params, frozen_patterns)
                updates = jax.tree.map(
                    lambda u, m: jnp.where(m, 0.0, u), updates, mask
                )
            return optax.apply_updates(params, updates), new_opt

        def skip_branch(args):
            # bad step: params and the ENTIRE optimizer state (incl. the
            # int step count, so Adam bias correction stays consistent)
            # pass through unchanged
            _, params, opt_state = args
            return params, opt_state

        params, opt_state = jax.lax.cond(
            ok, apply_branch, skip_branch,
            (grads, state.params, state.opt_state),
        )
        new_state = TrainState(params=params, opt_state=opt_state, step=state.step + 1)
        return new_state, jnp.where(ok, loss, jnp.nan)

    return jax.jit(step, donate_argnums=(0,) if donate else ())


@_functools.lru_cache(maxsize=32)
def _default_train_step(model) -> Callable:
    """One jitted default step per (hashable) model: a fresh jit object per
    ``train_epoch`` call would recompile the whole train program every
    epoch (~minutes each through a remote-compile relay)."""
    return make_train_step(model)


def train_epoch(model, state: TrainState, tasks: TaskBatch, batch_size: int = 8,
                lr: float = 5e-5, shuffle: bool = True,
                step_fn: Optional[Callable] = None,
                rng: Optional[np.random.Generator] = None,
                anchor_scale: float = 1.0):
    """One epoch over a materialised TaskBatch; returns (state, losses).

    Engine parity with ``deepsensor.train.train_epoch(model, tasks,
    batch_size=, opt=)`` (call site ``train.py:388-394``): shuffles, steps
    per batch, returns the per-batch loss list.
    """
    step_fn = step_fn or _default_train_step(model)
    rng = rng or np.random.default_rng(0)
    n = tasks.batch_size
    batch_size = min(batch_size, n)  # tiny datasets: one partial batch
    idx = rng.permutation(n) if shuffle else np.arange(n)
    losses = []
    for sel in _batches(idx, batch_size):
        batch = _take_padded(tasks, sel, batch_size)
        state, loss = step_fn(state, batch, lr, anchor_scale)
        losses.append(loss)  # device array: no per-step host sync
    # fetch once at epoch end — steps pipeline on device (matters through
    # remote-device tunnels where every sync costs a round trip)
    return state, [float(l) for l in losses]


def make_eval_step(model) -> Callable:
    """Jitted validation loss (``model.loss_fn(task, normalise=True)``)."""

    def eval_step(params, task: TaskBatch) -> jnp.ndarray:
        return model.loss(params, task)

    return jax.jit(eval_step)


def init_state(model, rng, example_task: TaskBatch, weight_decay: float = 0.0,
               params=None) -> TrainState:
    if params is None:
        params = model.init(rng, example_task)
    else:
        # COPY caller-supplied params: the train step donates its state
        # (donate_argnums), so aliasing the caller's arrays into the state
        # would delete the caller's own buffers on the first step
        params = jax.tree.map(jnp.array, params)
    opt_state = _adamw_core(weight_decay).init(params)
    return TrainState(params=params, opt_state=opt_state, step=jnp.asarray(0))


class PlateauScheduler:
    """Host-side ReduceLROnPlateau (factor 0.1, patience 5 defaults;
    ``train.py:355``)."""

    def __init__(self, lr: float, factor: float = 0.1, patience: int = 5,
                 min_lr: float = 0.0):
        self.lr = float(lr)
        self.factor = factor
        self.patience = patience
        self.min_lr = min_lr
        self.best = np.inf
        self.bad_epochs = 0

    def step(self, val_loss: float) -> float:
        if np.isfinite(val_loss) and val_loss < self.best - 1e-12:
            self.best = val_loss
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.bad_epochs = 0
        return self.lr

    def state_dict(self) -> dict:
        return {"lr": self.lr, "best": float(self.best),
                "bad_epochs": self.bad_epochs}

    def load_state_dict(self, d: dict) -> None:
        self.lr = float(d.get("lr", self.lr))
        self.best = float(d.get("best", self.best))
        self.bad_epochs = int(d.get("bad_epochs", self.bad_epochs))


class EarlyStopping:
    """Stop after ``patience`` epochs without val improvement
    (``train.py:427-429``)."""

    def __init__(self, patience: int = 10):
        self.patience = patience
        self.best = np.inf
        self.bad_epochs = 0

    def step(self, val_loss: float) -> bool:
        if np.isfinite(val_loss) and val_loss < self.best - 1e-12:
            self.best = val_loss
            self.bad_epochs = 0
            return False
        self.bad_epochs += 1
        return self.bad_epochs >= self.patience

    def state_dict(self) -> dict:
        return {"best": float(self.best), "bad_epochs": self.bad_epochs}

    def load_state_dict(self, d: dict) -> None:
        self.best = float(d.get("best", self.best))
        self.bad_epochs = int(d.get("bad_epochs", self.bad_epochs))


class Trainer:
    """High-level loop with best-val checkpointing — ``Train`` parity
    (``train.py:97-117,336-434``)."""

    def __init__(
        self,
        model,
        lr: float = 5e-5,
        weight_decay: float = 0.0,
        frozen_patterns: Sequence[str] = (),
        seed: int = 0,
        lengthscale_lr_mult: float = 1.0,
    ):
        self.model = model
        self.lr0 = lr
        self.weight_decay = weight_decay
        self.train_step = make_train_step(
            model, weight_decay, frozen_patterns,
            lengthscale_lr_mult=lengthscale_lr_mult)
        self.eval_step = make_eval_step(model)
        self.rng = jax.random.key(seed)

    def fit(
        self,
        train_tasks: TaskBatch,
        val_tasks: Optional[TaskBatch] = None,
        n_epochs: int = 30,
        batch_size: int = 8,
        params=None,
        plateau_patience: int = 5,
        plateau_factor: float = 0.1,
        early_stop_patience: int = 10,
        checkpoint_dir: Optional[str] = None,
        metadata: Optional[dict] = None,
        shuffle: bool = True,
        verbose: bool = True,
        resume_from: Optional[str] = None,
        anchor_schedule: Optional[Callable[[int], float]] = None,
    ) -> dict:
        """Train; returns {params, train_losses, val_losses, best_val, ...}.

        ``resume_from``: checkpoint directory to restore params AND
        optimizer state from (mid-run resume — capability the reference
        lacks, SURVEY.md §5.4 'no optimizer-state checkpointing').
        ``anchor_schedule``: epoch → multiplier on the model's mean-anchor
        weight (traced, so no recompilation); e.g. a linear decay to 0 lets
        the final epochs optimise the pure joint NLL.
        """
        from deepsensornz_tpu.train.checkpoint import load_checkpoint, save_checkpoint

        state = init_state(self.model, self.rng, take(train_tasks, np.arange(min(batch_size, train_tasks.batch_size))),
                           self.weight_decay, params=params)
        start_epoch = 0
        prev_train, prev_val = [], []
        sched = PlateauScheduler(self.lr0, plateau_factor, plateau_patience)
        stopper = EarlyStopping(early_stop_patience)
        if resume_from is not None:
            loaded = load_checkpoint(resume_from, state.params, state.opt_state)
            state = TrainState(
                params=loaded["params"],
                opt_state=loaded.get("opt_state", state.opt_state),
                step=jnp.asarray(loaded.get("metadata", {}).get("step", 0)),
            )
            meta = loaded.get("metadata", {})
            prev_train = list(meta.get("train_losses", []))
            prev_val = list(meta.get("val_losses", []))
            start_epoch = int(meta.get("epoch", -1)) + 1
            # restore the LR schedule and patience counters: without these a
            # resumed run retrains at the initial LR with reset plateau/
            # early-stop state and diverges from the uninterrupted run
            sched.load_state_dict(meta.get("sched", {}))
            stopper.load_state_dict(meta.get("stopper", {}))
        n = train_tasks.batch_size
        batch_size = min(batch_size, n)  # tiny datasets: one partial batch
        best_val = min(prev_val) if prev_val else np.inf
        # snapshots must COPY: the donated train step deletes the buffers of
        # every state it consumes, so an alias into state.params becomes a
        # deleted array as soon as the next epoch steps (this returned
        # deleted arrays whenever the best epoch preceded the last)
        snap = lambda p: jax.tree.map(jnp.array, p)  # noqa: E731
        best_params = snap(state.params)
        train_losses, val_losses = prev_train, prev_val
        lr = sched.lr   # = lr0 fresh; restored value on resume
        t_fit = time.time()
        for epoch in range(start_epoch, n_epochs):
            t0 = time.time()
            # per-EPOCH shuffle seed: a resumed run at epoch k draws the same
            # permutation the uninterrupted run drew at epoch k (a single
            # stream seeded once would restart at permutation 0 on resume)
            order_rng = np.random.default_rng((0, epoch))
            a_scale = float(anchor_schedule(epoch)) if anchor_schedule else 1.0
            state, losses = train_epoch(
                self.model, state, train_tasks, batch_size=batch_size, lr=lr,
                shuffle=shuffle, step_fn=self.train_step, rng=order_rng,
                anchor_scale=a_scale,
            )
            finite = [l for l in losses if np.isfinite(l)]  # NaN filter (train.py:395)
            train_loss = float(np.mean(finite)) if finite else np.nan
            train_losses.append(train_loss)

            if val_tasks is not None:
                val_loss = float(self.eval_step(state.params, val_tasks))
            else:
                val_loss = train_loss
            val_losses.append(val_loss)

            is_best = np.isfinite(val_loss) and val_loss < best_val
            # step the schedule/stopper BEFORE checkpointing so the saved
            # state already reflects this epoch's val — a resumed run then
            # continues with exactly the counters/LR the uninterrupted run
            # carried into the next epoch (replay-equivalent resume)
            lr_used = lr  # the lr this epoch actually trained at (for the log)
            lr = sched.step(val_loss)
            should_stop = stopper.step(val_loss)
            if is_best:
                best_val = val_loss
                best_params = snap(state.params)
                if checkpoint_dir is not None:
                    save_checkpoint(
                        checkpoint_dir, state.params,
                        opt_state=state.opt_state, step=int(state.step),
                        metadata={**(metadata or {}),
                                  "train_losses": train_losses,
                                  "val_losses": val_losses,
                                  "best_val": best_val,
                                  "epoch": epoch,
                                  "sched": sched.state_dict(),
                                  "stopper": stopper.state_dict()},
                    )
            if verbose:
                # ETA from the mean epoch wall so far (epoch 0 carries the
                # compile cost, so the first estimate reads high)
                done = epoch - start_epoch + 1
                eta = (time.time() - t_fit) / done * (n_epochs - epoch - 1)
                print(
                    f"epoch {epoch:3d}  train {train_loss:.4f}  val {val_loss:.4f}"
                    f"  lr {lr_used:.2e}  {time.time()-t0:.1f}s"
                    f"  eta {eta/60.0:.1f}m",
                    flush=True,  # nohup'd TPU runs are block-buffered otherwise
                )
            if should_stop:
                break
        return {
            "params": best_params,
            "final_state": state,
            "train_losses": train_losses,
            "val_losses": val_losses,
            "best_val": best_val,
        }
