"""Training orchestration: processed bundle → TaskLoader → ConvNP → fit.

Rebuild of the reference ``Train`` class (``nzdownscale/downscaler/
train.py:31-522``):

- ``setup_task_loader`` (``train.py:120-216``): context =
  [base_ds, aux_ds, (landmask), (stations)], target = stations,
  aux_at_targets = highres topo; station-as-context modes all/fraction/
  random/split; loader persisted beside the model,
- ``initialise_model`` (``train.py:219-265``): ConvNP built from
  (data_processor, task_loader, convnp_kwargs) with per-variable default
  likelihood (``config.py:162-169``), optional warm-start from a prior
  checkpoint with encoder freezing unless the variable is surface_pressure
  (``train.py:243-258``), parameter-count report (``train.py:262``),
- ``train_model`` → :class:`deepsensornz_tpu.train.Trainer` (AdamW +
  plateau + early stop + best-val checkpointing), with tasks materialised
  once up front (``train.py:192-193``) as a single fixed-shape TaskBatch,
- metadata persisted with the checkpoint (``train.py:498-510``).
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Optional

import jax
import numpy as np

from deepsensornz_tpu import config as cfg
from deepsensornz_tpu.models.convnp import ConvNP, ConvNPConfig, count_params
from deepsensornz_tpu.ops.grids import infer_internal_density
from deepsensornz_tpu.task.loader import TaskLoader
from deepsensornz_tpu.train.checkpoint import load_checkpoint
from deepsensornz_tpu.train.trainer import Trainer


def fit_std_scale(model, params, tasks, clip=(0.05, 20.0)) -> float:
    """Fit the post-hoc uncertainty recalibration factor on held-out tasks.

    Gaussian heads: the std of the standardised residuals z = (y − mean)/std
    over valid targets — rescaling the spread by it maps validation z_std to
    exactly 1 (z is affine-invariant, so the fit runs in normalised space).
    Mixed heads (bernoulli-gamma / spikes-beta): bisection on the
    randomized-PIT z_std of the spread-rescaled head
    (:meth:`~deepsensornz_tpu.models.likelihoods.Likelihood.rescale_raw`) —
    point masses are untouched, so only the continuous body recalibrates.
    The factor is stored in the checkpoint metadata (``std_scale``) and
    applied by :class:`~deepsensornz_tpu.infer.predict.Predictor` — the
    recalibration lives in the model artifact, not in any evaluation script.
    """
    import jax.numpy as jnp
    from scipy.special import ndtri

    lik = model.cfg.make_likelihood()
    raw = jax.jit(model.apply)(params, tasks)
    y = np.asarray(tasks.yt, np.float64)
    m = np.broadcast_to(
        np.asarray(tasks.yt_mask).astype(bool)[..., None], y.shape)
    if m.sum() < 2:
        return 1.0

    if lik.name in ("cnp", "gnp"):
        mean, std = lik.mean_std(raw)
        mean = np.asarray(mean, np.float64)
        std = np.asarray(std, np.float64)
        z = (y[m] - mean[m]) / np.maximum(std[m], 1e-9)
        if not np.all(np.isfinite(z)):
            return 1.0
        return float(np.clip(np.std(z), *clip))

    # mixed heads: BODY-CONDITIONAL PIT — only observations that fall in the
    # continuous body respond to a spread rescale (point masses are exact
    # already), and a pooled PIT fit degenerates when the body carries few
    # obs (measured: a mostly-dry precip window pushed a pooled fit to the
    # clip). u_cond = (F(y) − F_body_lo)/(F_body_hi − F_body_lo) ~ U(0,1)
    # iff the body is calibrated; bisect its z_std to 1 (monotone ↓ in s).
    cdf = jax.jit(lambda r, s: lik.cdf_bounds(lik.rescale_raw(r, s), tasks.yt))
    bint = jax.jit(lambda r, s: lik.body_interval(lik.rescale_raw(r, s)))

    def body_zstd(s: float) -> Optional[float]:
        sj = jnp.asarray(s, jnp.float32)
        lo, hi = cdf(raw, sj)
        b_lo, b_hi = bint(raw, sj)
        lo = np.asarray(lo, np.float64)
        hi = np.asarray(hi, np.float64)
        b_lo = np.asarray(b_lo, np.float64)
        b_hi = np.asarray(b_hi, np.float64)
        body = m & (np.abs(hi - lo) < 1e-9)  # continuous point: F(y⁻)=F(y)
        span = np.maximum(b_hi - b_lo, 1e-9)
        u = np.clip((hi - b_lo) / span, 0.0, 1.0)
        z = ndtri(np.clip(u[body], 1e-6, 1 - 1e-6))
        z = z[np.isfinite(z)]
        return float(z.std()) if len(z) >= 10 else None

    lo_s, hi_s = clip
    z0 = body_zstd(1.0)
    if z0 is None:  # too few body obs to fit → ship unscaled
        return 1.0
    # body membership is recomputed per-s; at extreme s the body can
    # degenerate (igamma at huge shape → NaN CDFs) and body_zstd returns
    # None — never compare None against 1.0, fall back instead
    z_lo = body_zstd(lo_s)
    if z_lo is not None and z_lo < 1.0:  # even the sharpest allowed is too wide
        return float(lo_s)
    z_hi = body_zstd(hi_s)
    if z_hi is not None and z_hi > 1.0:  # even the widest allowed is too sharp
        return float(hi_s)
    for _ in range(30):
        mid = np.sqrt(lo_s * hi_s)  # bisect in log space
        z_mid = body_zstd(mid)
        if z_mid is None:  # body degenerated — stop refining
            break
        if z_mid > 1.0:
            lo_s = mid
        else:
            hi_s = mid
    return float(np.sqrt(lo_s * hi_s))


class Train:
    """End-to-end training driver for one variable/run."""

    def __init__(self, processed_output_dict: dict, seed: int = 0):
        self.p = processed_output_dict
        self.dp = processed_output_dict["data_processor"]
        self.seed = seed
        self.task_loader: Optional[TaskLoader] = None
        self.model: Optional[ConvNP] = None
        self.params = None
        self.metadata: dict = {}

    # ------------------------------------------------------------ task loader --

    def setup_task_loader(
        self,
        station_as_context="all",
        internal_density: Optional[float] = None,
        auto_set_internal_density: bool = False,
        grid_multiple: int = 16,
    ) -> TaskLoader:
        p = self.p
        context = [p["base_ds"], p["aux_ds"]]
        sampling = ["all", "all"]
        if p.get("landmask_ds") is not None:
            context.append(p["landmask_ds"])
            sampling.append("all")
        links = []
        if station_as_context is not None and station_as_context is not False:
            context.append(p["station_df"])
            if station_as_context == "split":
                sampling.append("split")
                links = [(len(context) - 1, 0)]
            elif station_as_context == "all" or station_as_context is True:
                sampling.append("all")  # True ≡ "all" (bool YAML arg)
            else:
                sampling.append(station_as_context)  # float fraction / 'random'

        if auto_set_internal_density or internal_density is None:
            res = []
            for entry in context:
                try:
                    fields = list(entry.values()) if hasattr(entry, "values") and not hasattr(entry, "columns") else []
                    for f in fields:
                        res.append(f.resolution(f.dims[-2]))
                except Exception:
                    pass
            internal_density = infer_internal_density(res) if res else cfg.CONVNP_KWARGS_DEFAULT["internal_density"]

        self.task_loader = TaskLoader(
            context=context,
            target=p["station_df"],
            aux_at_targets=p["highres_aux_ds"],
            context_sampling=sampling,
            target_sampling="split" if station_as_context == "split" else "all",
            links=links,
            internal_density=internal_density,
            grid_multiple=grid_multiple,
        )
        self.internal_density = internal_density
        return self.task_loader

    def task_times(self) -> np.ndarray:
        base = next(iter(self.p["base_ds"].values()))
        return base.coords["time"]

    def create_tasks(self, times=None, **kw):
        """Materialise tasks once, up front (``train.py:192-193,308-334``)."""
        times = self.task_times() if times is None else times
        return self.task_loader(list(times), **kw)

    # ------------------------------------------------------------------ model --

    def initialise_model(
        self,
        unet_channels=None,
        likelihood: Optional[str] = None,
        internal_density: Optional[float] = None,
        pretrained_dir: Optional[str] = None,
        compute_dtype: str = "bfloat16",
        **extra,
    ) -> ConvNP:
        assert self.task_loader is not None, "setup_task_loader first"
        var = self.p["data_settings"]["variable"]
        likelihood = likelihood or cfg.LIKELIHOODS[var]
        unet_channels = tuple(unet_channels or cfg.CONVNP_KWARGS_DEFAULT["unet_channels"])
        density = internal_density or getattr(self, "internal_density", None) \
            or cfg.CONVNP_KWARGS_DEFAULT["internal_density"]
        self.convnp_kwargs = {
            "unet_channels": unet_channels,
            "likelihood": likelihood,
            "internal_density": density,
        }
        model_cfg = ConvNPConfig(
            unet_channels=unet_channels,
            likelihood=likelihood,
            internal_density=density,
            dim_yt=self.task_loader.target_dim(),
            compute_dtype=compute_dtype,
            sigmoid_output=(var == "humidity" and likelihood in ("cnp", "gnp")),
            **extra,
        )
        self.model = ConvNP(model_cfg)
        import dataclasses as _dc

        self.model_config_dict = {
            k: (list(v) if isinstance(v, tuple) else v)
            for k, v in _dc.asdict(model_cfg).items() if k != "mesh_axes"
        }

        example = self.task_loader(
            [self.task_times()[0]], seed_override=0
        )
        self.params = self.model.init(jax.random.key(self.seed), example)
        self.frozen_patterns: tuple = ()
        if pretrained_dir is not None:
            loaded = load_checkpoint(pretrained_dir, self.params)
            self.params = loaded["params"]
            if var != "surface_pressure":  # train.py:243-258
                self.frozen_patterns = ("ls_grid", "ls_points", "unet")
        print(f"ConvNP parameters: {count_params(self.params):,}")
        return self.model

    # --------------------------------------------------------------- training --

    def train_model(
        self,
        train_times=None,
        val_times=None,
        n_epochs: int = cfg.TRAIN_DEFAULTS["n_epochs"],
        batch_size: int = cfg.TRAIN_DEFAULTS["batch_size"],
        lr: float = cfg.TRAIN_DEFAULTS["lr"],
        weight_decay: float = cfg.TRAIN_DEFAULTS["weight_decay"],
        model_dir: Optional[str] = None,
        task_kwargs: Optional[dict] = None,
        verbose: bool = True,
        recalibrate: str | bool = "auto",
        anchor_schedule=None,
        lengthscale_lr_mult: float = 1.0,
    ) -> dict:
        """``recalibrate``: fit a post-hoc ``std_scale`` on validation
        data after training and store it in the checkpoint metadata.
        "auto" (default) recalibrates every head — the joint (gnp) head's
        NLL optimum systematically over-disperses the MARGINAL stds it
        reports (measured z_std ≈ 0.12 on the flagship run), and the mixed
        heads' bodies measured over-dispersed on PIT too; the fit is
        closed-form validation z_std for Gaussian heads and a PIT-z
        bisection for the mixed heads (:func:`fit_std_scale`).
        ``anchor_schedule`` is forwarded to :meth:`Trainer.fit` (epoch →
        anchor-weight multiplier)."""
        times = self.task_times()
        if train_times is None:
            n_val = max(len(times) // 5, 1)
            train_times, val_times = times[:-n_val], times[-n_val:]
        if val_times is None:  # explicit train_times, no validation split
            val_times = []
        task_kwargs = task_kwargs or {"datewise_deterministic": True}
        train_tasks = self.create_tasks(train_times, **task_kwargs)
        val_tasks = self.create_tasks(val_times, **task_kwargs) if len(val_times) else None

        self.metadata = self._construct_metadata_dict()
        if model_dir is not None:
            os.makedirs(model_dir, exist_ok=True)
            with open(os.path.join(model_dir, "task_loader.pkl"), "wb") as f:
                pickle.dump(self.task_loader, f)  # train.py:174-177
            self.dp.save(os.path.join(model_dir, "data_processor.json"))

        trainer = Trainer(
            self.model, lr=lr, weight_decay=weight_decay,
            frozen_patterns=getattr(self, "frozen_patterns", ()),
            seed=self.seed,
            lengthscale_lr_mult=lengthscale_lr_mult,
        )
        out = trainer.fit(
            train_tasks, val_tasks,
            n_epochs=n_epochs, batch_size=batch_size,
            params=self.params,
            plateau_patience=cfg.TRAIN_DEFAULTS["plateau_patience"],
            plateau_factor=cfg.TRAIN_DEFAULTS["plateau_factor"],
            early_stop_patience=cfg.TRAIN_DEFAULTS["early_stop_patience"],
            checkpoint_dir=model_dir,
            metadata=self.metadata,
            verbose=verbose,
            anchor_schedule=anchor_schedule,
        )
        self.params = out["params"]
        self.train_losses = out["train_losses"]
        self.val_losses = out["val_losses"]

        # "auto" now recalibrates EVERY head: Gaussian heads via closed-form
        # validation z_std, mixed heads via PIT-z bisection on the exact
        # spread reparameterisation (point masses preserved)
        do_recal = True if recalibrate == "auto" else bool(recalibrate)
        self.std_scale = 1.0
        if do_recal and val_tasks is None and verbose:
            print("recalibration skipped: no validation tasks "
                  "(std_scale stays 1.0 — pass val_times to fit it)")
        if do_recal and val_tasks is not None:
            self.std_scale = fit_std_scale(self.model, self.params, val_tasks)
            out["std_scale"] = self.std_scale
            if verbose:
                print(f"recalibration: std_scale = {self.std_scale:.4f}")
            if model_dir is not None:
                from deepsensornz_tpu.train.checkpoint import update_metadata

                update_metadata(model_dir, std_scale=self.std_scale)
        if model_dir is not None:
            try:  # loss-curve PNG beside the checkpoint (train.py:513-522)
                from deepsensornz_tpu.plot import make_loss_plot

                make_loss_plot(self.train_losses, self.val_losses,
                               os.path.join(model_dir, "losses.png"))
            except Exception:
                pass
        return out

    def _construct_metadata_dict(self) -> dict:
        """Run-reconstruction metadata (``train.py:504-510``)."""
        return {
            "data_settings": self.p["data_settings"],
            "date_info": self.p["date_info"],
            "convnp_kwargs": getattr(self, "convnp_kwargs", {}),
            "model_config": getattr(self, "model_config_dict", {}),
        }

    def run_training_sequence(self, model_dir: Optional[str] = None,
                              station_as_context="all", convnp_kwargs=None,
                              **train_kw) -> dict:
        """setup → init → train (``train.py:97-117``)."""
        self.setup_task_loader(station_as_context=station_as_context)
        self.initialise_model(**(convnp_kwargs or {}))
        return self.train_model(model_dir=model_dir, **train_kw)
