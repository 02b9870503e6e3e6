"""ConvNP: SetConv encoder → U-Net → SetConv decoder → likelihood head.

TPU-native rebuild of the engine model the reference constructs via
``ConvNP(data_processor, task_loader, **convnp_kwargs)``
(``nzdownscale/downscaler/train.py:219-265``; architecture from
``neuralprocesses.construct_convgnp``): each context set is scattered onto a
shared internal grid with a density channel and a learnable per-set RBF
length-scale, the concatenated encoding runs through a U-Net, and the result
is interpolated at target points (off-grid stations during training; the
full DEM grid at inference, ``validate_ERA.py:88-92``) before an MLP head —
fusing aux-at-target channels (highres topography), parity with
``aux_at_targets`` (``train.py:160-166``) — emits the likelihood parameters.

Design choices for TPU:

- the whole forward is a single jittable function of (params, TaskBatch);
- encode/decode are the separable-einsum SetConvs (:mod:`..ops.setconv`),
  so every heavy op is a batched matmul or conv (MXU);
- the U-Net runs in bfloat16 by default, heads/NLL in float32;
- gridded prediction shares all parameters with the off-grid training path
  (same Dense/MLP applied along the channel axis).
"""

from __future__ import annotations

import dataclasses
import math
import re
from typing import Optional, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from deepsensornz_tpu.models.likelihoods import Likelihood, get_likelihood
from deepsensornz_tpu.models.unet import UNet
from deepsensornz_tpu.ops.grids import default_lengthscale
from deepsensornz_tpu.ops.setconv import (
    setconv_decode_grid,
    setconv_decode_offgrid,
    setconv_encode_grid,
    setconv_encode_offgrid,
)
from deepsensornz_tpu.task.task import TaskBatch


@dataclasses.dataclass(frozen=True)
class ConvNPConfig:
    """Static model hyperparameters (kwargs parity: ``config.py:2685-2689``)."""

    unet_channels: tuple = (64, 64, 64, 64)
    likelihood: str = "gnp"
    internal_density: float = 500.0
    dim_yt: int = 1
    rank: int = 64                # low-rank factors for the gnp head
    decoder_channels: int = 64    # channels decoded from the internal grid
    mlp_hidden: int = 64
    mlp_layers: int = 1
    kernel_size: int = 5
    # U-Net up-path: "transpose" (default; XLA's transpose-conv expansion
    # measured FASTER in-model than the mathematically-identical "subpixel"
    # parity-split lowering — 0.128 s vs 0.141 s full cycle — because the
    # depth-to-space interleave breaks fusion) | "subpixel" | "nearest"
    upsample: str = "transpose"
    # Down-path lowering: "strided" | "s2d" (space-to-depth packed conv) |
    # "packw" (width-pair lane packing) — exact reparameterisations,
    # checkpoint-compatible; models/unet.py
    downsample: str = "strided"
    # Width-pair lane packing: "auto" (default — run the U-Net in the packed
    # lane domain exactly when measured to win: k ≥ 5 at every level,
    # transpose up path, widths divisible; else the plain graph) | False |
    # True (per-op mix packing; measured in-model LOSS, kept for benches) |
    # "domain" (force; raises if widths don't divide). Exact and
    # checkpoint-compatible in every mode. See models/unet.py.
    lane_pack: Union[bool, str] = "auto"
    # Level-0 (full-res) U-Net kernel size override (5→3 halves cycle-
    # dominant FLOPs; quality checked on hardware — docs/perf_unet.md).
    # None = kernel_size at every level (reference parity).
    top_kernel: Optional[int] = None
    compute_dtype: str = "bfloat16"   # U-Net compute precision
    sigmoid_output: bool = False  # ConvNP_sigmoid parity (train.py:639-655)
    # (batch_axis, spatial_axis) mesh-axis names for SPMD sharding of the
    # internal grid. When set (and a mesh is active via jax.set_mesh), the
    # encoded grid is constrained to P(batch, spatial) so XLA partitions the
    # U-Net spatially with automatic halo exchange over ICI.
    mesh_axes: Optional[tuple] = None
    # Use the fused Pallas TPU kernels for the point-set encode and the
    # gridded decode (ops/setconv_pallas.py) instead of the XLA einsum path.
    use_pallas: bool = False
    # Rematerialise the U-Net in the backward pass (jax.checkpoint): trades
    # FLOPs for HBM — enables full internal_density=500 grids at batch
    # sizes that would otherwise OOM (the reference coarsened its inputs
    # instead, preprocess.py:497-498).
    remat: bool = False
    # Selective rematerialisation policy (applies when remat=True):
    #   None    — save nothing; the backward recomputes the whole U-Net
    #             forward, including the packed-domain lane shuffles.
    #   "dots"  — jax.checkpoint_policies.dots_with_no_batch_dims_saveable:
    #             matmul/contraction outputs survive to the backward.
    #   "acts"  — save_only_these_names("unet_act"): the tagged per-level
    #             activations (pack boundary, each down output, bottleneck,
    #             each up-mix output — models/unet.py) survive, so the
    #             backward restarts from level boundaries instead of
    #             replaying the pack/unpack shuffles from the stem
    #             (VERDICT r4 item 4: decompose the packed×remat loss).
    # DEFAULT "acts": measured on v5e at flagship shape (perf/train_bench.py,
    # round 5, same relay session): pipelined step 0.1041 s vs 0.1207 s
    # (batch 8, unpacked) and 0.106 s vs 0.1263 s (packed) — ~14% faster in
    # BOTH lane domains, with loss AND grads bit-comparable to full remat
    # (tests/test_convnp.py::test_remat_policies_numerically_exact). "dots"
    # was a wash. The saved per-level activations cost HBM (~0.5 GB/item at
    # density 1000); at extreme densities where that matters, set
    # remat_policy=None to reclaim it. Full table: docs/perf_unet.md.
    remat_policy: Optional[str] = "acts"
    # Auxiliary masked-MSE weight on the predictive mean. Joint (gnp) NLL
    # decouples from point accuracy — the low-rank factors can explain a
    # biased mean as correlated noise (measured on hardware) — so anchoring
    # the mean restores RMSE without giving up joint structure.
    # None = auto: 1.0 for the joint (gnp) head — the reference's DEFAULT
    # likelihood (config.py:2685-2689) must be good out of the box (anchored
    # flagship: holdout 0.81 °C vs 3.18 °C unanchored) — and 0.0 for the
    # per-point heads, which do not decouple. Set 0.0 explicitly to disable.
    mean_anchor: Optional[float] = None
    # Hoist the head's FIRST linear layer through the gridded decode when it
    # pays: the decode is linear in the U-Net features (its weight
    # normaliser depends only on coordinates), so
    # decode(f) @ W ≡ decode(f @ W) — algebraically exact (VERDICT r3 weak
    # item 6; the aux-channel slice of W is applied at targets, where aux
    # lives). MEASURED GATE (r4, v5e): hoisting engages only when the first
    # layer NARROWS what the decode moves (first_feats < decoder_channels)
    # AND the internal grid is smaller than the target grid. When widths
    # are equal (flagship head: mlp_hidden 64 == decoder_channels 64) the
    # decode cost is unchanged and the extra grid-side matmul makes the
    # hoist a slight net loss (d120 in-graph cycle 15.9 ms hoisted vs
    # 15.2 ms not, perf/cycle_variant.py) — so it stays off there. It wins
    # structurally for mlp_layers=0 heads (cnp decodes 2 channels instead
    # of 64).
    hoist_head: bool = True
    # Physical (normalised-coordinate) SetConv length-scale at init.
    # None = 2/internal_density + the half-grid-spacing floor (the shipped
    # default). Measured fact (round 3): the length-scale params receive
    # essentially no gradient — flagship checkpoints end EXACTLY at their
    # effective init (d500 → 0.00500, d350 → 0.00714, all four scales,
    # gnp AND cnp) — so this init IS the model's smoothing scale, and
    # decoupling it from the grid density is the lever that isolates the
    # density-350 quality mechanism (docs/results/flagship_density_frontier
    # .json). Must exceed 0.5/internal_density (the resolution floor).
    # PER-SCALE form: a tuple of (param_name, value) pairs, e.g.
    # (("ls_decoder", 0.02), ("ls_grid_1", 0.07)) — names not listed fall
    # back to the uniform default. Motivation: self-tuning runs learn a
    # per-scale configuration (decoder ~2.6× sharper than init, aux grid
    # ~30% wider; docs/results/selftune_cpu_scale.json) that no uniform
    # value can express. A tuple, not a dict: the config must stay hashable
    # as a flax module attribute.
    init_lengthscale: Optional[Union[float, tuple]] = None

    def __post_init__(self):
        # normalise the per-scale form (dict from YAML/JSON, or any pair
        # iterable) to a sorted tuple so the config stays hashable
        il = self.init_lengthscale
        if il is not None and not isinstance(il, (int, float)):
            pairs = il.items() if hasattr(il, "items") else il
            norm = tuple(sorted((str(k), float(v)) for k, v in pairs))
            # Unknown scale names would be silently ignored by
            # _lengthscale's dict lookup (a typo'd override trains a
            # different model with no error), so validate against the
            # names the model actually creates: ls_decoder, ls_grid_<i>,
            # ls_points_<i>. (An index beyond the task's context-set
            # count still goes unused — names depend on the task, not the
            # config — but this catches the realistic typo class.)
            bad = [k for k, _ in norm
                   if not re.fullmatch(r"ls_(decoder|(grid|points)_\d+)", k)]
            if bad:
                raise ValueError(
                    f"unknown init_lengthscale scale name(s) {bad}; valid "
                    "names are 'ls_decoder', 'ls_grid_<i>', 'ls_points_<i>'"
                )
            object.__setattr__(self, "init_lengthscale", norm)

    def anchor_weight(self) -> float:
        if self.mean_anchor is not None:
            return float(self.mean_anchor)
        return 1.0 if self.likelihood in ("gnp", "lowrank") else 0.0

    def make_likelihood(self) -> Likelihood:
        kw = {"rank": self.rank} if self.likelihood in ("gnp", "lowrank") else {}
        return get_likelihood(self.likelihood, dim_y=self.dim_yt, **kw)


def _remat_policy(name: Optional[str]):
    """Map ``ConvNPConfig.remat_policy`` to a jax.checkpoint policy.

    Measured at flagship shape in ``perf/train_bench.py`` (VERDICT r4
    item 4); verdict in ``docs/perf_unet.md``.
    """
    if name is None:
        return None
    if name == "dots":
        return jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    if name == "acts":
        return jax.checkpoint_policies.save_only_these_names("unet_act")
    raise ValueError(f"unknown remat_policy {name!r}; use None/'dots'/'acts'")


def _inv_softplus(x: float) -> float:
    return float(math.log(math.expm1(x))) if x < 20 else float(x)


class _DenseParams(nn.Module):
    """Parameters of an ``nn.Dense`` (same names, shapes, initialisers —
    checkpoints are interchangeable) exposed as raw arrays so the caller can
    split the kernel across the linear decode (head hoisting)."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self) -> tuple:
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.in_features, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        return kernel, bias


class ConvNP(nn.Module):
    """Flax module. ``__call__(task)`` → raw likelihood params at targets."""

    cfg: ConvNPConfig

    def _lengthscale(self, name: str) -> jnp.ndarray:
        # floor at half the internal grid spacing: a narrower kernel cannot
        # be resolved by the grid anyway, and softplus→0 would make the RBF
        # exponent 0·inf = NaN wherever a point lands exactly on a grid node
        min_ls = 0.5 / float(self.cfg.internal_density)
        il = self.cfg.init_lengthscale
        if il is not None and not isinstance(il, (int, float)):
            # per-scale (name, value) pairs; unlisted names use the default
            il = dict(il).get(name)
        if il is not None:
            target = float(il)
            if target <= min_ls:
                raise ValueError(
                    f"init_lengthscale {target} for {name} must exceed the "
                    f"grid resolution floor 0.5/internal_density = {min_ls}"
                )
            init = _inv_softplus(target - min_ls)
        else:
            init = _inv_softplus(default_lengthscale(self.cfg.internal_density))
        raw = self.param(name, lambda _: jnp.asarray(init, jnp.float32))
        return jax.nn.softplus(raw) + min_ls

    @nn.compact
    def __call__(
        self,
        task: TaskBatch,
        target_grid: Optional[tuple] = None,
    ) -> jnp.ndarray:
        """Forward pass.

        target_grid=None        → params at ``task.xt``: (B, M, K).
        target_grid=(xt1, xt2, aux_grid) → params on a regular grid:
        (B, Ht, Wt, K); ``aux_grid`` is (B, Ht, Wt, A) or None and must have
        the same channel count as ``task.yt_aux``.
        """
        cfg = self.cfg
        # ---- encode every context set onto the internal grid --------------
        enc = []
        for i, g in enumerate(task.grids):
            ls = self._lengthscale(f"ls_grid_{i}")
            enc.append(setconv_encode_grid(task.x1g, task.x2g, g.x1, g.x2, g.y, ls, g.mask))
        for i, p in enumerate(task.points):
            ls = self._lengthscale(f"ls_points_{i}")
            if cfg.use_pallas:
                from deepsensornz_tpu.ops.setconv_pallas import (
                    setconv_encode_offgrid_best,
                )

                enc.append(setconv_encode_offgrid_best(
                    task.x1g, task.x2g, p.x, p.y, p.mask, ls))
            else:
                enc.append(setconv_encode_offgrid(task.x1g, task.x2g, p.x, p.y, p.mask, ls))
        h = jnp.concatenate(enc, axis=-1)
        h = _maybe_shard_grid(h, cfg)

        # ---- U-Net over the internal grid ----------------------------------
        unet_cls = (nn.remat(UNet, policy=_remat_policy(cfg.remat_policy))
                    if cfg.remat else UNet)
        f = unet_cls(
            channels=tuple(cfg.unet_channels),
            out_channels=cfg.decoder_channels,
            kernel_size=cfg.kernel_size,
            compute_dtype=jnp.dtype(cfg.compute_dtype),
            upsample=cfg.upsample,
            downsample=cfg.downsample,
            lane_pack=cfg.lane_pack,
            top_kernel=cfg.top_kernel,
            name="unet",
        )(h)
        f = _maybe_shard_grid(f, cfg)

        # ---- decode at targets + head MLP → likelihood parameters ----------
        # The first head layer is declared as raw (kernel, bias) params with
        # nn.Dense's exact names/shapes/init so the SAME checkpoint serves
        # both application orders (dense-then-decode vs decode-then-dense).
        ls_dec = self._lengthscale("ls_decoder")
        num_out = cfg.make_likelihood().num_params()
        first_feats = cfg.mlp_hidden if cfg.mlp_layers >= 1 else num_out
        first_name = "head_0" if cfg.mlp_layers >= 1 else "head_out"
        if target_grid is None:
            aux = task.yt_aux
        else:
            xt1, xt2, aux = target_grid
        a_ch = 0 if aux is None else aux.shape[-1]
        k0, b0 = _DenseParams(first_feats, cfg.decoder_channels + a_ch,
                              name=first_name)()

        hoist = (
            cfg.hoist_head and target_grid is not None and not cfg.use_pallas
            and f.shape[1] * f.shape[2] < xt1.shape[0] * xt2.shape[0]
            # only when the first layer NARROWS the decode: equal-width
            # hoisting measured a net loss (see hoist_head field note)
            and first_feats < cfg.decoder_channels
        )
        if hoist:
            # decode(f) @ W ≡ decode(f @ W): first-layer matmul on the
            # (smaller) internal grid, decode the hidden channels instead
            g = f.astype(jnp.float32) @ k0[: cfg.decoder_channels]
            z = setconv_decode_grid(task.x1g, task.x2g, g, xt1, xt2, ls_dec)
            if aux is not None:
                z = z + aux.astype(jnp.float32) @ k0[cfg.decoder_channels:]
            z = z + b0
        else:
            if target_grid is None:
                dec = setconv_decode_offgrid(task.x1g, task.x2g, f, task.xt, ls_dec)
            elif cfg.use_pallas:
                from deepsensornz_tpu.ops.setconv_pallas import (
                    setconv_decode_grid_best,
                )

                dec = setconv_decode_grid_best(task.x1g, task.x2g, f, xt1, xt2, ls_dec)
            else:
                dec = setconv_decode_grid(task.x1g, task.x2g, f, xt1, xt2, ls_dec)
            if aux is not None:
                dec = jnp.concatenate([dec, aux.astype(jnp.float32)], axis=-1)
            z = dec @ k0 + b0

        if cfg.mlp_layers >= 1:
            z = nn.relu(z)
            for j in range(1, cfg.mlp_layers):
                z = nn.relu(nn.Dense(cfg.mlp_hidden, name=f"head_{j}")(z))
            raw = nn.Dense(num_out, name="head_out")(z)
        else:
            raw = z
        if cfg.sigmoid_output:
            raw = _sigmoid_squash(raw, cfg)
        return raw

    # convenience -------------------------------------------------------------

    def init_params(self, rng: jax.Array, task: TaskBatch):
        return self.init(rng, task)

    def loss(self, params, task: TaskBatch, anchor_scale=1.0) -> jnp.ndarray:
        """Normalised NLL (parity: ``model.loss_fn(task, normalise=True)``),
        plus the optional mean-anchor MSE term.

        ``anchor_scale`` is a TRACED multiplier on the anchor weight so a
        trainer can decay the anchor over epochs (anchor high early to pin
        the mean, →0 late so the final epochs optimise the pure joint NLL)
        without recompiling the train step.
        """
        raw = self.apply(params, task)
        lik = self.cfg.make_likelihood()
        out = lik.nll(raw, task.yt, task.yt_mask)
        anchor = self.cfg.anchor_weight()
        if anchor > 0.0:
            mean, _ = lik.mean_std(raw)
            m = task.yt_mask.astype(jnp.float32)[..., None]
            se = jnp.square((mean - task.yt.astype(jnp.float32))) * m
            mse = jnp.sum(se) / jnp.maximum(jnp.sum(m) * mean.shape[-1], 1.0)
            out = out + anchor * anchor_scale * mse
        return out


def _maybe_shard_grid(x: jnp.ndarray, cfg: ConvNPConfig) -> jnp.ndarray:
    """Constrain (B, H, W, C) internal-grid tensors to P(batch, spatial)."""
    if cfg.mesh_axes is None:
        return x
    from jax.sharding import PartitionSpec as P

    batch_ax, spatial_ax = cfg.mesh_axes
    return jax.lax.with_sharding_constraint(x, P(batch_ax, spatial_ax, None, None))


def _sigmoid_squash(raw: jnp.ndarray, cfg: ConvNPConfig) -> jnp.ndarray:
    """Squash the mean channel through a sigmoid and scale the scale channel
    by the sigmoid derivative — ``ConvNP_sigmoid`` parity
    (``train.py:639-655``, used for bounded humidity)."""
    dy = cfg.dim_yt
    mu = raw[..., :dy]
    sig_mu = jax.nn.sigmoid(mu)
    dsig = sig_mu * (1.0 - sig_mu)
    rest = raw[..., dy:]
    if rest.shape[-1] >= dy:
        # scale the (pre-softplus) scale channel multiplicatively in
        # post-softplus space: softplus(x + log d) ≈ softplus(x)·d for the
        # regime softplus operates in; exact scaling applied on the raw.
        scale = rest[..., :dy] + jnp.log(jnp.maximum(dsig, 1e-6))
        rest = jnp.concatenate([scale, rest[..., dy:]], axis=-1)
    return jnp.concatenate([sig_mu, rest], axis=-1)


def count_params(params) -> int:
    """Total parameter count (printed at ``train.py:262``)."""
    return sum(p.size for p in jax.tree.leaves(params))
