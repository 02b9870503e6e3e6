"""Autoregressive (AR) sampling: coherent joint fields for any likelihood.

Engine parity with deepsensor's ``ar_sample`` path (used for the
"ConvNP sample i" panels, ``nzdownscale/downscaler/validate.py:1019-1027``,
``experiments/deepsensor/nz_downscaling.py:472-477``): target points are
visited in random order in blocks; each block is sampled from the model's
predictive distribution and **fed back as observed context** for the next
block, producing spatially coherent samples even for factorised likelihoods
(cnp / bernoulli-gamma / spikes-beta) where plain marginal sampling would be
white noise.

TPU-first mechanics: the context set designated as the AR feedback channel
is pre-padded with ``M`` empty slots; each AR step fills a block of slots
via ``dynamic_update_slice`` and re-runs the SAME forward — static shapes
throughout. The whole block chain is ONE jitted ``lax.scan`` (round 2:
the former host loop cost ~1.4 s/block through a remote-device link; the
scan keeps every block on device and downloads once at the end —
24 flagship tasks × 512 targets × 8 blocks: 11.5 s → see perf/ar_bench.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from deepsensornz_tpu.task.task import PointContext, TaskBatch


def _extend_point_context(pc: PointContext, extra: int) -> PointContext:
    """Append ``extra`` masked-off slots to a point context set."""
    B, N, _ = pc.x.shape
    C = pc.y.shape[-1]
    pad_x = jnp.full((B, extra, 2), -1e3, jnp.float32)
    pad_y = jnp.zeros((B, extra, C), jnp.float32)
    pad_m = jnp.zeros((B, extra), jnp.float32)
    return PointContext(
        x=jnp.concatenate([pc.x, pad_x], 1),
        y=jnp.concatenate([pc.y, pad_y], 1),
        mask=jnp.concatenate([pc.mask, pad_m], 1),
    )


def ar_sample(
    model,
    params,
    task: TaskBatch,
    n_samples: int = 1,
    n_blocks: int = 8,
    ar_context_idx: int = -1,
    rng: jax.Array | None = None,
    std_scale: float = 1.0,
) -> np.ndarray:
    """Draw AR samples at ``task.xt``. Returns (n_samples, B, M, dy).

    ``ar_context_idx`` selects which point-context set receives sampled
    pseudo-observations (the target-variable station set; its channel count
    must equal ``dy``).
    ``std_scale`` applies the model artifact's post-hoc uncertainty
    recalibration to each block's predictive distribution via the head's
    exact spread reparameterisation (``Likelihood.rescale_raw`` — point
    masses of the mixed heads are preserved).
    """
    rng = jax.random.key(0) if rng is None else rng
    B, M, _ = task.xt.shape
    dy = model.cfg.dim_yt
    idx = ar_context_idx % len(task.points)
    base_n = task.points[idx].x.shape[1]
    ctx_c = task.points[idx].y.shape[-1]
    n_extra = ctx_c - dy
    if n_extra < 0:
        raise ValueError(
            f"AR context set has {ctx_c} channels < dim_yt={dy}"
        )
    # extra context channels come from aux_at_contexts; feed back the first
    # n_extra aux-at-target channels (aux_at_contexts is conventionally a
    # prefix of aux_at_targets — e.g. elevation of [elevation, TPI…]);
    # zero-fill if targets carry fewer aux channels than the context needs.

    block = -(-M // n_blocks)  # ceil
    n_blocks = -(-M // block)
    pad = n_blocks * block - M
    chain = _chain_fn(model, B, M, dy, idx, base_n, n_extra, block, n_blocks, pad)

    # extended context built ONCE (identical for every sample chain)
    task_ext = task.replace(points=tuple(
        _extend_point_context(p, n_blocks * block) if i == idx else p
        for i, p in enumerate(task.points)
    ))
    out = np.zeros((n_samples, B, M, dy), np.float32)
    for s in range(n_samples):
        key = jax.random.fold_in(rng, s)
        korder, kblocks = jax.random.split(key)
        # random visit order per sample; pad indices revisit already-sampled
        # targets — excluded from output/feedback via dup_keep in _chain_fn
        perm = jax.vmap(lambda k: jax.random.permutation(k, M))(
            jax.random.split(korder, B)
        )
        order = jnp.concatenate([perm, perm[:, :pad]], axis=1) if pad else perm
        out[s] = np.asarray(chain(params, task_ext, order, kblocks,
                                  jnp.asarray(std_scale, jnp.float32)))
    return out


@functools.lru_cache(maxsize=32)
def _chain_fn(model, B, M, dy, idx, base_n, n_extra, block, n_blocks, pad):
    """Build the jitted AR chain for a (model, geometry) pair ONCE — cached
    so repeated ``ar_sample`` calls (operational loops, benchmarks) reuse
    the compiled executable instead of retracing a fresh closure."""
    lik = model.cfg.make_likelihood()

    def ar_step(params, task_ext, order, b, key, std_scale):
        """Predict at block ``b`` of (permuted) targets, sample, and write
        the samples into the AR context slots.

        ``dup_keep`` (block,): 0 where the block entry is a pad-duplicate of
        an already-visited target (the last block when M % block != 0) —
        its feedback mask is zeroed so the final block never sees two
        conflicting pseudo-observations at the same coordinate."""
        start = b * block
        # pad-duplicate guard, traced from the block index
        dup_keep = jnp.where(
            jnp.logical_and(b == n_blocks - 1,
                            jnp.arange(block) >= block - pad) if pad else
            jnp.zeros(block, bool),
            0.0, 1.0,
        ).astype(jnp.float32)
        blk = jax.lax.dynamic_slice(order, (0, start), (B, block))  # (B, block)
        xt_blk = jnp.take_along_axis(task_ext.xt, blk[..., None], axis=1)
        aux_blk = (
            jnp.take_along_axis(task_ext.yt_aux, blk[..., None], axis=1)
            if task_ext.yt_aux is not None else None
        )
        mask_blk = jnp.take_along_axis(task_ext.yt_mask, blk, axis=1) * dup_keep[None, :]
        probe = task_ext.replace(
            xt=xt_blk, yt_aux=aux_blk, yt_mask=mask_blk,
            yt=jnp.zeros((B, block, dy), jnp.float32),
        )
        raw = model.apply(params, probe)                      # (B, block, K)
        # shipped recalibration: reparameterised spread, exact for every
        # head (point masses preserved — models/likelihoods.rescale_raw)
        raw = lik.rescale_raw(raw, std_scale)
        sample = lik.sample(raw, key, 1)[0]                   # (B, block, dy)
        # write sampled pseudo-observations into the AR context slots
        pc = task_ext.points[idx]
        slot = base_n + start
        if n_extra == 0:
            feedback = sample
        else:
            if aux_blk is not None and aux_blk.shape[-1] >= n_extra:
                extra = aux_blk[..., :n_extra]
            else:
                extra = jnp.zeros(sample.shape[:-1] + (n_extra,), jnp.float32)
            feedback = jnp.concatenate([sample, extra], axis=-1)
        new_x = jax.lax.dynamic_update_slice(pc.x, xt_blk, (0, slot, 0))
        new_y = jax.lax.dynamic_update_slice(pc.y, feedback, (0, slot, 0))
        new_m = jax.lax.dynamic_update_slice(pc.mask, mask_blk, (0, slot))
        points = tuple(
            PointContext(x=new_x, y=new_y, mask=new_m) if i == idx else p
            for i, p in enumerate(task_ext.points)
        )
        return task_ext.replace(points=points), sample, blk, dup_keep

    @jax.jit
    def run_chain(params, task_ext, order, kblocks, std_scale):
        """The whole AR chain as ONE compiled scan: no host interaction
        between blocks (each host round trip costs ~30 ms + transfers
        through a remote-device link). Returns the (B, M, dy) sample."""
        out0 = jnp.zeros((B, M + 1, dy), jnp.float32)  # slot M = dump for dups

        def body(carry, b):
            task_ext, out = carry
            kb = jax.random.fold_in(kblocks, b)
            task_ext, sample, blk, dup_keep = ar_step(
                params, task_ext, order, b, kb, std_scale)
            # scatter this block's samples; pad-duplicates go to the dump
            # slot so the FIRST visit's sample is what survives (host-loop
            # semantics)
            tgt = jnp.where(dup_keep[None, :] > 0, blk, M)       # (B, block)
            out = out.at[jnp.arange(B)[:, None], tgt].set(sample)
            return (task_ext, out), None

        (_, out), _ = jax.lax.scan(body, (task_ext, out0),
                                   jnp.arange(n_blocks))
        return out[:, :M]

    return run_chain
