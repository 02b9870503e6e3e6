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
via ``dynamic_update_slice`` and re-runs the SAME jitted forward — one
compiled program regardless of block index (static shapes throughout). The
block loop is a host loop over a single XLA executable; per-sample chains
reuse it too.
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
) -> np.ndarray:
    """Draw AR samples at ``task.xt``. Returns (n_samples, B, M, dy).

    ``ar_context_idx`` selects which point-context set receives sampled
    pseudo-observations (the target-variable station set; its channel count
    must equal ``dy``).
    """
    rng = jax.random.key(0) if rng is None else rng
    lik = model.cfg.make_likelihood()
    B, M, _ = task.xt.shape
    dy = model.cfg.dim_yt
    idx = ar_context_idx % len(task.points)
    base_n = task.points[idx].x.shape[1]
    ctx_c = task.points[idx].y.shape[-1]
    aux_c = task.yt_aux.shape[-1] if task.yt_aux is not None else 0
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

    @functools.partial(jax.jit, static_argnames=())
    def ar_step(params, task_ext, order, start, dup_keep, key):
        """Predict at the next block of (permuted) targets, sample, and
        write the samples into the AR context slots.

        ``dup_keep`` (block,): 0 where the block entry is a pad-duplicate of
        an already-visited target (the last block when M % block != 0) —
        its feedback mask is zeroed so the final block never sees two
        conflicting pseudo-observations at the same coordinate."""
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
        return task_ext.replace(points=points), sample, blk

    out = np.zeros((n_samples, B, M, dy), np.float32)
    pad = n_blocks * block - M
    for s in range(n_samples):
        key = jax.random.fold_in(rng, s)
        korder, kblocks = jax.random.split(key)
        # random visit order per sample; pad indices revisit already-sampled
        # targets — excluded from the output write via `keep` below and
        # from the AR feedback via `dup_keep` in ar_step
        perm = jax.vmap(lambda k: jax.random.permutation(k, M))(
            jax.random.split(korder, B)
        )
        order = jnp.concatenate([perm, perm[:, :pad]], axis=1) if pad else perm
        task_ext = task.replace(points=tuple(
            _extend_point_context(p, n_blocks * block) if i == idx else p
            for i, p in enumerate(task.points)
        ))
        for b in range(n_blocks):
            kb = jax.random.fold_in(kblocks, b)
            dup_keep = np.ones(block, np.float32)
            if pad and b == n_blocks - 1:
                dup_keep[block - pad:] = 0.0
            task_ext, sample, blk = ar_step(
                params, task_ext, order, jnp.asarray(b * block),
                jnp.asarray(dup_keep), kb
            )
            blk_np = np.asarray(blk)
            samp_np = np.asarray(sample)
            for bi in range(B):
                sel = blk_np[bi]
                keep = np.ones(len(sel), bool)
                if pad and b == n_blocks - 1:
                    keep[block - pad:] = False
                out[s, bi, sel[keep]] = samp_np[bi][keep]
    return out
