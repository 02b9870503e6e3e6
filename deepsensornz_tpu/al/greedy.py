"""Greedy station placement — engine parity with
``deepsensor.active_learning.GreedyAlgorithm`` + ``Stddev`` acquisition
(imported by the reference at ``nzdownscale/downscaler/validate.py:26-27``,
``experiments/deepsensor/nz_downscaling.py:22-23``: the station-placement
capability surface).

Two search modes:

- ``exhaustive``: for each remaining candidate, hypothetically add it to
  the context (pseudo-observed at the current predictive mean) and score
  the acquisition over the target set; pick the best. All candidates are
  scored in ONE batched forward — candidates ride the batch axis, so the
  search is a single device program per placement round.
- ``fast``: place at the candidate with maximum current predictive std
  (equivalent argmax for a single placement; greedier approximation for
  sequences).

After each placement the chosen point is fed back as context (value = its
predicted mean), so subsequent placements account for earlier ones.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from deepsensornz_tpu.task.task import PointContext, TaskBatch


class Stddev:
    """Acquisition: mean predictive standard deviation over targets
    (lower after adding a sensor = better placement)."""

    def __call__(self, mean: jnp.ndarray, std: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        m = mask.astype(jnp.float32)
        return jnp.sum(std[..., 0] * m, -1) / jnp.maximum(jnp.sum(m, -1), 1.0)


class GreedyAlgorithm:
    """Sequential greedy placement of ``n_placements`` new stations."""

    def __init__(
        self,
        model,
        params,
        acquisition: Optional[Callable] = None,
        ar_context_idx: int = -1,
        mode: str = "exhaustive",
    ):
        self.model = model
        self.params = params
        self.acquisition = acquisition or Stddev()
        self.ar_context_idx = ar_context_idx
        self.mode = mode
        self.lik = model.cfg.make_likelihood()

    # -- jitted cores ------------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=(0,))
    def _predict(self, params, task):
        raw = self.model.apply(params, task)
        return self.lik.mean_std(raw)

    # -- public ---------------------------------------------------------------------

    def run(
        self,
        task: TaskBatch,
        candidates: np.ndarray,  # (S, 2) candidate x-space coords
        n_placements: int = 1,
        candidate_aux: Optional[np.ndarray] = None,  # (S, A) aux at candidates
    ) -> dict:
        """Greedy placement on a SINGLE task (batch size 1).

        Returns {"placements": (n, 2), "acquisition_history": [...]}.
        """
        if task.batch_size != 1:
            raise ValueError("active learning runs on a single task (B=1)")
        idx = self.ar_context_idx % len(task.points)
        dy = self.model.cfg.dim_yt
        S = len(candidates)
        if n_placements > S:
            raise ValueError(
                f"n_placements={n_placements} exceeds the {S} candidates — "
                "placed candidates leave the pool, so each placement needs "
                "a fresh site"
            )
        if task.points[idx].y.shape[-1] < dy:
            raise ValueError(
                f"AL context set has {task.points[idx].y.shape[-1]} channels "
                f"< dim_yt={dy} (wrong ar_context_idx?)"
            )
        if task.yt_aux is not None and candidate_aux is None:
            raise ValueError(
                "model was trained with aux_at_targets; pass candidate_aux "
                "(aux channels at the candidate sites) — zero-filled aux "
                "would score every candidate at the dataset-mean covariates"
            )
        cand = jnp.asarray(candidates, jnp.float32)

        # pre-pad the feedback context with n_placements masked slots so
        # every round runs the SAME compiled programs (concatenating a point
        # per round changed the context shape → a full recompile of the
        # S-batch flagship forward per placement; measured 13.9 s/placement
        # vs sub-second once shapes are static)
        from deepsensornz_tpu.infer.ar import _extend_point_context

        base_n = task.points[idx].x.shape[1]
        task = task.replace(points=tuple(
            _extend_point_context(p, n_placements) if i == idx else p
            for i, p in enumerate(task.points)
        ))

        cand_aux = (
            jnp.asarray(candidate_aux, jnp.float32)
            if candidate_aux is not None else None
        )

        # the whole greedy sequence is ONE compiled scan: every extra jit
        # call moves the task pytree through the host link (measured ~1-3 s
        # per call on a remote device); fused, the device runs all rounds
        # and the host fetches (n, 2) placements + (n,) scores once
        final_task, best_xs, scores = self._run_chain(
            self.params, task, cand, cand_aux, base_n, n_placements, idx, dy,
        )
        return {
            "placements": np.asarray(best_xs),
            "acquisition_history": [float(s) for s in np.asarray(scores)],
            "final_task": final_task,
        }

    @functools.partial(jax.jit, static_argnums=(0, 5, 6, 7, 8))
    def _run_chain(self, params, task, cand, cand_aux, base_n, n_placements,
                   idx, dy):
        """All greedy rounds on device: scan over placement slots."""

        S = cand.shape[0]

        ctx_c = task.points[idx].y.shape[-1]

        def feedback(y_vals, aux_rows):
            """Context-channel feedback: observed value(s) + the candidate's
            aux prefix for the aux_at_contexts channels (zeros only when no
            candidate aux exists — matches ar.py's feedback convention)."""
            n_extra = ctx_c - dy
            if n_extra == 0:
                return y_vals[..., :dy]
            if cand_aux is not None and cand_aux.shape[-1] >= n_extra:
                extra = aux_rows[..., :n_extra]
            else:
                extra = jnp.zeros(y_vals.shape[:-1] + (n_extra,), jnp.float32)
            return jnp.concatenate([y_vals[..., :dy], extra], axis=-1)

        def body(carry, t):
            task, taken = carry   # taken: (S,) 1.0 where already placed
            probe = self._probe_at(task, cand, cand_aux)
            c_mean, c_std = self._predict(params, probe)
            if self.mode == "fast":
                # placed candidates leave the pool (deepsensor semantics)
                best = jnp.argmax(jnp.where(taken > 0, -jnp.inf, c_std[0, :, 0]))
                score = c_std[0, best, 0]
            else:
                hyp_feed = feedback(
                    c_mean[0],
                    cand_aux if cand_aux is not None else jnp.zeros((S, 0)),
                )                                               # (S, ctx_c)
                scores = self._exhaustive_scores_dev(
                    params, task, cand, hyp_feed, idx)
                best = jnp.argmin(jnp.where(taken > 0, jnp.inf, scores))
                score = scores[best]
            placed_feed = feedback(
                c_mean[0, best],
                cand_aux[best] if cand_aux is not None else jnp.zeros((0,)),
            )                                                   # (ctx_c,)
            new_task = self._set_context_slot(
                task, idx, base_n + t, cand[best], placed_feed)
            return (new_task, taken.at[best].set(1.0)), (cand[best], score)

        (final, _), (xs, scores) = jax.lax.scan(
            body, (task, jnp.zeros(S, jnp.float32)), jnp.arange(n_placements))
        return final, xs, scores

    # -- helpers ------------------------------------------------------------------------

    def _probe_at(self, task, cand, candidate_aux):
        S = cand.shape[0]
        aux = None
        if task.yt_aux is not None:
            A = task.yt_aux.shape[-1]
            aux = (
                jnp.asarray(candidate_aux, jnp.float32)[None]
                if candidate_aux is not None else jnp.zeros((1, S, A), jnp.float32)
            )
        return task.replace(
            xt=cand[None],
            yt=jnp.zeros((1, S, self.model.cfg.dim_yt), jnp.float32),
            yt_mask=jnp.ones((1, S), jnp.float32),
            yt_aux=aux,
        )

    def _exhaustive_scores_dev(self, params, task, cand, feed, idx) -> jnp.ndarray:
        """Score every candidate in one batched forward: candidate s becomes
        an extra context point (value+aux feedback ``feed[s]``) of
        hypothetical task s. Device-native (runs inside the jitted round);
        ``params`` is threaded through so the compiled chain never bakes
        the weights in as constants."""
        S = cand.shape[0]

        def tile(leaf):
            return jnp.repeat(leaf, S, axis=0) if leaf is not None and leaf.ndim >= 1 and leaf.shape[0] == 1 else leaf

        tiled = jax.tree.map(lambda l: tile(l), task)
        pc = tiled.points[idx]
        new_x = jnp.concatenate([pc.x, cand[:, None, :]], axis=1)
        new_y = jnp.concatenate([pc.y, feed[:, None, :]], axis=1)
        new_m = jnp.concatenate([pc.mask, jnp.ones((S, 1), jnp.float32)], axis=1)
        points = tuple(
            PointContext(x=new_x, y=new_y, mask=new_m) if i == idx else p
            for i, p in enumerate(tiled.points)
        )
        tiled = tiled.replace(points=points)
        mean, std = self._predict(params, tiled)
        return self.acquisition(mean, std, tiled.yt_mask)

    @staticmethod
    def _set_context_slot(task, idx, slot, x_new, feed):
        """Write a placed point (value+aux feedback ``feed``) into pre-padded
        context slot ``slot`` — shapes never change, so every placement
        reuses the same compiled programs."""
        pc = task.points[idx]
        new_x = jax.lax.dynamic_update_slice(pc.x, x_new[None, None, :], (0, slot, 0))
        new_y = jax.lax.dynamic_update_slice(pc.y, feed[None, None, :], (0, slot, 0))
        new_m = jax.lax.dynamic_update_slice(
            pc.mask, jnp.ones((1, 1), jnp.float32), (0, slot))
        points = tuple(
            PointContext(x=new_x, y=new_y, mask=new_m) if i == idx else p
            for i, p in enumerate(task.points)
        )
        return task.replace(points=points)
