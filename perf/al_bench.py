"""Active-learning (greedy station placement) benchmark at flagship scale.

Exhaustive mode scores every candidate in ONE batched forward (candidates
ride the batch axis), so a placement round over S candidate sites costs a
single S-batch flagship program. The reference only imports the
deepsensor GreedyAlgorithm; this measures ours doing real work at the
production grid (608² internal, gnp rank 64).

Run on the TPU:  python perf/al_bench.py [n_candidates] [n_placements]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main(n_candidates=64, n_placements=4):
    import jax.numpy as jnp

    from deepsensornz_tpu.al.greedy import GreedyAlgorithm
    from deepsensornz_tpu.task.batching import take
    import bench

    model, params, task24, _tg = bench.build_cycle_inputs(n_tasks=2)
    task = take(task24, [0])  # B=1 (AL contract)
    rng = np.random.default_rng(3)
    task = task.replace(
        xt=jnp.asarray(rng.random((1, 512, 2)).astype(np.float32)),
        yt=jnp.zeros((1, 512, 1), jnp.float32),
        yt_mask=jnp.ones((1, 512), jnp.float32),
        yt_aux=jnp.asarray(rng.normal(size=(1, 512, 1)).astype(np.float32)),
    )
    cands = rng.random((n_candidates, 2)).astype(np.float32)
    cand_aux = rng.normal(size=(n_candidates, 1)).astype(np.float32)

    alg = GreedyAlgorithm(model, params, mode="exhaustive")
    # warm with the SAME n_placements: the fused placement chain is one
    # compiled program per (shapes, n_placements)
    r = alg.run(task, cands, n_placements=n_placements, candidate_aux=cand_aux)
    t0 = time.perf_counter()
    r = alg.run(task, cands, n_placements=n_placements, candidate_aux=cand_aux)
    wall = time.perf_counter() - t0
    print(json.dumps({
        "metric": "greedy_al_flagship",
        "value": round(wall, 3),
        "unit": "s",
        "n_candidates": n_candidates,
        "n_placements": n_placements,
        "s_per_placement": round(wall / n_placements, 3),
        "acquisition_history": [round(h, 4) for h in r["acquisition_history"]],
    }))
    return wall


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
