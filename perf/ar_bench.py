"""Autoregressive sampling benchmark at flagship scale.

The reference's engine exposes AR sampling (deepsensor ``ar_sample``) for
spatially coherent fields; ours is `infer/ar.py::ar_sample` (block-AR, one
compiled forward per block). This measures it at the flagship config:
24 tasks × 512 targets, gnp rank 64, 608² internal grid, ``n_blocks=8``
(8 sequential model forwards with pseudo-observation feedback).

Run on the TPU:  python perf/ar_bench.py [n_samples] [n_blocks]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main(n_samples=1, n_blocks=8, batch=24, n_targets=512):
    import jax
    import jax.numpy as jnp

    from deepsensornz_tpu.infer.ar import ar_sample
    import bench

    model, params, task, _tg = bench.build_cycle_inputs(n_tasks=batch)
    # the cycle task carries dummy 8-point targets (it decodes to a grid);
    # AR samples at task.xt, so swap in a real 512-target set
    rng = np.random.default_rng(1)
    task = task.replace(
        xt=jnp.asarray(rng.random((batch, n_targets, 2)).astype(np.float32)),
        yt=jnp.zeros((batch, n_targets, 1), jnp.float32),
        yt_mask=jnp.ones((batch, n_targets), jnp.float32),
        yt_aux=jnp.asarray(
            rng.normal(size=(batch, n_targets, 1)).astype(np.float32)),
    )
    # warm: compile the block forward
    s = ar_sample(model, params, task, n_samples=n_samples, n_blocks=n_blocks)
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        s = ar_sample(model, params, task, n_samples=n_samples, n_blocks=n_blocks)
        reps.append(time.perf_counter() - t0)
    p50 = float(np.median(reps))
    assert np.isfinite(s).all()
    print(json.dumps({
        "metric": "ar_sample_flagship",
        "value": round(p50, 3),
        "unit": "s",
        "n_samples": n_samples,
        "n_blocks": n_blocks,
        "tasks": batch,
        "targets": int(task.xt.shape[1]),
        "sample_std": round(float(np.std(s)), 4),
    }))
    return p50


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
