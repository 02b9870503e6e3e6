"""Training-throughput benchmark at flagship scale (north star #2:
>= 10x reference train tasks/sec/chip — BASELINE.md).

Flagship config: U-Net (64,)x4, internal_density=500 (608x608 internal
grid), gnp rank-64 head, bf16 U-Net, 512-station context, 512 targets,
batch 8 tasks/step. Prints one JSON line with tasks/sec.

Run on the TPU:  python perf/train_bench.py
"""

from __future__ import annotations

import json
import time

import numpy as np


def main(batch=8, internal_density=500, n_stations=512, n_targets=512,
         steps=5, **cfg_overrides):
    import jax
    import jax.numpy as jnp

    from deepsensornz_tpu.models.convnp import ConvNP, ConvNPConfig
    from deepsensornz_tpu.ops.grids import internal_grid
    from deepsensornz_tpu.task.task import GridContext, PointContext, TaskBatch
    from deepsensornz_tpu.train.trainer import init_state, make_train_step

    rng = np.random.default_rng(0)
    x1g, x2g = internal_grid((0, 1), (0, 1), internal_density, 0.1, 16)

    nb = (139, 130)   # ERA5 0.1° base grid
    na = (278, 260)   # aux topo grid 0.05°
    task = TaskBatch(
        grids=(
            GridContext(
                x1=jnp.linspace(0, 1, nb[0]), x2=jnp.linspace(0, 1, nb[1]),
                y=jnp.asarray(rng.normal(size=(batch, *nb, 3)).astype(np.float32)),
            ),
            GridContext(
                x1=jnp.linspace(0, 1, na[0]), x2=jnp.linspace(0, 1, na[1]),
                y=jnp.asarray(rng.normal(size=(batch, *na, 4)).astype(np.float32)),
            ),
        ),
        points=(PointContext(
            x=jnp.asarray(rng.random((batch, n_stations, 2)).astype(np.float32)),
            y=jnp.asarray(rng.normal(size=(batch, n_stations, 1)).astype(np.float32)),
            mask=jnp.ones((batch, n_stations), jnp.float32),
        ),),
        xt=jnp.asarray(rng.random((batch, n_targets, 2)).astype(np.float32)),
        yt=jnp.asarray(rng.normal(size=(batch, n_targets, 1)).astype(np.float32)),
        yt_mask=jnp.ones((batch, n_targets), jnp.float32),
        yt_aux=jnp.asarray(rng.normal(size=(batch, n_targets, 1)).astype(np.float32)),
        x1g=jnp.asarray(x1g), x2g=jnp.asarray(x2g),
    )

    cfg = ConvNPConfig(
        unet_channels=(64, 64, 64, 64), likelihood="gnp", rank=64,
        internal_density=internal_density, compute_dtype="bfloat16",
        **cfg_overrides,
    )
    model = ConvNP(cfg)
    state = init_state(model, jax.random.key(0), task)
    step = make_train_step(model, donate=False)

    def sync(x):
        return float(np.asarray(x))

    state, loss = step(state, task, 5e-5)
    sync(loss)  # compile + one step
    times = []
    for _ in range(steps):
        t0 = time.perf_counter()
        state, loss = step(state, task, 5e-5)
        sync(loss)
        times.append(time.perf_counter() - t0)
    p50 = float(np.median(times))

    # pipelined throughput: K steps, ONE fetch — how the Trainer actually
    # runs an epoch (losses fetched at epoch end), and the honest
    # tasks/s/chip figure when the host↔device round trip is off the
    # critical path (the relay adds ~30 ms per sync here)
    K = 10
    t0 = time.perf_counter()
    for _ in range(K):
        state, loss = step(state, task, 5e-5)
    sync(loss)
    pipelined = (time.perf_counter() - t0) / K

    print(json.dumps({
        "metric": "train_tasks_per_sec_flagship",
        "value": round(batch / pipelined, 1),
        "unit": "tasks/s",
        "step_p50_s": round(p50, 4),
        "step_pipelined_s": round(pipelined, 4),
        "tasks_per_sec_synced": round(batch / p50, 1),
        "batch": batch,
        "overrides": {k: str(v) for k, v in cfg_overrides.items()},
        "final_loss": sync(loss),
    }))
    return batch / pipelined


if __name__ == "__main__":
    import sys

    # usage: train_bench.py [batch ...] [key=value ...]  (values JSON; e.g.
    #        train_bench.py 8 16 top_kernel=3
    #        train_bench.py 2 internal_density=1000 remat=true)
    # keys naming main() parameters (internal_density, n_stations, …) bind
    # there; the rest are ConvNPConfig overrides.
    batches, overrides = [], {}
    for a in sys.argv[1:]:
        if "=" in a:
            k, _, raw = a.partition("=")
            overrides[k] = json.loads(raw)
        else:
            batches.append(int(a))
    for b in batches or [8]:
        main(batch=b, **overrides)
