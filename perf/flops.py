"""Flagship train-step FLOP count via XLA cost analysis (CPU lowering).

Grounds the train-throughput comparison (docs/train_throughput.md): the
per-task FLOPs of the flagship config — U-Net (64,)×4 on the 608² internal
grid, gnp rank 64, 512 stations/targets — measured from the compiled
program, not estimated. The torch reference graph (perf/ref_torch_bench.py)
executes the same convolutions, so the count applies to both stacks.

Run:  python perf/flops.py        (forces CPU; no TPU needed)
"""

from __future__ import annotations

import json

import numpy as np


def main(batch=8):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from deepsensornz_tpu.models.convnp import ConvNP, ConvNPConfig
    from deepsensornz_tpu.ops.grids import internal_grid
    from deepsensornz_tpu.task.task import GridContext, PointContext, TaskBatch
    from deepsensornz_tpu.train.trainer import init_state, make_train_step

    rng = np.random.default_rng(0)
    x1g, x2g = internal_grid((0, 1), (0, 1), 500, 0.1, 16)
    nb, na = (139, 130), (278, 260)
    task = TaskBatch(
        grids=(
            GridContext(x1=jnp.linspace(0, 1, nb[0]), x2=jnp.linspace(0, 1, nb[1]),
                        y=jnp.asarray(rng.normal(size=(batch, *nb, 3)).astype(np.float32))),
            GridContext(x1=jnp.linspace(0, 1, na[0]), x2=jnp.linspace(0, 1, na[1]),
                        y=jnp.asarray(rng.normal(size=(batch, *na, 4)).astype(np.float32))),
        ),
        points=(PointContext(
            x=jnp.asarray(rng.random((batch, 512, 2)).astype(np.float32)),
            y=jnp.asarray(rng.normal(size=(batch, 512, 1)).astype(np.float32)),
            mask=jnp.ones((batch, 512), jnp.float32)),),
        xt=jnp.asarray(rng.random((batch, 512, 2)).astype(np.float32)),
        yt=jnp.asarray(rng.normal(size=(batch, 512, 1)).astype(np.float32)),
        yt_mask=jnp.ones((batch, 512), jnp.float32),
        yt_aux=jnp.asarray(rng.normal(size=(batch, 512, 1)).astype(np.float32)),
        x1g=jnp.asarray(x1g), x2g=jnp.asarray(x2g),
    )
    cfg = ConvNPConfig(likelihood="gnp", rank=64, internal_density=500)
    model = ConvNP(cfg)
    state = init_state(model, jax.random.key(0), task)
    step = make_train_step(model, donate=False)

    ca = jax.jit(step).lower(state, task, 5e-5).compile().cost_analysis()
    flops = float(ca["flops"])
    fwd = jax.jit(model.loss).lower(state.params, task).compile().cost_analysis()
    fwd_flops = float(fwd["flops"])
    print(json.dumps({
        "train_step_flops": flops, "batch": batch,
        "flops_per_task": flops / batch,
        "loss_fwd_flops": fwd_flops, "fwd_per_task": fwd_flops / batch,
    }))


if __name__ == "__main__":
    main()
