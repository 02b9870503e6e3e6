"""Cycle benchmark for U-Net lowering/architecture variants.

Same measurement as bench.py (24-task full-NZ 0.05° cycle, one in-graph
checksum fetch per rep) but with ConvNPConfig overrides from the command
line, so candidate configs are timed under identical conditions:

    python perf/cycle_variant.py                 # parity flagship
    python perf/cycle_variant.py top_kernel=3    # fast level-0 variant
    python perf/cycle_variant.py upsample='"subpixel"'

Used for the speed-of-light study in docs/perf_unet.md.
"""

import dataclasses
import json
import sys
import time

import numpy as np


def main(**overrides):
    import jax
    import jax.numpy as jnp

    import bench

    # internal_density must flow into the TASK (the model computes on
    # task.x1g/x2g — the internal grid is task data, not config), so pop it
    # out and rebuild the inputs at that density; the cfg override then
    # keeps the length-scale floor/init consistent with the grid.
    density = overrides.pop("internal_density", 500)
    model, params, task, target_grid = bench.build_cycle_inputs(
        internal_density=density)
    if overrides:
        from deepsensornz_tpu.models.convnp import ConvNP

        cfg = dataclasses.replace(model.cfg, internal_density=density,
                                  **overrides)
        model = ConvNP(cfg)
        params = model.init(jax.random.key(0), task)
    lik = model.cfg.make_likelihood()

    @jax.jit
    def cycle(params, task, target_grid):
        raw = model.apply(params, task, target_grid=target_grid)
        mean, std = lik.mean_std(raw)
        return jnp.sum(mean) + jnp.sum(std)

    float(np.asarray(cycle(params, task, target_grid)))  # compile
    reps = []
    for _ in range(7):
        t0 = time.perf_counter()
        float(np.asarray(cycle(params, task, target_grid)))
        reps.append(time.perf_counter() - t0)
    p50 = float(np.median(reps))
    print(json.dumps({
        "metric": "cycle_variant_p50",
        "overrides": {k: str(v) for k, v in overrides.items()},
        "internal_density": density,
        "value": round(p50, 4),
        "unit": "s",
    }), flush=True)
    return p50


if __name__ == "__main__":
    kw = {}
    for kv in sys.argv[1:]:
        k, _, raw = kv.partition("=")
        kw[k] = json.loads(raw)
    main(**kw)
