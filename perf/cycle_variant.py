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

    # in-graph compute time (MICROBENCH RULE): K cycles inside ONE jitted
    # fori_loop with a scalar-carry data dependency through every float
    # task leaf (defeats CSE/DCE *and* loop-invariant hoisting of the
    # U-Net), minus a K=0 control — resolves deltas far below the ~30 ms
    # relay round trip that dominates the per-call p50 above.
    K = 8

    def loop(k):
        @jax.jit
        def run(params, task, target_grid):
            def it(_, carry):
                s, tk = carry
                s = s + cycle(params, tk, target_grid)
                tk = jax.tree.map(
                    lambda a: a + (s * 1e-30).astype(a.dtype)
                    if jnp.issubdtype(a.dtype, jnp.floating) else a, tk)
                return s, tk

            s, _ = jax.lax.fori_loop(0, k, it, (jnp.float32(0.0), task))
            return s

        return run

    fK, f0 = loop(K), loop(0)
    float(np.asarray(fK(params, task, target_grid)))  # compile
    float(np.asarray(f0(params, task, target_grid)))
    cts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(np.asarray(fK(params, task, target_grid)))
        tK = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(np.asarray(f0(params, task, target_grid)))
        cts.append((tK - (time.perf_counter() - t0)) / K)
    compute_s = float(np.median(cts))

    print(json.dumps({
        "metric": "cycle_variant_p50",
        "overrides": {k: str(v) for k, v in overrides.items()},
        "internal_density": density,
        "value": round(p50, 4),
        "compute_s": round(compute_s, 4),
        "unit": "s",
    }), flush=True)
    return p50


if __name__ == "__main__":
    kw = {}
    for kv in sys.argv[1:]:
        k, _, raw = kv.partition("=")
        kw[k] = json.loads(raw)
    main(**kw)
