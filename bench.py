"""Headline benchmark: full-NZ 0.05° gridded inference per forecast cycle.

North-star target (BASELINE.md): < 1 s p50 on one TPU v5e chip for a full
forecast cycle = 24 hourly tasks, each predicting mean+std over the whole
NZ 0.05° grid (278×260 cells) from ERA5-scale context (0.1° grid + aux
topography channels + ~500 stations), through the flagship ConvNP
(U-Net (64,)*4, gnp low-rank likelihood, internal_density=500 → 608×608
internal grid — the full reference default config, NOT a memory-reduced one).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline = target_seconds / measured_seconds (>1 beats the target).
"""

from __future__ import annotations

import json
import time

import numpy as np


def build_cycle_inputs(n_tasks=24, internal_density=500):
    import jax
    import jax.numpy as jnp

    from deepsensornz_tpu import config as cfg
    from deepsensornz_tpu.data.processor import DataProcessor
    from deepsensornz_tpu.models.convnp import ConvNP, ConvNPConfig
    from deepsensornz_tpu.ops.grids import internal_grid
    from deepsensornz_tpu.task.task import GridContext, PointContext, TaskBatch

    rng = np.random.default_rng(0)
    e = cfg.EXTENTS["all"]
    dp = DataProcessor()
    dp.set_coord_maps_from_extent(e["minlat"], e["maxlat"], e["minlon"], e["maxlon"])

    # ERA5-scale base grid 0.1°
    nb_lat, nb_lon = 139, 130
    bx1 = np.linspace(0, 1, nb_lat).astype(np.float32)
    bx2 = np.linspace(0, 1, nb_lon).astype(np.float32)
    base_y = rng.normal(size=(n_tasks, nb_lat, nb_lon, 3)).astype(np.float32)  # var + cos/sin day

    # aux topography grid at 0.05° (elev + 3×TPI)
    na_lat, na_lon = 278, 260
    ax1 = np.linspace(0, 1, na_lat).astype(np.float32)
    ax2 = np.linspace(0, 1, na_lon).astype(np.float32)
    aux_y = rng.normal(size=(1, na_lat, na_lon, 4)).astype(np.float32)
    aux_y = np.repeat(aux_y, n_tasks, 0)

    # ~500 stations
    n_st = 512
    st_x = rng.random((1, n_st, 2)).astype(np.float32)
    st_x = np.repeat(st_x, n_tasks, 0)
    st_y = rng.normal(size=(n_tasks, n_st, 1)).astype(np.float32)
    st_m = np.ones((n_tasks, n_st), np.float32)

    x1g, x2g = internal_grid((0.0, 1.0), (0.0, 1.0), internal_density, 0.1, 16)

    task = TaskBatch(
        grids=(
            GridContext(x1=jnp.asarray(bx1), x2=jnp.asarray(bx2), y=jnp.asarray(base_y)),
            GridContext(x1=jnp.asarray(ax1), x2=jnp.asarray(ax2), y=jnp.asarray(aux_y)),
        ),
        points=(PointContext(x=jnp.asarray(st_x), y=jnp.asarray(st_y), mask=jnp.asarray(st_m)),),
        xt=jnp.zeros((n_tasks, 8, 2), jnp.float32),
        yt=jnp.zeros((n_tasks, 8, 1), jnp.float32),
        yt_mask=jnp.ones((n_tasks, 8), jnp.float32),
        yt_aux=jnp.zeros((n_tasks, 8, 1), jnp.float32),
        x1g=jnp.asarray(x1g),
        x2g=jnp.asarray(x2g),
    )

    model_cfg = ConvNPConfig(
        unet_channels=(64, 64, 64, 64), likelihood="gnp",
        internal_density=internal_density, rank=64,
        decoder_channels=64, compute_dtype="bfloat16",
    )
    model = ConvNP(model_cfg)
    params = model.init(jax.random.key(0), task)

    # prediction grid: full NZ at 0.05°
    xt1 = jnp.asarray(np.linspace(0, 1, na_lat), jnp.float32)
    xt2 = jnp.asarray(np.linspace(0, 1, na_lon), jnp.float32)
    aux_t = jnp.asarray(rng.normal(size=(n_tasks, na_lat, na_lon, 1)).astype(np.float32))
    return model, params, task, (xt1, xt2, aux_t)


def _arm_watchdog(seconds=7200.0):
    """Exit (code 3) if the bench hasn't finished within ``seconds``.

    The TPU is reached through an HTTP relay; when the relay is down a
    device call blocks indefinitely (observed 2026-08-17: multi-hour
    outage), which would hang the driver. A healthy run takes ~5 min
    including first compile, but a DEGRADED (not down) relay must be
    tolerated: round 5 measured 26 min for one first compile, and later
    1168 s to compile a TRIVIAL 384x384 matmul program
    (docs/results/compile_cache_probe_r5.json) while cached dispatch
    stayed normal — so a flagship-size compile can plausibly take over
    an hour with the hardware alive and the result still forthcoming.
    2 h with no result means genuinely unreachable."""
    import os
    import sys
    import threading

    def bail():
        print(
            "bench.py watchdog: no result after "
            f"{seconds:.0f}s — TPU relay unreachable; aborting",
            file=sys.stderr, flush=True,
        )
        os._exit(3)

    t = threading.Timer(seconds, bail)
    t.daemon = True
    t.start()
    return t


def main():
    import jax

    watchdog = _arm_watchdog()
    model, params, task, target_grid = build_cycle_inputs()
    lik = model.cfg.make_likelihood()

    @jax.jit
    def cycle(params, task, target_grid):
        raw = model.apply(params, task, target_grid=target_grid)
        mean, std = lik.mean_std(raw)
        # in-graph checksum: fetching this scalar forces full execution
        # (block_until_ready is unreliable through remote-device tunnels)
        return mean, std, jnp_sum2(mean, std)

    import jax.numpy as jnp

    def jnp_sum2(a, b):
        return jnp.sum(a) + jnp.sum(b)

    # warmup/compile
    mean, std, chk = cycle(params, task, target_grid)
    float(np.asarray(chk))

    reps = []
    for _ in range(7):
        t0 = time.perf_counter()
        _, _, chk = cycle(params, task, target_grid)
        float(np.asarray(chk))  # 4-byte sync fetch
        reps.append(time.perf_counter() - t0)
    p50 = float(np.median(reps))

    watchdog.cancel()
    target = 1.0  # seconds per forecast cycle (BASELINE.md north star)
    print(json.dumps({
        "metric": "nz_0.05deg_cycle_inference_p50",
        "value": round(p50, 4),
        "unit": "s",
        "vs_baseline": round(target / p50, 2),
    }))


if __name__ == "__main__":
    main()
