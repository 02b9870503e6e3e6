"""Per-stage attribution of the parity serving cycle (VERDICT r4 item 5).

The in-graph cycle compute (91.9 ms r4) sits ~7 ms above the conv
speed-of-light the perf docs imply. This script attributes the residue:
each stage of the flagship gridded forward — context SetConv encode,
packed U-Net, gridded SetConv decode, head+moments — is timed IN-GRAPH
with the K-loop-minus-control microbench (CLAUDE.md rule; the per-call
p50 is relay-floor-bound) at exactly the bench.py shapes, using the
model's own parameters, and the stage sum is compared to the whole-cycle
number. The gap between sum and whole is XLA's cross-stage fusion
(negative = fusion wins; positive = layout/boundary overhead).

Run ON the TPU:  python perf/cycle_attribution.py [internal_density]
"""

import json
import sys
import time

import numpy as np


def _kloop_time(fn, args, K=8, reps=5):
    """Median per-iteration in-graph time of ``fn(*args) -> array`` via K
    executions inside one jitted fori_loop with a scalar-carry dependency
    through every float input, minus an empty-loop control."""
    import jax
    import jax.numpy as jnp

    def loop(k):
        @jax.jit
        def run(*a):
            def it(_, carry):
                s, aa = carry
                s = s + jnp.sum(fn(*aa).astype(jnp.float32))
                aa = jax.tree.map(
                    lambda v: v + (s * 1e-30).astype(v.dtype)
                    if jnp.issubdtype(v.dtype, jnp.floating) else v, aa)
                return s, aa

            s, _ = jax.lax.fori_loop(0, k, it, (jnp.float32(0.0), a))
            return s

        return run

    fK, f0 = loop(K), loop(0)
    float(np.asarray(fK(*args)))  # compile
    float(np.asarray(f0(*args)))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(fK(*args)))
        tK = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(np.asarray(f0(*args)))
        ts.append((tK - (time.perf_counter() - t0)) / K)
    return float(np.median(ts))


def main(internal_density=500):
    import jax
    import jax.numpy as jnp

    import bench
    from deepsensornz_tpu.models.unet import UNet
    from deepsensornz_tpu.ops.setconv import (
        setconv_decode_grid,
        setconv_encode_grid,
        setconv_encode_offgrid,
    )

    model, params, task, target_grid = bench.build_cycle_inputs(
        internal_density=internal_density)
    cfg = model.cfg
    lik = cfg.make_likelihood()
    xt1, xt2, aux_t = target_grid
    p = params["params"]
    min_ls = 0.5 / float(cfg.internal_density)

    def ls(name):
        return jax.nn.softplus(p[name]) + min_ls

    # ---- stage closures at exactly the model's shapes ----------------------
    def encode(task):
        enc = [setconv_encode_grid(task.x1g, task.x2g, g.x1, g.x2, g.y,
                                   ls(f"ls_grid_{i}"), g.mask)
               for i, g in enumerate(task.grids)]
        enc += [setconv_encode_offgrid(task.x1g, task.x2g, pt.x, pt.y,
                                       pt.mask, ls(f"ls_points_{i}"))
                for i, pt in enumerate(task.points)]
        return jnp.concatenate(enc, axis=-1)

    h = jax.jit(encode)(task)

    unet = UNet(channels=tuple(cfg.unet_channels),
                out_channels=cfg.decoder_channels,
                kernel_size=cfg.kernel_size,
                compute_dtype=jnp.dtype(cfg.compute_dtype),
                upsample=cfg.upsample, downsample=cfg.downsample,
                lane_pack=cfg.lane_pack, top_kernel=cfg.top_kernel)

    def unet_fn(h):
        return unet.apply({"params": p["unet"]}, h)

    f = jax.jit(unet_fn)(h)

    def decode_fn(f):
        return setconv_decode_grid(task.x1g, task.x2g, f, xt1, xt2,
                                   ls("ls_decoder"))

    dec = jax.jit(decode_fn)(f)

    def head_fn(dec, aux):
        z = jnp.concatenate([dec, aux.astype(jnp.float32)], -1)
        k0, b0 = p["head_0"]["kernel"], p["head_0"]["bias"]
        z = z @ k0 + b0
        import flax.linen as nn
        z = nn.relu(z)
        for j in range(1, cfg.mlp_layers):
            kj = p[f"head_{j}"]
            z = nn.relu(z @ kj["kernel"] + kj["bias"])
        ko = p["head_out"]
        raw = z @ ko["kernel"] + ko["bias"]
        mean, std = lik.mean_std(raw)
        return jnp.sum(mean) + jnp.sum(std)

    def cycle_fn(params, task, target_grid):
        raw = model.apply(params, task, target_grid=target_grid)
        mean, std = lik.mean_std(raw)
        return jnp.sum(mean) + jnp.sum(std)

    rows = {}
    rows["encode_setconv"] = _kloop_time(encode, (task,))
    rows["unet_packed_auto"] = _kloop_time(unet_fn, (h,))
    rows["decode_setconv"] = _kloop_time(decode_fn, (f,))
    rows["head_moments"] = _kloop_time(
        lambda d, a: jnp.reshape(head_fn(d, a), (1,)), (dec, aux_t))
    rows["full_cycle"] = _kloop_time(
        lambda pp, tk: jnp.reshape(cycle_fn(pp, tk, target_grid), (1,)),
        (params, task))

    stage_sum = sum(v for k, v in rows.items() if k != "full_cycle")
    out = {
        "metric": "cycle_stage_attribution",
        "internal_density": internal_density,
        "stages_ms": {k: round(v * 1e3, 2) for k, v in rows.items()},
        "stage_sum_ms": round(stage_sum * 1e3, 2),
        "fusion_gap_ms": round((rows["full_cycle"] - stage_sum) * 1e3, 2),
        "note": "in-graph K-loop times (relay round trips excluded); "
                "fusion_gap = whole-cycle minus stage sum — negative means "
                "cross-stage fusion saves that much, positive means stage "
                "boundaries cost it",
    }
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 500)
