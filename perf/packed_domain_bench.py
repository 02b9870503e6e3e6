"""Packed-domain U-Net vs default at the flagship shape (round-4 item 1).

In-graph fori_loop protocol (CLAUDE.md MICROBENCH RULE). Also times the
fwd+bwd (train-side) variant: the packed domain must win BOTH to ship.

    python perf/packed_domain_bench.py
"""

import json

import numpy as np

import sys
sys.path.insert(0, "/root/repo")
from perf.unet_bench import _timeit_ingraph  # noqa: E402


def main(B=24, HW=608, CIN=12):
    import jax
    import jax.numpy as jnp

    from deepsensornz_tpu.models.unet import UNet

    rng = np.random.default_rng(0)
    key = jax.random.key(0)
    x = jnp.asarray(rng.normal(size=(B, HW, HW, CIN)).astype(np.float32))

    results = {}
    variants = [
        ("unet64_default", dict()),
        ("unet64_domain", dict(lane_pack="domain")),
        ("unet64_default_top3", dict(top_kernel=3)),
        ("unet64_domain_top3", dict(lane_pack="domain", top_kernel=3)),
    ]
    params_by_kind = {}
    for name, kw in variants:
        mod = UNet(channels=(64,) * 4, out_channels=64, kernel_size=5,
                   compute_dtype=jnp.bfloat16, **kw)
        pk = kw.get("top_kernel")
        if pk not in params_by_kind:
            params_by_kind[pk] = mod.init(key, x)
        params = params_by_kind[pk]
        results[name] = _timeit_ingraph(mod.apply, params, x)
        print(f"{name}: {results[name]*1e3:.2f} ms", flush=True)

    # fwd+bwd: grad of a scalar loss wrt params (the train-step shape)
    for name, kw in variants:
        mod = UNet(channels=(64,) * 4, out_channels=64, kernel_size=5,
                   compute_dtype=jnp.bfloat16, **kw)
        params = params_by_kind[kw.get("top_kernel")]

        def loss_fn(p, xx, _mod=mod):
            return jnp.sum(jnp.square(_mod.apply(p, xx).astype(jnp.float32)))

        def fwdbwd(p, xx, _loss=loss_fn):
            l, g = jax.value_and_grad(_loss)(p, xx)
            return l + sum(jnp.sum(v).astype(jnp.float32)
                           for v in jax.tree.leaves(g))

        results[name + "_fwdbwd"] = _timeit_ingraph(fwdbwd, params, x)
        print(f"{name}_fwdbwd: {results[name + '_fwdbwd']*1e3:.2f} ms",
              flush=True)

    print(json.dumps({k: round(v * 1e3, 3) for k, v in results.items()}))


if __name__ == "__main__":
    main()
