"""Down-path op microbenchmark (round-3 attack on the strided convs).

Times ONLY the down-conv candidates + the batch-in-lanes probe — a focused
subset of perf/unet_bench.py for the round-3 question: does space-to-depth
lowering (dense conv at 4×Cin) beat the strided conv that measured 16–20 %
of peak in round 2? Same in-graph fori_loop protocol (CLAUDE.md microbench
rule).

Run on the TPU:  nohup python perf/downconv_bench.py > /tmp/downconv.log &
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))  # run as `python perf/...py`
from unet_bench import (  # noqa: E402
    _timeit_ingraph, down_ctx_module, mix_grouped_module, pack_batch_pairs,
)


def main(B=24, H=304, C=64):
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from deepsensornz_tpu.models.unet import _S2DDown

    rng = np.random.default_rng(0)
    key = jax.random.key(0)
    dt = jnp.bfloat16
    x_hi = jnp.asarray(rng.normal(size=(B, 2 * H, 2 * H, C)).astype(np.float32), dt)
    x_cat = jnp.asarray(rng.normal(size=(B, 2 * H, 2 * H, 2 * C)).astype(np.float32), dt)

    results = {}

    def bench_module(name, mod, x):
        params = mod.init(key, x)
        results[name] = _timeit_ingraph(mod.apply, params, x)
        print(f"{name}: {results[name]*1e3:.2f} ms", flush=True)

    # stride-2 k5 original op vs space-to-depth lowering, 608² → 304², 64ch
    bench_module("conv_k5_s2", nn.Conv(C, (5, 5), strides=(2, 2),
                                       padding="SAME", dtype=dt), x_hi)
    bench_module("conv_k5_s2_s2d", _S2DDown(C, 5, dtype=dt), x_hi)

    # fusion context + batch-in-lanes probe — shared modules with unet_bench
    bench_module("downctx_strided", down_ctx_module(C, dt, "strided"), x_hi)
    bench_module("downctx_s2d", down_ctx_module(C, dt, "s2d"), x_hi)
    bench_module("mix_k5_batchlanes_group2", mix_grouped_module(C, dt),
                 pack_batch_pairs(x_cat, B, H, C))

    # control: the plain full-res mix conv (round-2 reference point)
    bench_module("mix_k5_128to64_608sq",
                 nn.Conv(C, (5, 5), padding="SAME", dtype=dt), x_cat)

    print(json.dumps({k: round(v * 1e3, 3) for k, v in results.items()}))
    return results


if __name__ == "__main__":
    main()
