"""Probe the axon relay's device→host transfer characteristics.

Questions the quantized-transfer design (VERDICT r4 item 2) needs answered:
1. bytes/s for f32 vs f16 vs int16 vs int8 downloads (is the relay
   byte-bound or per-transfer-bound?),
2. does downloading two arrays from two host threads pipeline the relay
   round trips (compute/download overlap design),
3. per-call fixed cost at small sizes.

    python perf/relay_transfer_probe.py
"""

from __future__ import annotations

import json
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    shapes = {
        "chunk_f32": ((24, 278, 260), jnp.float32),     # one month chunk (mean)
        "chunk_f16": ((24, 278, 260), jnp.float16),
        "chunk_i16": ((24, 278, 260), jnp.int16),
        "chunk_i8": ((24, 278, 260), jnp.int8),
        "small_f32": ((64, 64), jnp.float32),
    }
    dev = {}
    for name, (shape, dt) in shapes.items():
        if jnp.issubdtype(dt, jnp.integer):
            a = jnp.ones(shape, dt)
        else:
            a = jnp.asarray(np.random.default_rng(0).normal(size=shape), dt)
        dev[name] = jax.block_until_ready(a * 1)

    out = {}
    for name, arr in dev.items():
        # warm
        np.asarray(arr)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(arr)
            ts.append(time.perf_counter() - t0)
        t = float(np.median(ts))
        out[name] = {
            "mb": round(arr.nbytes / 1e6, 2),
            "s": round(t, 3),
            "mb_per_s": round(arr.nbytes / 1e6 / t, 1),
        }
        print(name, out[name], flush=True)

    # threaded overlap: 8 chunk_f16 downloads on 1 vs 2 vs 4 threads
    arrs = [jax.block_until_ready(dev["chunk_f16"] + i) for i in range(8)]
    for nt in (1, 2, 4):
        with ThreadPoolExecutor(nt) as ex:
            t0 = time.perf_counter()
            list(ex.map(np.asarray, arrs))
            t = time.perf_counter() - t0
        mb = sum(a.nbytes for a in arrs) / 1e6
        out[f"threads_{nt}"] = {"mb": round(mb, 1), "s": round(t, 3),
                                "mb_per_s": round(mb / t, 1)}
        print(f"threads_{nt}", out[f"threads_{nt}"], flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
