"""Hardware table: XLA einsum path vs fused Pallas kernels for the SetConv
encode (off-grid points → internal grid) and gridded decode, at three sizes.

Decides the ``use_pallas`` default with measurements (VERDICT round 1 #5).
Sizes bracket the real workloads:

- small:  density 250 grid (304²), 128 stations  (debug/CI-scale)
- flagship: density 500 grid (608²), 512 stations, decode → 592×552 DEM grid
  (the operational ERA5 prediction grid at highres_factor 5)
- large:  density 1000 grid (1216²), 2048 stations (scale-up regime the
  round-1 kernel could not reach — full point set per program)

Timing: in-graph fori_loop (one fetch per K executions — the ~30 ms relay
round trip amortises out; CLAUDE.md).

Run on the TPU:  python perf/pallas_bench.py
"""

import json
import time

import numpy as np

K_INNER = 8


def _time(fn, args, reps=5):
    import jax
    import jax.numpy as jnp

    def run_k(k):
        def run(*a):
            def it(i, carry):
                s, ls = carry
                y = fn(*a[:-1], ls)
                s = s + jnp.sum(y).astype(jnp.float32)
                ls = ls + s * 1e-30   # scalar-only dependency between iters
                return s, ls

            s, _ = jax.lax.fori_loop(0, k, it, (jnp.float32(0.0), a[-1]))
            return s

        return jax.jit(run)

    fK, f0 = run_k(K_INNER), run_k(0)
    float(np.asarray(fK(*args)))
    float(np.asarray(f0(*args)))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(fK(*args)))
        tK = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(np.asarray(f0(*args)))
        ts.append((tK - (time.perf_counter() - t0)) / K_INNER)
    return float(np.median(ts))


def main(B=8):
    import jax.numpy as jnp

    from deepsensornz_tpu.ops import setconv as ref
    from deepsensornz_tpu.ops import setconv_pallas as pk
    from deepsensornz_tpu.ops.grids import internal_grid

    rng = np.random.default_rng(0)
    sizes = {
        "small_d250_n128": dict(density=250, n=128, tgt=(296, 276)),
        "flagship_d500_n512": dict(density=500, n=512, tgt=(592, 552)),
        "large_d1000_n2048": dict(density=1000, n=2048, tgt=(1184, 1104)),
    }
    results = {}
    for name, s in sizes.items():
        x1g, x2g = internal_grid((0, 1), (0, 1), s["density"], 0.1, 16)
        x1g, x2g = jnp.asarray(x1g), jnp.asarray(x2g)
        H, W = x1g.shape[0], x2g.shape[0]
        n = s["n"]
        px = jnp.asarray(rng.random((B, n, 2)).astype(np.float32))
        py = jnp.asarray(rng.normal(size=(B, n, 1)).astype(np.float32))
        m = jnp.ones((B, n), jnp.float32)
        ls = jnp.float32(2.0 / s["density"])
        f = jnp.asarray(rng.normal(size=(B, H, W, 64)).astype(np.float32))
        xt1 = jnp.linspace(0.0, 1.0, s["tgt"][0])
        xt2 = jnp.linspace(0.0, 1.0, s["tgt"][1])

        r = {}
        r["encode_xla"] = _time(
            lambda a, b, c, d, e, l: ref.setconv_encode_offgrid(a, b, c, d, e, l),
            (x1g, x2g, px, py, m, ls))
        r["encode_pallas"] = _time(
            lambda a, b, c, d, e, l: pk.encode_offgrid(a, b, c, d, e, l),
            (x1g, x2g, px, py, m, ls))
        r["decode_xla"] = _time(
            lambda a, b, c, d, e, l: ref.setconv_decode_grid(a, b, c, d, e, l),
            (x1g, x2g, f, xt1, xt2, ls))
        r["decode_pallas"] = _time(
            lambda a, b, c, d, e, l: pk.decode_grid(a, b, c, d, e, l),
            (x1g, x2g, f, xt1, xt2, ls))
        results[name] = {k: round(v * 1e3, 3) for k, v in r.items()}
        print(name, json.dumps(results[name]), flush=True)

    print(json.dumps({"metric": "setconv_xla_vs_pallas_ms", "batch": B,
                      "sizes": results}))
    return results


if __name__ == "__main__":
    main()
