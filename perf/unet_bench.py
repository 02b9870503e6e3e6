"""U-Net op-level microbenchmark on the TPU (round-2 perf attack).

The flagship cycle is dominated by the U-Net on the 608² internal grid
(~100 ms of the 128 ms cycle at B=24, round-1 finding). This bench times
the candidate formulations of the hot ops so the model lowering can follow
the numbers:

- conv_transpose k5 s2 (current up-path) vs the sub-pixel equivalent
  (k3 conv to 4·C channels + depth-to-space — same math, no input dilation),
- stride-2 k5 down conv vs space-to-depth + k3 conv,
- full-res k5 mix conv (128→64) — the single biggest FLOPs block,
- whole-U-Net forward at (64,)×4 and (128,)×4.

Timing per CLAUDE.md: fetch a scalar computed IN the jitted graph (sync
through the relay is unreliable); inputs stay device-resident.
"""

import json
import time

import numpy as np


def _timeit(fn, *args, reps=7):
    import jax.numpy as jnp

    out = fn(*args)
    float(np.asarray(out))  # compile + settle
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(np.asarray(out))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main(B=24, H=304, C=64):
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    rng = np.random.default_rng(0)
    key = jax.random.key(0)
    x_lo = jnp.asarray(rng.normal(size=(B, H, H, C)).astype(np.float32), jnp.bfloat16)
    x_hi = jnp.asarray(rng.normal(size=(B, 2 * H, 2 * H, C)).astype(np.float32), jnp.bfloat16)
    x_cat = jnp.asarray(rng.normal(size=(B, 2 * H, 2 * H, 2 * C)).astype(np.float32), jnp.bfloat16)

    results = {}

    def bench_module(name, mod, x):
        params = mod.init(key, x)
        f = jax.jit(lambda p, x: jnp.sum(mod.apply(p, x).astype(jnp.float32)))
        results[name] = _timeit(f, params, x)
        print(f"{name}: {results[name]*1e3:.1f} ms", flush=True)

    dt = jnp.bfloat16
    # --- up-path candidates: 304² -> 608², 64 -> 64 ------------------------
    bench_module("convT_k5_s2", nn.ConvTranspose(C, (5, 5), strides=(2, 2),
                                                 padding="SAME", dtype=dt), x_lo)

    class SubPixel(nn.Module):
        @nn.compact
        def __call__(self, x):
            y = nn.Conv(4 * C, (3, 3), padding="SAME", dtype=dt)(x)
            b, h, w, c4 = y.shape
            y = y.reshape(b, h, w, 2, 2, C)
            y = y.transpose(0, 1, 3, 2, 4, 5)
            return y.reshape(b, 2 * h, 2 * w, C)

    bench_module("subpixel_k3_4C", SubPixel(), x_lo)

    class NearestUp(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
            return nn.Conv(C, (5, 5), padding="SAME", dtype=dt)(x)

    bench_module("nearest_k5", NearestUp(), x_lo)

    # --- down-path candidates: 608² -> 304² ---------------------------------
    bench_module("conv_k5_s2", nn.Conv(C, (5, 5), strides=(2, 2),
                                       padding="SAME", dtype=dt), x_hi)

    class S2DDown(nn.Module):
        @nn.compact
        def __call__(self, x):
            b, h, w, c = x.shape
            x = x.reshape(b, h // 2, 2, w // 2, 2, c)
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
            return nn.Conv(C, (3, 3), padding="SAME", dtype=dt)(x)

    bench_module("s2d_k3_down", S2DDown(), x_hi)

    # --- full-res mix conv (the biggest single block) -----------------------
    bench_module("mix_k5_128to64_608sq", nn.Conv(C, (5, 5), padding="SAME", dtype=dt), x_cat)
    bench_module("mix_k3_128to64_608sq", nn.Conv(C, (3, 3), padding="SAME", dtype=dt), x_cat)

    # --- whole U-Net at (64,)x4 and (128,)x4 --------------------------------
    from deepsensornz_tpu.models.unet import UNet

    x_in = jnp.asarray(rng.normal(size=(B, 2 * H, 2 * H, 12)).astype(np.float32))
    for name, ch, up in [
        ("unet64_transpose", (64,) * 4, "transpose"),
        ("unet128_transpose", (128,) * 4, "transpose"),
    ]:
        mod = UNet(channels=ch, out_channels=64, kernel_size=5,
                   compute_dtype=jnp.bfloat16, upsample=up)
        bench_module(name, mod, x_in)

    print(json.dumps({k: round(v * 1e3, 2) for k, v in results.items()}))
    return results


if __name__ == "__main__":
    main()
