"""U-Net op-level microbenchmark on the TPU (round-2 perf attack).

The flagship cycle is dominated by the U-Net on the 608² internal grid.
This bench times candidate formulations of the hot ops so the model
lowering can follow the numbers.

Timing method: each op runs K times INSIDE one jitted program via
``lax.fori_loop`` with a data dependency between iterations (output summed
into a scalar carried forward), so one host fetch covers K executions and
the ~30 ms relay round trip (CLAUDE.md) amortises to noise. A K=0 "empty"
program measures the residual per-call overhead, which is subtracted.
"""

import json
import time

import numpy as np

K_INNER = 8


def _timeit_ingraph(make_apply, params, x, reps=5):
    """Median per-execution device time of ``make_apply(params, x)``.

    The op output is reduced to a scalar and added to a tiny perturbation of
    the input's first element each iteration, forcing sequential execution.
    """
    import jax
    import jax.numpy as jnp

    def body(fn, k):
        def run(p, x):
            def it(i, carry):
                s, xx = carry
                y = fn(p, xx)
                s = s + jnp.sum(y).astype(jnp.float32)
                # tie the next iteration to this one (defeat CSE/DCE) with a
                # scalar-only update — no extra memory traffic
                xx = jax.tree.map(lambda a: a + (s * 1e-30).astype(a.dtype), xx)
                return s, xx

            s, _ = jax.lax.fori_loop(0, k, it, (jnp.float32(0.0), x))
            return s

        return jax.jit(run)

    fK = body(make_apply, K_INNER)
    f0 = body(make_apply, 0)
    float(np.asarray(fK(params, x)))  # compile
    float(np.asarray(f0(params, x)))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(fK(params, x)))
        tK = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(np.asarray(f0(params, x)))
        t0 = time.perf_counter() - t0
        ts.append((tK - t0) / K_INNER)
    return float(np.median(ts))


# -- shared candidate modules (also used by perf/downconv_bench.py) ----------

def down_ctx_module(C, dt, mode: str):
    """relu → stride-2-k5 down conv (the U-Net's actual fusion context),
    either as the strided original or the space-to-depth lowering."""
    from flax import linen as nn

    from deepsensornz_tpu.models.unet import _S2DDown

    class DownCtx(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.relu(x)
            if mode == "s2d":
                return _S2DDown(C, 5, dtype=dt)(x)
            return nn.Conv(C, (5, 5), strides=(2, 2), padding="SAME", dtype=dt)(x)

    return DownCtx()


def mix_grouped_module(C, dt):
    """Batch-in-lanes probe for the 64-out-channel convs: a PAIR of batch
    items' outputs in the 128 lanes via feature_group_count=2
    (block-diagonal weights). Same total work as the full-batch mix conv —
    compare raw ms directly."""
    from flax import linen as nn

    class MixGrouped(nn.Module):
        @nn.compact
        def __call__(self, x):  # x: (B/2, H, W, 2·2C) = two items' channels
            return nn.Conv(2 * C, (5, 5), padding="SAME", dtype=dt,
                           feature_group_count=2)(x)

    return MixGrouped()


def pack_batch_pairs(x_cat, B, H, C):
    """(B, 2H, 2H, 2C) → (B/2, 2H, 2H, 4C): two batch items' channels
    side by side for the batch-in-lanes probe."""
    import jax.numpy as jnp

    x = x_cat.reshape(B // 2, 2, 2 * H, 2 * H, 2 * C)
    return jnp.moveaxis(x, 1, -2).reshape(B // 2, 2 * H, 2 * H, 4 * C)


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
        results[name] = _timeit_ingraph(mod.apply, params, x)
        print(f"{name}: {results[name]*1e3:.2f} ms", flush=True)

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

    from deepsensornz_tpu.models.unet import _SubpixelUp

    bench_module("subpixel_paritysplit_k5", _SubpixelUp(C, 5, dtype=dt), x_lo)

    # --- up in fusion context: relu -> up -> concat skip -> relu -> mix ----
    class UpMix(nn.Module):
        up: str = "transpose"
        mix_k: int = 5

        @nn.compact
        def __call__(self, lo, skip):
            x = nn.relu(lo)
            if self.up == "transpose":
                x = nn.ConvTranspose(C, (5, 5), strides=(2, 2), padding="SAME",
                                     dtype=dt)(x)
            else:
                x = _SubpixelUp(C, 5, dtype=dt)(x)
            x = jnp.concatenate([x, skip], axis=-1)
            x = nn.relu(x)
            return nn.Conv(C, (self.mix_k, self.mix_k), padding="SAME", dtype=dt)(x)

    class UpMixSplit(nn.Module):
        """concat+mix as two summed convs: avoids materialising the 2C concat."""

        @nn.compact
        def __call__(self, lo, skip):
            x = nn.relu(lo)
            x = nn.ConvTranspose(C, (5, 5), strides=(2, 2), padding="SAME", dtype=dt)(x)
            a = nn.Conv(C, (5, 5), padding="SAME", dtype=dt)(nn.relu(x))
            b = nn.Conv(C, (5, 5), padding="SAME", use_bias=False, dtype=dt)(nn.relu(skip))
            return a + b

    for name, mod in [
        ("upmix_transpose_k5", UpMix("transpose", 5)),
        ("upmix_subpixel_k5", UpMix("subpixel", 5)),
        ("upmix_transpose_k3mix", UpMix("transpose", 3)),
        ("upmix_split_k5", UpMixSplit()),
    ]:
        params = mod.init(key, x_lo, x_hi)
        results[name] = _timeit_ingraph(
            lambda p, args, _m=mod: _m.apply(p, *args), params, (x_lo, x_hi))
        print(f"{name}: {results[name]*1e3:.2f} ms", flush=True)

    # --- down-path candidates: 608² -> 304² ---------------------------------
    bench_module("conv_k5_s2", nn.Conv(C, (5, 5), strides=(2, 2),
                                       padding="SAME", dtype=dt), x_hi)

    # space-to-depth lowering (round-3): exact reparameterisation — 2×2-pack
    # input → dense ⌈k/2⌉-tap conv at 4×Cin (full 256-lane input depth). The
    # strided original measured 16–20 % of peak; this trades ×1.44 FLOPs for
    # dense access.
    from deepsensornz_tpu.models.unet import _S2DDown

    bench_module("conv_k5_s2_s2d", _S2DDown(C, 5, dtype=dt), x_hi)

    # down in fusion context: relu → down (what the U-Net actually runs)
    bench_module("downctx_strided", down_ctx_module(C, dt, "strided"), x_hi)
    bench_module("downctx_s2d", down_ctx_module(C, dt, "s2d"), x_hi)

    bench_module("mix_k5_batchlanes_group2", mix_grouped_module(C, dt),
                 pack_batch_pairs(x_cat, B, H, C))

    # --- full-res mix conv (the biggest single block) -----------------------
    bench_module("mix_k5_128to64_608sq", nn.Conv(C, (5, 5), padding="SAME", dtype=dt), x_cat)
    bench_module("mix_k3_128to64_608sq", nn.Conv(C, (3, 3), padding="SAME", dtype=dt), x_cat)

    # --- whole U-Net variants ----------------------------------------------
    from deepsensornz_tpu.models.unet import UNet

    x_in = jnp.asarray(rng.normal(size=(B, 2 * H, 2 * H, 12)).astype(np.float32))
    for name, kw in [
        ("unet64_transpose", dict(channels=(64,) * 4, upsample="transpose")),
        ("unet64_subpixel", dict(channels=(64,) * 4, upsample="subpixel")),
        ("unet64_s2d_down", dict(channels=(64,) * 4, downsample="s2d")),
        ("unet128_transpose", dict(channels=(128,) * 4, upsample="transpose")),
    ]:
        mod = UNet(out_channels=64, kernel_size=5, compute_dtype=jnp.bfloat16, **kw)
        bench_module(name, mod, x_in)

    print(json.dumps({k: round(v * 1e3, 3) for k, v in results.items()}))
    return results


if __name__ == "__main__":
    main()
