"""Width-pair lane-packing microbench (round-4 perf attack, VERDICT item 1).

Candidates vs shipped baselines at the flagship shapes (B=24, 608² full-res
level, 64 channels, k5, bf16). Protocol: in-graph fori_loop (K=8) minus the
empty-loop control — see perf/unet_bench.py / CLAUDE.md MICROBENCH RULE.

Hypothesis being tested: the round-3 s2d rejection was caused by the OUTPUT
lanes staying at 64, not by packing per se. The packed-W forms fill both
input and output lanes (128) at only ×1.2 (mix) / ×1.6 (down) dense FLOPs,
and the domain change is an address-preserving reshape (zero data movement).
"""

import json
import time

import numpy as np

import sys
sys.path.insert(0, "/root/repo")
from perf.unet_bench import _timeit_ingraph  # noqa: E402


def main(B=24, H=304, C=64):
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from deepsensornz_tpu.models.unet import UNet, _PackWConv, _PackWDown

    rng = np.random.default_rng(0)
    key = jax.random.key(0)
    dt = jnp.bfloat16
    x_hi = jnp.asarray(rng.normal(size=(B, 2 * H, 2 * H, C)).astype(np.float32), dt)
    x_cat = jnp.asarray(rng.normal(size=(B, 2 * H, 2 * H, 2 * C)).astype(np.float32), dt)
    x_lo = jnp.asarray(rng.normal(size=(B, H, H, C)).astype(np.float32), dt)

    results = {}

    def bench_module(name, mod, x):
        params = mod.init(key, x)
        results[name] = _timeit_ingraph(mod.apply, params, x)
        print(f"{name}: {results[name]*1e3:.2f} ms", flush=True)

    # --- full-res mix conv: 608², 128 -> 64, k5 (the dominant op) ----------
    bench_module("mix_k5_128to64_608sq", nn.Conv(C, (5, 5), padding="SAME", dtype=dt), x_cat)
    bench_module("mix_k5_packw_608sq", _PackWConv(C, 5, dtype=dt), x_cat)
    # second-level mix: 304², 128 -> 64
    x_cat_lo = jnp.asarray(rng.normal(size=(B, H, H, 2 * C)).astype(np.float32), dt)
    bench_module("mix_k5_128to64_304sq", nn.Conv(C, (5, 5), padding="SAME", dtype=dt), x_cat_lo)
    bench_module("mix_k5_packw_304sq", _PackWConv(C, 5, dtype=dt), x_cat_lo)

    # --- down conv: 608² -> 304², 64 -> 64, k5 ------------------------------
    bench_module("down_k5_s2", nn.Conv(C, (5, 5), strides=(2, 2),
                                       padding="SAME", dtype=dt), x_hi)
    bench_module("down_k5_packw_both", _PackWDown(C, 5, dtype=dt, pack_out=True), x_hi)
    bench_module("down_k5_packw_in", _PackWDown(C, 5, dtype=dt, pack_out=False), x_hi)

    # --- fusion context: relu -> up -> concat -> relu -> mix ----------------
    class UpMix(nn.Module):
        packw: bool = False

        @nn.compact
        def __call__(self, lo, skip):
            x = nn.relu(lo)
            x = nn.ConvTranspose(C, (5, 5), strides=(2, 2), padding="SAME",
                                 dtype=dt)(x)
            x = jnp.concatenate([x, skip], axis=-1)
            x = nn.relu(x)
            if self.packw:
                return _PackWConv(C, 5, dtype=dt)(x)
            return nn.Conv(C, (5, 5), padding="SAME", dtype=dt)(x)

    for name, mod in [("upmix_transpose_k5", UpMix(False)),
                      ("upmix_transpose_k5_packw", UpMix(True))]:
        params = mod.init(key, x_lo, x_hi)
        results[name] = _timeit_ingraph(
            lambda p, args, _m=mod: _m.apply(p, *args), params, (x_lo, x_hi))
        print(f"{name}: {results[name]*1e3:.2f} ms", flush=True)

    # --- whole U-Net variants ----------------------------------------------
    x_in = jnp.asarray(rng.normal(size=(B, 2 * H, 2 * H, 12)).astype(np.float32))
    for name, kw in [
        ("unet64_default", dict()),
        ("unet64_lanepack", dict(lane_pack=True)),
        ("unet64_lanepack_packwdown", dict(lane_pack=True, downsample="packw")),
    ]:
        mod = UNet(channels=(64,) * 4, out_channels=64, kernel_size=5,
                   compute_dtype=jnp.bfloat16, **kw)
        bench_module(name, mod, x_in)

    print(json.dumps({k: round(v * 1e3, 3) for k, v in results.items()}))
    return results


if __name__ == "__main__":
    main()
