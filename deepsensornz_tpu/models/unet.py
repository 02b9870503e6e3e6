"""U-Net backbone over the internal discretisation grid.

Capability parity with the neuralprocesses U-Net consumed by the reference
(ConvNP kwargs ``unet_channels=(64,)*4``, ``nzdownscale/dataprocess/config.py:
2685-2689``): L stride-2 downsampling conv blocks, mirrored transpose-conv
upsampling with skip concatenation.

TPU-first details:

- NHWC layout throughout (XLA's native conv layout on TPU),
- compute dtype is configurable (bfloat16 by default on TPU — convs hit the
  MXU at 2× the f32 rate) with f32 parameters,
- all control flow static; input H/W must be divisible by ``2**len(channels)``
  (guaranteed by :func:`deepsensornz_tpu.ops.grids.internal_grid`).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def _subpixel_up(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray) -> jnp.ndarray:
    """ConvTranspose(k odd, stride 2, SAME) as ONE small conv + depth-to-space.

    Exact reparameterisation (verified bit-level in f32 against
    ``lax.conv_transpose``): splitting the kernel by output parity gives a
    ⌈k/2⌉-tap conv producing all 4 sub-pixels as channels. MEASURED VERDICT
    (docs/perf_unet.md): XLA/Mosaic does NOT pay the naive dilated-input
    dilution — op-for-op this runs at ConvTranspose speed (11.9 vs 11.4 ms
    at the flagship shape) and in fusion context it is slower (the
    depth-to-space interleave breaks fusion), so ``upsample="transpose"``
    stays the default and this path is a checkpoint-compatible option.

    Derivation: out[Y] = Σ_dy x[(Y+dy−P)/2]·W[dy] with P = (k+1)//2 for
    SAME (taps where the dilated index lands on a real input pixel; P
    verified numerically for k ∈ {3,5,7}); parity p = Y mod 2 selects
    dy ≡ (P−p) (mod 2).
    """
    import numpy as np

    k = kernel.shape[0]
    cin, cout = kernel.shape[2], kernel.shape[3]
    P = (k + 1) // 2
    offs = {
        p: [(d, (p + d - P) // 2) for d in range(k) if (p + d - P) % 2 == 0]
        for p in (0, 1)
    }
    omin = min(o for v in offs.values() for _, o in v)
    omax = max(o for v in offs.values() for _, o in v)
    m = omax - omin + 1
    # constant one-hot map (k,k → m,m,2,2): ONE einsum rearranges the
    # stored ConvTranspose kernel into the parity-split form (a loop of
    # scatters here measurably slowed the whole cycle)
    sel = np.zeros((k, k, m, m, 2, 2), kernel.dtype)
    for p in (0, 1):
        for q in (0, 1):
            for dy, oy in offs[p]:
                for dx, ox in offs[q]:
                    sel[dy, dx, oy - omin, ox - omin, p, q] = 1.0
    w4 = jnp.einsum("yxio,yxabpq->abipqo", kernel, jnp.asarray(sel))
    w4 = w4.reshape(m, m, cin, 4 * cout)
    y = jax.lax.conv_general_dilated(
        x, w4.astype(x.dtype), (1, 1),
        ((-omin, omax), (-omin, omax)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    B, H, W, _ = y.shape
    y = y.reshape(B, H, W, 2, 2, cout).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(B, 2 * H, 2 * W, cout) + bias.astype(y.dtype)


def _s2d_down(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray) -> jnp.ndarray:
    """Stride-2 k×k SAME conv as space-to-depth + ONE dense stride-1 conv.

    Exact reparameterisation (the input-parity mirror of
    :func:`_subpixel_up`): out[Y] = Σ_d x[2Y+d−P]·W[d] with P = k//2 for
    lax SAME stride-2. Packing input pixels 2×2 into channels
    (u[Z] = x[2Z..2Z+1], 4·Cin channels) turns every tap into a packed
    offset o = ⌊(d−P+p̄)/2⌋ with parity p — a ⌈k/2⌉-tap DENSE conv at 4×
    input channels. The point on TPU: the strided conv's input access
    pattern defeats Mosaic's lane packing (measured 16–20 % of peak at the
    flagship shape, docs/perf_unet.md); the packed form reads dense rows at
    4× the channel depth, the textbook TPU counterpart of the subpixel
    up-conv trick.
    """
    import numpy as np

    k = kernel.shape[0]
    cin, cout = kernel.shape[2], kernel.shape[3]
    # lax SAME stride-2 pad_low = (k−2)//2 for even H (pad_total = k−2 split
    # low-first; verified bit-level against nn.Conv for k ∈ {3,5,7})
    P = (k - 2) // 2
    # tap d at parity p lands on packed offset o where 2o + p = d − P + P%2…
    # derive directly: input index i = 2Y + d − P = 2(Y+o) + p
    offs = {}
    for d in range(k):
        rel = d - P
        p = rel % 2
        o = (rel - p) // 2
        offs[d] = (o, p)
    omin = min(o for o, _ in offs.values())
    omax = max(o for o, _ in offs.values())
    m = omax - omin + 1
    # constant one-hot map (k,k → m,m,2,2): one einsum rearranges the stored
    # strided kernel into the packed form (same style as _subpixel_up)
    sel = np.zeros((k, k, m, m, 2, 2), kernel.dtype)
    for dy in range(k):
        for dx in range(k):
            oy, py = offs[dy]
            ox, px = offs[dx]
            sel[dy, dx, oy - omin, ox - omin, py, px] = 1.0
    # packed kernel: (m, m, 2, 2, cin, cout) → (m, m, 4·cin, cout) with the
    # channel blocks ordered (py, px, c) to match the space-to-depth reshape
    wp = jnp.einsum("yxio,yxabpq->abpqio", kernel, jnp.asarray(sel))
    wp = wp.reshape(m, m, 4 * cin, cout)
    B, H, W, C = x.shape
    u = x.reshape(B, H // 2, 2, W // 2, 2, C).transpose(0, 1, 3, 2, 4, 5)
    u = u.reshape(B, H // 2, W // 2, 4 * C)
    y = jax.lax.conv_general_dilated(
        u, wp.astype(x.dtype), (1, 1),
        ((-omin, omax), (-omin, omax)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + bias.astype(y.dtype)


class _S2DDown(nn.Module):
    """Drop-in nn.Conv(features, k, s2, SAME) with IDENTICAL parameter
    names/shapes (kernel (k,k,Cin,Cout) + bias) — checkpoints trained with
    either lowering load into the other."""

    features: int
    kernel_size: int = 5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (k, k, x.shape[-1], self.features), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return _s2d_down(x.astype(self.dtype), kernel.astype(self.dtype), bias)


class _SubpixelUp(nn.Module):
    """Drop-in ConvTranspose(features, k, s2, SAME) with IDENTICAL parameter
    names/shapes (kernel (k,k,Cin,Cout) + bias) — checkpoints trained with
    either lowering load into the other."""

    features: int
    kernel_size: int = 5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (k, k, x.shape[-1], self.features), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return _subpixel_up(x.astype(self.dtype), kernel.astype(self.dtype), bias)


class UNet(nn.Module):
    """Stride-2 conv U-Net. Input/output: (B, H, W, C) NHWC.

    ``upsample``: "transpose" (default — ConvTranspose,
    neuralprocesses-style; measured fastest in-model, docs/perf_unet.md),
    "subpixel" (the exact same math via parity-split kernels,
    checkpoint-compatible both ways, measured slower in fusion context),
    or "nearest" (2× repeat + conv — a different model, kept for parity
    experiments).
    """

    channels: Sequence[int] = (64, 64, 64, 64)
    out_channels: int = 64
    kernel_size: int = 5
    compute_dtype: jnp.dtype = jnp.float32
    upsample: str = "transpose"
    # Down-path lowering: "strided" (nn.Conv stride 2) or "s2d"
    # (space-to-depth + dense conv — exact same math, checkpoint-compatible
    # both ways; see _s2d_down for the TPU rationale + measured verdict)
    downsample: str = "strided"
    # Kernel size for the LEVEL-0 (full-resolution) down/up/mix convs only.
    # The full-res level carries ~75% of the U-Net FLOPs at 608² and its mix
    # conv is already at the 64-lane MXU ceiling, so shrinking only this
    # level's taps (5→3) is the highest-leverage model knob; deeper levels
    # keep the reference receptive field. None = kernel_size everywhere.
    top_kernel: int | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        def ksz(level: int) -> tuple:
            k = (self.top_kernel if (level == 0 and self.top_kernel is not None)
                 else self.kernel_size)
            return (k, k)

        dt = self.compute_dtype
        x = x.astype(dt)

        # Stem: mix encoded channels into the working width.
        x = nn.Conv(self.channels[0], (1, 1), dtype=dt, name="stem")(x)

        skips = []
        for i, ch in enumerate(self.channels):
            x = nn.relu(x)
            skips.append(x)
            if self.downsample == "s2d":
                x = _S2DDown(ch, ksz(i)[0], dtype=dt, name=f"down_{i}")(x)
            else:
                x = nn.Conv(ch, ksz(i), strides=(2, 2), padding="SAME", dtype=dt,
                            name=f"down_{i}")(x)

        x = nn.relu(x)
        x = nn.Conv(self.channels[-1], ksz(len(self.channels)), padding="SAME",
                    dtype=dt, name="bottleneck")(x)

        for i, ch in reversed(list(enumerate(self.channels))):
            x = nn.relu(x)
            if self.upsample == "nearest":
                x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
                x = nn.Conv(ch, ksz(i), padding="SAME", dtype=dt, name=f"up_{i}")(x)
            elif self.upsample == "subpixel":
                x = _SubpixelUp(ch, ksz(i)[0], dtype=dt, name=f"up_{i}")(x)
            else:
                x = nn.ConvTranspose(ch, ksz(i), strides=(2, 2), padding="SAME",
                                     dtype=dt, name=f"up_{i}")(x)
            x = jnp.concatenate([x, skips[i]], axis=-1)
            x = nn.relu(x)
            x = nn.Conv(ch, ksz(i), padding="SAME", dtype=dt, name=f"up_mix_{i}")(x)

        x = nn.relu(x)
        x = nn.Conv(self.out_channels, (1, 1), dtype=dt, name="head")(x)
        return x.astype(jnp.float32)
