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
import jax.numpy as jnp


class UNet(nn.Module):
    """Stride-2 conv U-Net. Input/output: (B, H, W, C) NHWC.

    ``upsample``: "transpose" (ConvTranspose, neuralprocesses-style) or
    "nearest" (2× nearest-neighbour repeat + regular conv) — the latter
    avoids the dilated-input lowering of transpose convs on TPU.
    """

    channels: Sequence[int] = (64, 64, 64, 64)
    out_channels: int = 64
    kernel_size: int = 5
    compute_dtype: jnp.dtype = jnp.float32
    upsample: str = "transpose"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = (self.kernel_size, self.kernel_size)
        dt = self.compute_dtype
        x = x.astype(dt)

        # Stem: mix encoded channels into the working width.
        x = nn.Conv(self.channels[0], (1, 1), dtype=dt, name="stem")(x)

        skips = []
        for i, ch in enumerate(self.channels):
            x = nn.relu(x)
            skips.append(x)
            x = nn.Conv(ch, k, strides=(2, 2), padding="SAME", dtype=dt,
                        name=f"down_{i}")(x)

        x = nn.relu(x)
        x = nn.Conv(self.channels[-1], k, padding="SAME", dtype=dt, name="bottleneck")(x)

        for i, ch in reversed(list(enumerate(self.channels))):
            x = nn.relu(x)
            if self.upsample == "nearest":
                x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
                x = nn.Conv(ch, k, padding="SAME", dtype=dt, name=f"up_{i}")(x)
            else:
                x = nn.ConvTranspose(ch, k, strides=(2, 2), padding="SAME", dtype=dt,
                                     name=f"up_{i}")(x)
            x = jnp.concatenate([x, skips[i]], axis=-1)
            x = nn.relu(x)
            x = nn.Conv(ch, k, padding="SAME", dtype=dt, name=f"up_mix_{i}")(x)

        x = nn.relu(x)
        x = nn.Conv(self.out_channels, (1, 1), dtype=dt, name="head")(x)
        return x.astype(jnp.float32)
