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
from jax.ad_checkpoint import checkpoint_name as _ckpt_name


def _tag(x: jnp.ndarray) -> jnp.ndarray:
    """Tag a per-level activation for selective rematerialisation
    (``ConvNPConfig.remat_policy="acts"``). Identity outside remat."""
    return _ckpt_name(x, "unet_act")


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


def _packw_sel(k: int, P: int, stride: int, out_pack: int):
    """Tap map for width-pair lane packing: original tap dx at packed-output
    parity p reads packed-input parity q at packed offset o.

    Input columns are packed in pairs (j = 2V + q); output columns in
    groups of ``out_pack`` (Y = out_pack·Z + p). For output Y, tap dx reads
    input j = stride·Y + dx − P. Returns (offsets_min, offsets_max, entries)
    with entries = [(dx, o, q, p)].
    """
    entries = []
    for p in range(out_pack):
        for dx in range(k):
            rel = stride * p + dx - P
            q = rel % 2
            o = (rel - q) // 2
            entries.append((dx, o, q, p))
    omin = min(o for _, o, _, _ in entries)
    omax = max(o for _, o, _, _ in entries)
    return omin, omax, entries


def _packw_kernel(kernel: jnp.ndarray, P: int, stride: int, out_pack: int) -> tuple:
    """Rearrange a (kh, kw, Cin, Cout) kernel into the width-packed form
    (kh, m, 2·Cin, out_pack·Cout) via ONE constant one-hot einsum (same
    style as :func:`_subpixel_up`). Returns (packed_kernel, omin, omax)."""
    import numpy as np

    kh, kw, cin, cout = kernel.shape
    omin, omax, entries = _packw_sel(kw, P, stride, out_pack)
    m = omax - omin + 1
    sel = np.zeros((kw, m, 2, out_pack), np.float32)
    for dx, o, q, p in entries:
        sel[dx, o - omin, q, p] = 1.0
    wp = jnp.einsum("yxio,xaqp->yaqipo", kernel, jnp.asarray(sel, kernel.dtype))
    return wp.reshape(kh, m, 2 * cin, out_pack * cout), omin, omax


def _packw_kernel_multi(kernel: jnp.ndarray, P: int, stride: int,
                        out_pack: int, in_splits) -> tuple:
    """:func:`_packw_kernel` for an input that is a CONCATENATION of packed
    sources (the U-Net skip concat): packed channel layout is source-major
    ``[s0(q0), s0(q1), s1(q0), s1(q1), …]`` for sources of ``in_splits``
    channels each, while the stored dense kernel orders input channels
    source-major unpacked ``[s0_c, s1_c, …]``. Transform each source block
    independently and concatenate along the packed input-channel axis."""
    parts, start = [], 0
    omin = omax = 0
    for c in in_splits:
        wk, omin, omax = _packw_kernel(kernel[:, :, start:start + c, :],
                                       P, stride, out_pack)
        parts.append(wk)
        start += c
    return jnp.concatenate(parts, axis=2), omin, omax


def _packw_mix_packed(u: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
                      in_splits=None) -> jnp.ndarray:
    """Stride-1 odd-k SAME conv on an ALREADY width-packed tensor
    (B, H, W/2, 2·Cin) → (B, H, W/2, 2·Cout): the packed-domain workhorse —
    no reshapes at all, both MXU lane sides full at ×1.2 dense FLOPs (k=5).
    ``in_splits`` handles concat-of-packed-sources inputs (see
    :func:`_packw_kernel_multi`)."""
    kh, kw, cin, cout = kernel.shape
    if in_splits is None:
        wp, omin, omax = _packw_kernel(kernel, kw // 2, 1, 2)
    else:
        wp, omin, omax = _packw_kernel_multi(kernel, kw // 2, 1, 2, in_splits)
    y = jax.lax.conv_general_dilated(
        u, wp.astype(u.dtype), (1, 1),
        ((kh // 2, kh - 1 - kh // 2), (-omin, omax)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    # packed output channels are (parity, c) blocks → bias tiles twice
    return y + jnp.tile(bias, 2).astype(y.dtype)


def _packw_mix(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray) -> jnp.ndarray:
    """Stride-1 odd-k SAME conv with width-pairs packed into MXU lanes.

    THE lane-packing lowering for the 64-channel flagship (VERDICT r3 §next
    item 1): in row-major NHWC, (B,H,W,C) → (B,H,W/2,2C) is an
    address-preserving relabel — element (w,c) lands at w·C+c = (w//2)·2C +
    (w%2)·C + c — so packing costs ZERO data movement in row-major terms.
    The k-tap conv becomes an exact (kh, ⌈k/2⌉+…, 2Cin, 2Cout) conv: for
    k=5 that is 3 packed taps → ×1.2 dense FLOPs with BOTH input and output
    lanes full (128), vs ×1.44 for s2d (which also left Cout=64
    half-filling the output lanes). Requires W even.

    MEASURED VERDICT (perf/lanepack_bench.py, v5e): isolated the packed op
    WINS (45.1→40.2 ms at the flagship 608²×128 mix shape) but the TPU's
    tiled layout makes the in/out reshapes real relayouts in fusion
    context (whole U-Net 90.0→121.0 ms) — so per-op packing loses, and the
    shipping form is the PACKED-DOMAIN pipeline (``lane_pack="domain"``):
    pack once after the stem, run every level op packed
    (:func:`_packw_mix_packed` / :func:`_packw_down_packed` /
    :func:`_packw_convT_packed`), unpack once before the head.

    Exactness: packed padding of 1 column = 2 original zero columns = the
    original SAME padding for k=5; verified bit-level in f32 against
    ``nn.Conv`` in tests/test_convnp.py.
    """
    B, H, W, C = x.shape
    u = x.reshape(B, H, W // 2, 2 * C)
    y = _packw_mix_packed(u, kernel, bias)
    return y.reshape(B, H, W, kernel.shape[-1])


def _packw_down_packed(u: jnp.ndarray, kernel: jnp.ndarray,
                       bias: jnp.ndarray) -> jnp.ndarray:
    """Stride-2 k×k SAME conv, packed input AND packed output
    (B, H, W/2, 2·Cin) → (B, H/2, W/4, 2·Cout): H keeps the ordinary
    stride-2 window; along W the conv strides 2 PACKED columns per packed
    output column (= 4 original columns for the 2 outputs it carries).
    Kernel (kh, 4, 2Cin, 2Cout): full 128 lanes both sides, ×1.6 dense
    FLOPs for k=5. Exact (pad_low = (k−2)//2 matches lax SAME stride-2 for
    even W, see :func:`_s2d_down`)."""
    kh, kw, cin, cout = kernel.shape
    # output Y at stride 2 reads j = 2·(2·Z + p) + dx − P
    wp, omin, omax = _packw_kernel(kernel, (kw - 2) // 2, 2, 2)
    Ph = (kh - 2) // 2
    y = jax.lax.conv_general_dilated(
        u, wp.astype(u.dtype), (2, 2),
        ((Ph, kh - 2 - Ph), (-omin, omax)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + jnp.tile(bias, 2).astype(y.dtype)


def _packw_down(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
                pack_out: bool = True) -> jnp.ndarray:
    """Stride-2 k×k SAME conv with width-pairs packed into lanes.

    With ``pack_out`` the output is also width-packed (see
    :func:`_packw_down_packed`); without, output stays unpacked (kernel
    (kh, 3, 2Cin, Cout), ×1.2 FLOPs, 64 output lanes). Both exact."""
    B, H, W, C = x.shape
    u = x.reshape(B, H, W // 2, 2 * C)
    if pack_out:
        y = _packw_down_packed(u, kernel, bias)
        return y.reshape(B, H // 2, W // 2, kernel.shape[-1])
    kh, kw, cin, cout = kernel.shape
    wp, omin, omax = _packw_kernel(kernel, (kw - 2) // 2, 2, 1)
    Ph = (kh - 2) // 2
    y = jax.lax.conv_general_dilated(
        u, wp.astype(x.dtype), (2, 1),
        ((Ph, kh - 2 - Ph), (-omin, omax)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + bias.astype(y.dtype)


def _packw_convT_kernel(kernel: jnp.ndarray) -> tuple:
    """Transform a (k, k, Cin, Cout) ConvTranspose kernel into the
    packed-width form (k, m, 2·Cin, 2·Cout) for a conv with
    ``lhs_dilation=(2, 2)`` over the packed tensor.

    Derivation (W axis; H stays the ordinary dilated-transpose axis):
    out[Y=2Z+p] = Σ_dx x[(Y+dx−P)/2]·W[dx], P=(k+1)//2, taps with
    (p+dx−P) even (the verified flax SAME stride-2 semantics, see
    :func:`_subpixel_up`). With rel=(p+dx−P)/2 the original input column is
    x_i = Z+rel, whose packed parity q = (Z+rel) mod 2 DEPENDS on Z — not
    shift-invariant over packed columns. The dilated form restores
    invariance: the packed input dilated along W has real columns only at
    even positions, so the two kernel entries (q=0 at tap rel) and
    (q=1 at tap rel−1) are structurally gated to complementary Z parities —
    exactly one fires per output column, each reading the right original
    column. No depth-to-space interleave anywhere: the packed output comes
    straight out of ONE conv_general_dilated.
    """
    import numpy as np

    k = kernel.shape[0]
    cin, cout = kernel.shape[2], kernel.shape[3]
    P = (k + 1) // 2
    entries = []  # (dx, t, q, p)
    for p in (0, 1):
        for dx in range(k):
            if (p + dx - P) % 2:
                continue
            rel = (p + dx - P) // 2
            entries.append((dx, rel, 0, p))
            entries.append((dx, rel - 1, 1, p))
    tmin = min(t for _, t, _, _ in entries)
    tmax = max(t for _, t, _, _ in entries)
    m = tmax - tmin + 1
    sel = np.zeros((k, m, 2, 2), np.float32)
    for dx, t, q, p in entries:
        sel[dx, t - tmin, q, p] = 1.0
    wp = jnp.einsum("yxio,xtqp->ytqipo", kernel,
                    jnp.asarray(sel, kernel.dtype))
    return wp.reshape(k, m, 2 * cin, 2 * cout), -tmin, m


def _packw_convT_packed(u: jnp.ndarray, kernel: jnp.ndarray,
                        bias: jnp.ndarray) -> jnp.ndarray:
    """ConvTranspose(k odd, stride 2, SAME) on a width-packed tensor,
    packed in AND packed out: (B, H, W/2, 2·Cin) → (B, 2H, W, 2·Cout)
    (packed representation of the (B, 2H, 2W, Cout) upsample). ONE
    ``conv_general_dilated`` with ``lhs_dilation=(2, 2)``; the H axis uses
    the standard dilated-transpose identity (pad (P, k−P), kernel taps in
    stored order), the W axis the parity-gated packed kernel
    (:func:`_packw_convT_kernel`). Bit-exact vs ``nn.ConvTranspose``
    (tests/test_convnp.py)."""
    kh = kernel.shape[0]
    P = (kh + 1) // 2
    wp, plw, m = _packw_convT_kernel(kernel)
    y = jax.lax.conv_general_dilated(
        u, wp.astype(u.dtype), (1, 1),
        ((P, kh - P), (plw, m - plw)),
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + jnp.tile(bias, 2).astype(y.dtype)


class _PackWConv(nn.Module):
    """Drop-in nn.Conv(features, (k,k), SAME, stride 1) computed in the
    width-packed lane domain — IDENTICAL parameter names/shapes, so
    checkpoints trained with either lowering load into the other.
    ``packed_io`` takes/returns already-packed tensors (the packed-domain
    pipeline); ``in_splits`` declares a concat-of-packed-sources input."""

    features: int
    kernel_size: int = 5
    dtype: jnp.dtype = jnp.float32
    packed_io: bool = False
    in_splits: tuple | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        cin = x.shape[-1] // 2 if self.packed_io else x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (k, k, cin, self.features), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        if self.packed_io:
            return _packw_mix_packed(x.astype(self.dtype),
                                     kernel.astype(self.dtype), bias,
                                     self.in_splits)
        return _packw_mix(x.astype(self.dtype), kernel.astype(self.dtype), bias)


class _PackWDown(nn.Module):
    """Drop-in nn.Conv(features, (k,k), stride 2, SAME) in the width-packed
    domain (packed input AND packed output) — identical param names/shapes."""

    features: int
    kernel_size: int = 5
    dtype: jnp.dtype = jnp.float32
    pack_out: bool = True
    packed_io: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        cin = x.shape[-1] // 2 if self.packed_io else x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (k, k, cin, self.features), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        if self.packed_io:
            return _packw_down_packed(x.astype(self.dtype),
                                      kernel.astype(self.dtype), bias)
        return _packw_down(x.astype(self.dtype), kernel.astype(self.dtype), bias,
                           self.pack_out)


class _PackWUp(nn.Module):
    """Drop-in nn.ConvTranspose(features, (k,k), stride 2, SAME) in the
    width-packed domain (packed in/out) — identical param names/shapes."""

    features: int
    kernel_size: int = 5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (k, k, x.shape[-1] // 2, self.features), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return _packw_convT_packed(x.astype(self.dtype),
                                   kernel.astype(self.dtype), bias)


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
    # Width-pair lane packing — exact, checkpoint-compatible lowerings:
    #   False     — off (plain nn.Conv graph),
    #   True      — per-op packing of the stride-1 mix convs only (measured
    #               LOSS in-model: the TPU tiled layout makes each op's
    #               pack/unpack reshape a real relayout; kept for benches),
    #   "domain"  — the shipping form: pack ONCE after the stem, run every
    #               level op in the packed domain (_packw_mix_packed /
    #               _packw_down_packed / _packw_convT_packed), unpack ONCE
    #               before the head. Requires every level width divisible
    #               by 4 (grid width divisible by 2^(levels+1); the
    #               flagship 608 qualifies).
    lane_pack: bool | str = False
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

        def mix_conv(features: int, k: int, name: str):
            """Stride-1 SAME conv, lane-packed where the packed form wins."""
            def apply(h):
                if self.lane_pack is True and k >= 5 and h.shape[2] % 2 == 0:
                    return _PackWConv(features, k, dtype=dt, name=name)(h)
                return nn.Conv(features, (k, k), padding="SAME", dtype=dt,
                               name=name)(h)
            return apply

        lane = self.lane_pack
        if lane == "auto":
            # engage the packed domain exactly where it is measured to win:
            # k ≥ 5 at EVERY level (k=3 packs at ×2 dense FLOPs — the
            # top_kernel=3 variant measured slower packed), transpose-conv
            # up path, and widths divisible so every level packs
            lane = "domain" if (
                self.kernel_size >= 5
                and (self.top_kernel is None or self.top_kernel >= 5)
                and self.upsample in ("transpose", "subpixel")
                and x.shape[2] % (2 ** (len(self.channels) + 1)) == 0
            ) else False
        if lane == "domain":
            levels = len(self.channels)
            if x.shape[2] % (2 ** (levels + 1)):
                raise ValueError(
                    f"lane_pack='domain' needs grid width divisible by "
                    f"2^{levels + 1} (= every level width divisible by 4); "
                    f"got {x.shape[2]} — raise the loader's grid_multiple"
                )
            return self._packed_domain(x, ksz, dt)

        # Stem: mix encoded channels into the working width.
        x = nn.Conv(self.channels[0], (1, 1), dtype=dt, name="stem")(x)

        skips = []
        for i, ch in enumerate(self.channels):
            x = nn.relu(x)
            skips.append(x)
            if self.downsample == "s2d":
                x = _S2DDown(ch, ksz(i)[0], dtype=dt, name=f"down_{i}")(x)
            elif self.downsample == "packw" and x.shape[2] % 4 == 0:
                x = _PackWDown(ch, ksz(i)[0], dtype=dt, name=f"down_{i}")(x)
            else:
                x = nn.Conv(ch, ksz(i), strides=(2, 2), padding="SAME", dtype=dt,
                            name=f"down_{i}")(x)
            x = _tag(x)

        x = nn.relu(x)
        x = mix_conv(self.channels[-1], ksz(len(self.channels))[0], "bottleneck")(x)
        x = _tag(x)

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
            x = mix_conv(ch, ksz(i)[0], f"up_mix_{i}")(x)
            x = _tag(x)

        x = nn.relu(x)
        x = nn.Conv(self.out_channels, (1, 1), dtype=dt, name="head")(x)
        return x.astype(jnp.float32)

    def _packed_domain(self, x: jnp.ndarray, ksz, dt) -> jnp.ndarray:
        """The packed-domain U-Net: same parameters, same math, every level
        op computed on width-packed tensors (both MXU lane sides full at 64
        channels). Exactly TWO layout changes in the whole net: pack after
        the stem, unpack before the head — the per-op pack/unpack relayouts
        that sank per-op packing (and round 3's subpixel/s2d lowerings in
        fusion context) do not exist here."""
        if self.upsample == "nearest":
            raise ValueError("lane_pack='domain' supports the transpose-conv "
                             "up path only (nearest is a different model)")

        x = nn.Conv(self.channels[0], (1, 1), dtype=dt, name="stem")(x)
        B, H, W, C = x.shape
        # tag the PACKED stem output: under remat_policy="acts" the backward
        # restarts from here instead of replaying the pack shuffle
        u = _tag(x.reshape(B, H, W // 2, 2 * C))

        skips = []
        for i, ch in enumerate(self.channels):
            u = nn.relu(u)
            skips.append(u)
            u = _tag(_PackWDown(ch, ksz(i)[0], dtype=dt, packed_io=True,
                                name=f"down_{i}")(u))

        u = nn.relu(u)
        u = _tag(_PackWConv(self.channels[-1], ksz(len(self.channels))[0],
                            dtype=dt, packed_io=True, name="bottleneck")(u))

        for i, ch in reversed(list(enumerate(self.channels))):
            u = nn.relu(u)
            u = _PackWUp(ch, ksz(i)[0], dtype=dt, name=f"up_{i}")(u)
            skip_ch = skips[i].shape[-1] // 2
            u = jnp.concatenate([u, skips[i]], axis=-1)
            u = nn.relu(u)
            u = _tag(_PackWConv(ch, ksz(i)[0], dtype=dt, packed_io=True,
                                in_splits=(ch, skip_ch), name=f"up_mix_{i}")(u))

        Bp, Hp, Wp, Cp = u.shape
        x = u.reshape(Bp, Hp, 2 * Wp, Cp // 2)
        x = nn.relu(x)
        x = nn.Conv(self.out_channels, (1, 1), dtype=dt, name="head")(x)
        return x.astype(jnp.float32)
