"""Same-hardware software comparison: the reference's compute graph in
PyTorch (f32, as it trains — no AMP anywhere in the reference:
``nzdownscale/downscaler/train.py:336-434``) vs this framework's JAX train
step, BOTH on this machine's CPU.

Why this exists: the reference publishes no throughput numbers
(BASELINE.md), its stack (deepsensor + neuralprocesses + torch/CUDA) is not
installed here, and there is no GPU in this environment — so the
train-throughput north star ("≥10× reference tasks/s/chip") needs a
*measured* software-efficiency baseline plus an analytic device bound
(docs/train_throughput.md). This file provides the measured half:

- ``torch_step``: a faithful reimplementation of the graph the reference
  trains — separable-RBF SetConv encode (neuralprocesses' own lowering:
  per-dimension weight matrices contracted as matmuls), the same U-Net
  topology as ``models/unet.py`` (stem 1×1 → stride-2 down convs →
  bottleneck → ConvTranspose ups with skip-concat + mix conv → 1×1 head),
  off-grid SetConv decode, MLP head, low-rank-MVN NLL (Woodbury), AdamW —
  in float32, batch 1 (the reference's default: ``train.py:341-342``
  ``batch=False, batch_size=1``) and batch 8.
- ``jax_step``: this framework's real ``make_train_step`` at the same
  shapes, forced to float32 compute for apples-to-apples numerics.

The ratio between the two on identical silicon isolates the software stack
(fusion, layout, dispatch) from the device. Run:  python perf/ref_torch_bench.py
"""

from __future__ import annotations

import json
import time

import numpy as np

INTERNAL = 608          # internal grid at density 500 (ops/grids.internal_grid)
NB = (139, 130)         # ERA5 0.1° base grid
NA = (278, 260)         # aux topo grid 0.05°
N_STATIONS = 512
N_TARGETS = 512
RANK = 64
LS = 2.0 / 500.0


def _torch_model_and_step():
    import torch
    import torch.nn as nn

    torch.manual_seed(0)

    class RefUNet(nn.Module):
        """Topology-identical to models/unet.py::UNet, NCHW f32 (torch's
        native layout, as neuralprocesses uses)."""

        def __init__(self, c_in, channels=(64, 64, 64, 64), c_out=64, k=5):
            super().__init__()
            p = k // 2
            self.stem = nn.Conv2d(c_in, channels[0], 1)
            self.down = nn.ModuleList(
                [nn.Conv2d(channels[max(i - 1, 0)], ch, k, stride=2, padding=p)
                 for i, ch in enumerate(channels)])
            self.bottleneck = nn.Conv2d(channels[-1], channels[-1], k, padding=p)
            ups, mixes = [], []
            prev = channels[-1]
            for i in reversed(range(len(channels))):
                ch = channels[i]
                ups.append(nn.ConvTranspose2d(prev, ch, k, stride=2, padding=p,
                                              output_padding=1))
                mixes.append(nn.Conv2d(ch + channels[i], ch, k, padding=p))
                prev = ch
            self.up = nn.ModuleList(ups)
            self.mix = nn.ModuleList(mixes)
            self.head = nn.Conv2d(channels[0], c_out, 1)
            self.channels = channels

        def forward(self, x):
            x = self.stem(x)
            skips = []
            for d in self.down:
                x = torch.relu(x)
                skips.append(x)
                x = d(x)
            x = self.bottleneck(torch.relu(x))
            for j, (u, m) in enumerate(zip(self.up, self.mix)):
                x = u(torch.relu(x))
                x = torch.cat([x, skips[len(skips) - 1 - j]], dim=1)
                x = m(torch.relu(x))
            return self.head(torch.relu(x))

    class RefConvNP(nn.Module):
        def __init__(self, c_enc, c_aux=1):
            super().__init__()
            self.unet = RefUNet(c_enc)
            self.mlp = nn.Sequential(nn.Linear(64 + c_aux, 64), nn.ReLU(),
                                     nn.Linear(64, 2 + RANK))
            self.log_ls = nn.Parameter(torch.tensor(float(np.log(LS))))

        def encode_grid(self, xg, src_x1, src_x2, y):
            # separable RBF weights, normalised per target node (the
            # neuralprocesses setconv lowering: one matmul per dimension)
            w1 = torch.exp(-0.5 * (xg[0][:, None] - src_x1[None, :]) ** 2
                           / torch.exp(2 * self.log_ls))
            w2 = torch.exp(-0.5 * (xg[1][:, None] - src_x2[None, :]) ** 2
                           / torch.exp(2 * self.log_ls))
            den = torch.ones_like(y[:, :1])
            yd = torch.cat([y, den], dim=1)          # (B, C+1, h, w)
            t = torch.einsum("gh,bchw->bcgw", w1, yd)
            t = torch.einsum("kw,bcgw->bcgk", w2, t)
            d = t[:, -1:].clamp(min=1e-8)
            return torch.cat([t[:, :-1] / d, d], dim=1)

        def encode_points(self, xg, px, py):
            w1 = torch.exp(-0.5 * (px[..., 0][:, :, None] - xg[0][None, None]) ** 2
                           / torch.exp(2 * self.log_ls))    # (B, N, G1)
            w2 = torch.exp(-0.5 * (px[..., 1][:, :, None] - xg[1][None, None]) ** 2
                           / torch.exp(2 * self.log_ls))    # (B, N, G2)
            den = torch.ones_like(py[..., :1])
            v = torch.cat([py, den], dim=-1)                 # (B, N, C+1)
            wv = w2[..., None] * v[:, :, None, :]            # (B, N, G2, C+1)
            t = torch.einsum("bng,bnkc->bgkc", w1, wv)       # (B, G1, G2, C+1)
            t = t.permute(0, 3, 1, 2)
            d = t[:, -1:].clamp(min=1e-8)
            return torch.cat([t[:, :-1] / d, d], dim=1)

        def decode_points(self, xg, f, xt):
            w1 = torch.exp(-0.5 * (xt[..., 0][:, :, None] - xg[0][None, None]) ** 2
                           / torch.exp(2 * self.log_ls))
            w2 = torch.exp(-0.5 * (xt[..., 1][:, :, None] - xg[1][None, None]) ** 2
                           / torch.exp(2 * self.log_ls))
            t = torch.einsum("bmg,bcgk->bmck", w1, f)
            return torch.einsum("bmk,bmck->bmc", w2, t)

        def forward(self, batch):
            xg, grids, (px, py), xt, aux = batch
            enc = [self.encode_grid(xg, g[0], g[1], g[2]) for g in grids]
            enc.append(self.encode_points(xg, px, py))
            h = torch.cat(enc, dim=1)
            f = self.unet(h)
            z = self.decode_points(xg, f, xt)
            z = torch.cat([z, aux], dim=-1)
            return self.mlp(z)

    def nll(raw, yt):
        # low-rank MVN via Woodbury (identical math to models/likelihoods.py)
        mu, s_raw, fac = raw[..., 0], raw[..., 1], raw[..., 2:]
        var = torch.nn.functional.softplus(s_raw) + 1e-4
        r = (yt[..., 0] - mu)
        b, m = r.shape
        Fm = fac / np.sqrt(RANK)
        Dinv_r = r / var
        Ft_Dinv_r = torch.einsum("bmr,bm->br", Fm, Dinv_r)
        cap = torch.eye(RANK)[None] + torch.einsum(
            "bmr,bms->brs", Fm, Fm / var[..., None])
        L = torch.linalg.cholesky(cap)
        sol = torch.cholesky_solve(Ft_Dinv_r[..., None], L)[..., 0]
        quad = (r * Dinv_r).sum(-1) - (Ft_Dinv_r * sol).sum(-1)
        logdet = torch.log(var).sum(-1) + 2 * torch.log(
            torch.diagonal(L, dim1=-2, dim2=-1)).sum(-1)
        return ((0.5 * (quad + logdet) / m).mean()
                + 0.5 * float(np.log(2 * np.pi)))

    return RefConvNP, nll


def _make_torch_batch(B):
    import torch

    g = torch.Generator().manual_seed(0)
    xg = (torch.linspace(0, 1, INTERNAL), torch.linspace(0, 1, INTERNAL))
    grids = [
        (torch.linspace(0, 1, NB[0]), torch.linspace(0, 1, NB[1]),
         torch.randn(B, 3, *NB, generator=g)),
        (torch.linspace(0, 1, NA[0]), torch.linspace(0, 1, NA[1]),
         torch.randn(B, 4, *NA, generator=g)),
    ]
    px = torch.rand(B, N_STATIONS, 2, generator=g)
    py = torch.randn(B, N_STATIONS, 1, generator=g)
    xt = torch.rand(B, N_TARGETS, 2, generator=g)
    yt = torch.randn(B, N_TARGETS, 1, generator=g)
    aux = torch.randn(B, N_TARGETS, 1, generator=g)
    return (xg, grids, (px, py), xt, aux), yt


def bench_torch(B, steps=3):
    import torch

    torch.set_num_threads(torch.get_num_threads())  # default = all cores
    RefConvNP, nll = _torch_model_and_step()
    batch, yt = _make_torch_batch(B)
    c_enc = (3 + 1) + (4 + 1) + (1 + 1)
    model = RefConvNP(c_enc)
    opt = torch.optim.AdamW(model.parameters(), lr=5e-5)

    def step():
        opt.zero_grad()
        loss = nll(model(batch), yt)
        loss.backward()
        opt.step()
        return float(loss)

    step()  # warm caches / allocator
    times = []
    for _ in range(steps):
        t0 = time.perf_counter()
        loss = step()
        times.append(time.perf_counter() - t0)
    p50 = float(np.median(times))
    return {"stack": "torch_f32_refgraph", "batch": B,
            "step_s": round(p50, 3), "tasks_per_s": round(B / p50, 3),
            "loss": round(loss, 4)}


def bench_jax(B, steps=3):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from deepsensornz_tpu.models.convnp import ConvNP, ConvNPConfig
    from deepsensornz_tpu.ops.grids import internal_grid
    from deepsensornz_tpu.task.task import GridContext, PointContext, TaskBatch
    from deepsensornz_tpu.train.trainer import init_state, make_train_step

    rng = np.random.default_rng(0)
    x1g, x2g = internal_grid((0, 1), (0, 1), 500, 0.1, 16)
    task = TaskBatch(
        grids=(
            GridContext(x1=jnp.linspace(0, 1, NB[0]), x2=jnp.linspace(0, 1, NB[1]),
                        y=jnp.asarray(rng.normal(size=(B, *NB, 3)).astype(np.float32))),
            GridContext(x1=jnp.linspace(0, 1, NA[0]), x2=jnp.linspace(0, 1, NA[1]),
                        y=jnp.asarray(rng.normal(size=(B, *NA, 4)).astype(np.float32))),
        ),
        points=(PointContext(
            x=jnp.asarray(rng.random((B, N_STATIONS, 2)).astype(np.float32)),
            y=jnp.asarray(rng.normal(size=(B, N_STATIONS, 1)).astype(np.float32)),
            mask=jnp.ones((B, N_STATIONS), jnp.float32)),),
        xt=jnp.asarray(rng.random((B, N_TARGETS, 2)).astype(np.float32)),
        yt=jnp.asarray(rng.normal(size=(B, N_TARGETS, 1)).astype(np.float32)),
        yt_mask=jnp.ones((B, N_TARGETS), jnp.float32),
        yt_aux=jnp.asarray(rng.normal(size=(B, N_TARGETS, 1)).astype(np.float32)),
        x1g=jnp.asarray(x1g), x2g=jnp.asarray(x2g),
    )
    cfg = ConvNPConfig(likelihood="gnp", rank=RANK, internal_density=500,
                       compute_dtype="float32")   # f32 to match the reference
    model = ConvNP(cfg)
    state = init_state(model, jax.random.key(0), task)
    step = make_train_step(model, donate=False)
    state, loss = step(state, task, 5e-5)
    loss.block_until_ready()
    times = []
    for _ in range(steps):
        t0 = time.perf_counter()
        state, loss = step(state, task, 5e-5)
        loss.block_until_ready()
        times.append(time.perf_counter() - t0)
    p50 = float(np.median(times))
    return {"stack": "jax_f32_ours", "batch": B,
            "step_s": round(p50, 3), "tasks_per_s": round(B / p50, 3),
            "loss": round(float(loss), 4)}


if __name__ == "__main__":
    out = []
    for B in (1, 8):
        r = bench_torch(B)
        print(json.dumps(r), flush=True)
        out.append(r)
    for B in (1, 8):
        r = bench_jax(B)
        print(json.dumps(r), flush=True)
        out.append(r)
    t1 = next(r for r in out if r["stack"].startswith("torch") and r["batch"] == 1)
    j8 = next(r for r in out if r["stack"].startswith("jax") and r["batch"] == 8)
    print(json.dumps({
        "metric": "same_cpu_software_ratio",
        "value": round(j8["tasks_per_s"] / t1["tasks_per_s"], 2),
        "unit": "x (ours-b8 / ref-graph-b1, same machine)",
    }))
