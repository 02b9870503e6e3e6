"""Plotting suite: maps, context encodings, timeseries, loss curves.

Capability parity with the reference's use of ``deepsensor.plot`` and its
own plot helpers (``nzdownscale/downscaler/validate.py:513-1046``,
``train.py:268-299,513-522``, ``dataprocess/utils.py:132-215``), built on
matplotlib only (no cartopy in this environment — maps are plain
pcolormesh with NZ extent; the geographic content is identical, minus
coastline decoration).

All functions return the matplotlib Figure so callers can save or extend.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from deepsensornz_tpu.data.grid import Dataset, Field  # noqa: E402


def _map_axes(ax, field: Field):
    lat = field.coords[field.dims[-2]]
    lon = field.coords[field.dims[-1]]
    ax.set_xlabel("longitude")
    ax.set_ylabel("latitude")
    return lon, lat


def plot_field(field: Field, ax=None, title: str = "", cmap: str = "viridis",
               vmin=None, vmax=None, colorbar: bool = True):
    """Single map panel (role of ``PlotData.plot_with_coastlines``,
    ``utils.py:132-215``)."""
    if ax is None:
        fig, ax = plt.subplots(figsize=(6, 7))
    else:
        fig = ax.figure
    lon, lat = _map_axes(ax, field)
    pm = ax.pcolormesh(lon, lat, field.data, cmap=cmap, vmin=vmin, vmax=vmax,
                       shading="auto")
    if colorbar:
        fig.colorbar(pm, ax=ax, shrink=0.8)
    ax.set_title(title or field.name)
    return fig


def plot_prediction(prediction: Dataset, time_idx: int = 0,
                    station_coords: Optional[np.ndarray] = None):
    """Mean + std panels (role of ``deepsensor.plot.prediction`` at
    ``validate.py:544``), optional station overlay
    (``plot_stations_and_prediction``, ``validate.py:638-707``)."""
    mean = prediction["mean"].isel(time=time_idx)
    std = prediction["std"].isel(time=time_idx)
    fig, axes = plt.subplots(1, 2, figsize=(13, 7))
    plot_field(mean, axes[0], "mean", cmap="RdYlBu_r")
    plot_field(std, axes[1], "std", cmap="Greys_r")
    if station_coords is not None:
        for ax in axes:
            ax.scatter(station_coords[:, 1], station_coords[:, 0],
                       s=12, c="k", marker="^", label="stations")
        axes[0].legend(loc="lower right")
    fig.tight_layout()
    return fig


def plot_samples(prediction: Dataset, time_idx: int = 0, n: int = 3):
    """Sample panels (role of the "ConvNP sample i" figure,
    ``validate.py:1019-1027``)."""
    samples = prediction["samples"]
    n = min(n, samples.shape[0])
    mean = prediction["mean"].isel(time=time_idx)
    vmin = float(np.nanmin(mean.data))
    vmax = float(np.nanmax(mean.data))
    fig, axes = plt.subplots(1, n + 1, figsize=(5 * (n + 1), 6))
    plot_field(mean, axes[0], "mean", cmap="RdYlBu_r", vmin=vmin, vmax=vmax)
    for i in range(n):
        s = samples.isel(sample=i, time=time_idx)
        plot_field(s, axes[i + 1], f"sample {i}", cmap="RdYlBu_r",
                   vmin=vmin, vmax=vmax)
    fig.tight_layout()
    return fig


def plot_context_encoding(model, params, task, max_channels: int = 8):
    """Visualise the SetConv-encoded internal-grid channels
    (role of ``deepsensor.plot.context_encoding``, ``train.py:276-299``)."""
    import jax

    from deepsensornz_tpu.ops.setconv import (
        setconv_encode_grid, setconv_encode_offgrid,
    )

    enc = []
    names = []
    pi = 0
    for i, g in enumerate(task.grids):
        ls = float(jax.nn.softplus(params["params"][f"ls_grid_{i}"]))
        e = setconv_encode_grid(task.x1g, task.x2g, g.x1, g.x2, g.y, ls, g.mask)
        enc.append(np.asarray(e[0]))
        names += [f"grid{i}/density"] + [f"grid{i}/ch{c}" for c in range(e.shape[-1] - 1)]
    for i, p in enumerate(task.points):
        ls = float(jax.nn.softplus(params["params"][f"ls_points_{i}"]))
        e = setconv_encode_offgrid(task.x1g, task.x2g, p.x, p.y, p.mask, ls)
        enc.append(np.asarray(e[0]))
        names += [f"points{i}/density"] + [f"points{i}/ch{c}" for c in range(e.shape[-1] - 1)]
    stacked = np.concatenate(enc, axis=-1)
    n = min(stacked.shape[-1], max_channels)
    fig, axes = plt.subplots(1, n, figsize=(4 * n, 4.5))
    axes = np.atleast_1d(axes)
    for c in range(n):
        axes[c].imshow(stacked[..., c], origin="lower", cmap="viridis")
        axes[c].set_title(names[c], fontsize=9)
        axes[c].axis("off")
    fig.tight_layout()
    return fig


def plot_task(task, batch_idx: int = 0):
    """Visualise one task's context/target geometry (role of
    ``deepsensor.plot.task``/``offgrid_context``): gridded context extents,
    station context points, and target points in x-space."""
    fig, ax = plt.subplots(figsize=(6, 6))
    for i, g in enumerate(task.grids):
        x1 = np.asarray(g.x1)
        x2 = np.asarray(g.x2)
        ax.add_patch(plt.Rectangle(
            (x2.min(), x1.min()), x2.max() - x2.min(), x1.max() - x1.min(),
            fill=False, ls="--", color=f"C{i}", label=f"grid context {i}",
        ))
    for i, p in enumerate(task.points):
        m = np.asarray(p.mask)[batch_idx].astype(bool)
        pts = np.asarray(p.x)[batch_idx][m]
        ax.scatter(pts[:, 1], pts[:, 0], s=16, marker="o",
                   label=f"point context {i} (n={m.sum()})")
    tm = np.asarray(task.yt_mask)[batch_idx].astype(bool)
    tp = np.asarray(task.xt)[batch_idx][tm]
    ax.scatter(tp[:, 1], tp[:, 0], s=24, marker="x", color="k",
               label=f"targets (n={tm.sum()})")
    ax.set_xlabel("x2")
    ax.set_ylabel("x1")
    ax.legend(loc="upper right", fontsize=8)
    fig.tight_layout()
    return fig


def plot_timeseries_comparison(
    times: np.ndarray,
    pred_mean: np.ndarray,
    pred_std: np.ndarray,
    obs: Optional[np.ndarray] = None,
    base: Optional[np.ndarray] = None,
    title: str = "",
):
    """Mean ±2σ CI vs station obs vs base field at one location
    (``plot_timeseries_comparison``, ``validate.py:862-946``)."""
    fig, ax = plt.subplots(figsize=(12, 4))
    ax.plot(times, pred_mean, label="ConvNP mean", color="C0")
    ax.fill_between(times, pred_mean - 2 * pred_std, pred_mean + 2 * pred_std,
                    alpha=0.25, color="C0", label="±2σ")
    if obs is not None:
        ax.plot(times, obs, ".", color="k", ms=4, label="station obs")
    if base is not None:
        ax.plot(times, base, color="C1", lw=1, label="base (ERA5)")
    ax.legend()
    ax.set_title(title)
    fig.tight_layout()
    return fig


def plot_errors_at_stations(
    station_lats: np.ndarray,
    station_lons: np.ndarray,
    errors: np.ndarray,
    title: str = "per-station error",
):
    """Error bubble map (``plot_errors_at_stations``, ``validate.py:549-635``)."""
    fig, ax = plt.subplots(figsize=(6, 7))
    lim = float(np.nanmax(np.abs(errors))) or 1.0
    sc = ax.scatter(station_lons, station_lats, c=errors, cmap="RdBu_r",
                    vmin=-lim, vmax=lim, s=30, edgecolor="k", linewidth=0.3)
    fig.colorbar(sc, ax=ax, shrink=0.8)
    ax.set_title(title)
    ax.set_xlabel("longitude")
    ax.set_ylabel("latitude")
    return fig


def gen_test_fig(
    base_field: Optional[Field] = None,
    prediction: Optional[Dataset] = None,
    time_idx: int = 0,
    n_samples: int = 2,
    sea_mask: Optional[np.ndarray] = None,
):
    """Base-field / mean / samples / std panel figure
    (``gen_test_fig``, ``validate.py:948-1046``)."""
    panels = []
    if base_field is not None:
        f = base_field.isel(time=time_idx) if "time" in base_field.dims else base_field
        panels.append(("ERA5 / base", f, "RdYlBu_r"))
    if prediction is not None:
        panels.append(("ConvNP mean", prediction["mean"].isel(time=time_idx), "RdYlBu_r"))
        if "samples" in prediction:
            for i in range(min(n_samples, prediction["samples"].shape[0])):
                panels.append((f"ConvNP sample {i}",
                               prediction["samples"].isel(sample=i, time=time_idx),
                               "RdYlBu_r"))
        panels.append(("ConvNP std", prediction["std"].isel(time=time_idx), "Greys_r"))
    fig, axes = plt.subplots(1, len(panels), figsize=(5 * len(panels), 6))
    axes = np.atleast_1d(axes)
    for ax, (title, f, cmap) in zip(axes, panels):
        if sea_mask is not None and f.data.shape == sea_mask.shape:
            f = f.copy(np.where(sea_mask, np.nan, f.data))
        plot_field(f, ax, title, cmap=cmap)
    fig.tight_layout()
    return fig


def make_loss_plot(train_losses: Sequence[float], val_losses: Sequence[float],
                   path: Optional[str] = None):
    """Loss curves (``make_loss_plot``, ``train.py:513-522``)."""
    fig, ax = plt.subplots(figsize=(7, 4))
    ax.plot(train_losses, label="train")
    ax.plot(val_losses, label="val")
    ax.set_xlabel("epoch")
    ax.set_ylabel("normalised NLL")
    ax.legend()
    fig.tight_layout()
    if path:
        fig.savefig(path, dpi=120)
    return fig
