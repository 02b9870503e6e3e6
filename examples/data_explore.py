"""Data exploration (role parity with ``experiments/data_explore/*``):
per-source visualisation, precipitation gamma/bernoulli distribution fits,
wind u/v derivation, station metadata histograms.

    python examples/data_explore.py [out_dir]
"""

import os
import sys

import numpy as np
import scipy.stats as st

from deepsensornz_tpu import plot as dplot
from deepsensornz_tpu.data.features import wind_components
from deepsensornz_tpu.data.synthetic import synthetic_bundle

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def main(out_dir="/tmp/data_explore"):
    os.makedirs(out_dir, exist_ok=True)

    # --- base / DEM maps (vis_era5 / vis_topography analogs) --------------
    base, dem, stations = synthetic_bundle(
        variable="precipitation", n_times=60, base_hw=(32, 32),
        dem_hw=(96, 96), n_stations=40,
    )
    fig = dplot.plot_field(dem, title="synthetic DEM (m)", cmap="terrain")
    fig.savefig(os.path.join(out_dir, "dem.png"), dpi=110)
    fig = dplot.plot_field(base.isel(time=0), title="precipitation (mm)",
                           cmap="Blues")
    fig.savefig(os.path.join(out_dir, "precip_day0.png"), dpi=110)

    # --- precip distribution: bernoulli (wet fraction) + gamma fit --------
    col = [c for c in stations.columns if c.endswith("_station")][0]
    vals = stations[col].to_numpy()
    wet = vals[vals > 0.01]
    p_wet = len(wet) / max(len(vals), 1)
    k, loc, scale = st.gamma.fit(wet, floc=0)
    print(f"wet-day probability: {p_wet:.2f}")
    print(f"gamma fit to wet amounts: shape={k:.2f} scale={scale:.2f}")
    fig, ax = plt.subplots(figsize=(7, 4))
    ax.hist(wet, bins=30, density=True, alpha=0.6, label="wet obs")
    xs = np.linspace(wet.min(), wet.max(), 200)
    ax.plot(xs, st.gamma.pdf(xs, k, loc, scale), label="gamma fit")
    ax.legend(); ax.set_xlabel("precip (mm)")
    fig.savefig(os.path.join(out_dir, "precip_gamma_fit.png"), dpi=110)

    # --- wind u/v derivation (vis wind analog) ------------------------------
    rng = np.random.default_rng(0)
    speed = np.abs(rng.normal(6, 3, 500))
    direction = rng.uniform(0, 360, 500)
    u, v = wind_components(speed, direction)
    np.testing.assert_allclose(np.hypot(u, v), speed, rtol=1e-9)
    fig, ax = plt.subplots(figsize=(5, 5))
    ax.scatter(u, v, s=4)
    ax.set_xlabel("u (m/s)"); ax.set_ylabel("v (m/s)")
    ax.set_title("derived wind components")
    fig.savefig(os.path.join(out_dir, "wind_uv.png"), dpi=110)

    # --- station metadata histograms (vis stations analog) ------------------
    meta = stations.groupby("station_id").first()
    fig, axes = plt.subplots(1, 2, figsize=(11, 4))
    axes[0].hist(meta["elevation"], bins=20)
    axes[0].set_title("station elevations (m)")
    counts = stations.groupby("station_id").size()
    axes[1].hist(counts, bins=20)
    axes[1].set_title("observations per station")
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, "station_metadata.png"), dpi=110)

    print(f"figures in {out_dir}")


if __name__ == "__main__":
    main(*(sys.argv[1:2] or ["/tmp/data_explore"]))
