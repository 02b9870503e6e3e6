"""Residual-correlation length-scale estimator — TESTED AND REJECTED.

Hypothesis: the measured SetConv ``init_lengthscale`` optimum (0.00714
normalised ~ 3 km; hardware sweep, ``flagship_density_frontier.json``)
should be predictable FROM THE DATA as the spatial correlation scale of
the station residuals ``obs - base`` (matched-kernel/kriging argument),
removing the need for a sweep.

Measured verdict (CPU, flagship NZ-scale synthetic bundle, seeds 0/1/2;
``docs/results/lengthscale_estimator_rejected.json``): REJECTED, for two
reasons that are fundamental rather than implementation details:

1. Pairwise TEMPORAL correlation of residual series demeans each station
   over time, which removes exactly the signal the model learns — the
   STATIC elevation-driven sub-grid offsets. What remains is the
   time-varying synoptic interpolation error of the coarse base, whose
   scale (fitted 0.20-0.26 normalised, ~30x the SetConv optimum) is the
   component the U-Net handles, not the SetConv smoothing.
2. The 3 km scale is spatially UNDER-SAMPLED by the station network: in
   the flagship bundle only ~6 of 4950 station pairs sit within 2x the
   optimum (min pair distance 0.007-0.011 across seeds; the 1st
   percentile of pair distances is ~0.046), far too few to fit a
   correlation scale at 0.007 — and the real NZ network's typical
   spacing (~50 km) is coarser still. A pair-based estimator has
   essentially no data at the scale of interest.

Consequence: ``init_lengthscale`` cannot be set from the station data a
priori at realistic network density. The shipped recipe stands: transplant
the measured optimum (profiles), sweep around it when the domain changes,
and use ``lengthscale_lr_mult`` self-tuning only to refine a good init
(the flagship capstone showed it cannot rescue a bad one).

The estimator itself is kept here as a working diagnostic of the
residual's SYNOPTIC correlation scale (with a nugget absorbing gauge
noise) — run ``python perf/residual_scale_study.py`` to reproduce the
rejection table.
"""


from __future__ import annotations

import numpy as np

from deepsensornz_tpu.data.grid import Field
from deepsensornz_tpu.pipeline.validate import _nearest_index


def _pairwise_residual_correlation(M: np.ndarray):
    """Pearson correlation of every row pair of ``M`` over the columns
    where BOTH rows are finite, plus the common count.

    Exact per-pair masking via matrix identities (no S² python loop):
    with V = nan→0 values and W = finite mask, every per-pair moment
    (n, Σx, Σy, Σx², Σy², Σxy over the COMMON support) is an S×S matmul.
    """
    W = np.isfinite(M).astype(np.float64)
    V = np.where(np.isfinite(M), M, 0.0)
    n = W @ W.T
    sx = V @ W.T
    sy = sx.T
    sxx = (V * V) @ W.T
    syy = sxx.T
    sxy = V @ V.T
    with np.errstate(invalid="ignore", divide="ignore"):
        cov = n * sxy - sx * sy
        var = (n * sxx - sx * sx) * (n * syy - sy * sy)
        rho = cov / np.sqrt(var)
    return rho, n


def estimate_init_lengthscale(
    base_field: Field,
    station_df,
    data_processor=None,
    min_common_times: int = 8,
    max_scale: float = 0.2,
    n_bins: int = 24,
) -> dict:
    """Estimate the SetConv ``init_lengthscale`` from station residuals.

    Parameters are the training inputs themselves (the normalised base
    ``Field``, the station frame with ``*_station``/time/latitude/
    longitude columns, and the ``DataProcessor`` whose x1/x2 maps define
    the normalised coordinate system the length-scale lives in). Returns::

        {"lengthscale": float,      # normalised units, floor-free
         "nugget": float,           # fitted a (1 - noise fraction at d→0)
         "n_stations": int, "n_pairs": int,
         "curve": [(d, rho, n), ...]}   # distance-binned empirical curve

    Fit: weighted LS of ``a·exp(−d²/(2ℓ²))`` against all station-pair
    correlations (weights = common-time counts), ℓ on a log grid, ``a``
    solved in closed form per ℓ. Raises ``ValueError`` when fewer than 3
    station pairs share ``min_common_times`` samples (not enough signal
    to estimate anything — fall back to an explicit value).
    """
    col = [c for c in station_df.columns if c.endswith("_station")][0]
    lat_c = np.asarray(base_field.coords[base_field.dims[-2]], np.float64)
    lon_c = np.asarray(base_field.coords[base_field.dims[-1]], np.float64)
    t_c = np.asarray(base_field.coords["time"]).astype("datetime64[s]")
    st_t = station_df["time"].to_numpy().astype("datetime64[s]")
    # Accept the NORMALISED frame (x1/x2 columns, the form the processed
    # dict carries — already in the coordinate system the length-scale
    # lives in) or a raw lat/lon frame plus the DataProcessor's maps.
    # Either way the base field must be NORMALISED (x1/x2 coords): lat/lon
    # station coords are mapped into that system HERE, before the
    # cell-index lookups, so both the residual sampling and the pair
    # distances use one coordinate system.
    if "x1" in station_df.columns:
        st_lat = station_df["x1"].to_numpy(np.float64)
        st_lon = station_df["x2"].to_numpy(np.float64)
    else:
        if data_processor is None:
            raise ValueError("lat/lon station frame needs a data_processor "
                             "to map into normalised coordinates")
        st_lat = np.asarray(data_processor.map_x1(
            station_df["latitude"].to_numpy(np.float64)), np.float64)
        st_lon = np.asarray(data_processor.map_x2(
            station_df["longitude"].to_numpy(np.float64)), np.float64)
    obs = station_df[col].to_numpy(np.float64)

    ti = _nearest_index(t_c.astype(np.int64), st_t.astype(np.int64))
    li = _nearest_index(lat_c, st_lat)
    lo = _nearest_index(lon_c, st_lon)
    base = np.asarray(base_field.data)[ti, li, lo].astype(np.float64)
    res = obs - base
    ok = np.isfinite(res)

    # pivot into a stations × base-times residual matrix
    skey = np.stack([st_lat.round(6), st_lon.round(6)], -1)
    uniq, sidx = np.unique(skey[ok], axis=0, return_inverse=True)
    S, T = len(uniq), len(t_c)
    M = np.full((S, T), np.nan)
    M[sidx, ti[ok]] = res[ok]

    rho, n = _pairwise_residual_correlation(M)

    x1, x2 = uniq[:, 0], uniq[:, 1]
    D = np.sqrt((x1[:, None] - x1[None, :]) ** 2
                + (x2[:, None] - x2[None, :]) ** 2)

    iu = np.triu_indices(S, k=1)
    d, r, w = D[iu], rho[iu], n[iu]
    keep = (w >= min_common_times) & np.isfinite(r) & (d > 0)
    d, r, w = d[keep], r[keep], w[keep]
    if len(d) < 3:
        raise ValueError(
            f"only {len(d)} station pairs share >= {min_common_times} "
            "finite times; cannot estimate a length-scale — pass an "
            "explicit init_lengthscale instead")

    # weighted LS over a log grid of scales; nugget a in closed form
    scales = np.geomspace(1e-4, max_scale, 256)
    f = np.exp(-(d[None, :] ** 2) / (2.0 * scales[:, None] ** 2))
    wf = w[None, :] * f
    a = np.clip((wf * r[None, :]).sum(1) / np.maximum((wf * f).sum(1), 1e-30),
                0.0, 1.0)
    sse = (w[None, :] * (r[None, :] - a[:, None] * f) ** 2).sum(1)
    k = int(np.argmin(sse))
    ls, nug = float(scales[k]), float(a[k])

    # distance-binned empirical curve (for plots/tests; fit uses raw
    # pairs). Half-open bins (last inclusive) so a pair landing exactly on
    # an interior quantile edge is counted once, not in both neighbours.
    qs = np.quantile(d, np.linspace(0, 1, n_bins + 1))
    curve = []
    for i, (lo_q, hi_q) in enumerate(zip(qs[:-1], qs[1:])):
        m = (d >= lo_q) & ((d < hi_q) if i < n_bins - 1 else (d <= hi_q))
        if m.any():
            curve.append((float(np.average(d[m], weights=w[m])),
                          float(np.average(r[m], weights=w[m])),
                          int(w[m].sum())))
    return {"lengthscale": ls, "nugget": nug, "n_stations": S,
            "n_pairs": int(len(d)), "min_pair_distance": float(d.min()),
            "curve": curve}


def main():
    import json

    import jax

    jax.config.update("jax_platforms", "cpu")
    from deepsensornz_tpu.data.synthetic import synthetic_bundle
    from deepsensornz_tpu.pipeline.preprocess import PreprocessForDownscaling

    rows = []
    for seed in (0, 1, 2):
        base, dem, stations = synthetic_bundle(
            variable="temperature", n_times=40, base_hw=(32, 32),
            dem_hw=(128, 128), n_stations=100, seed=seed)
        pre = PreprocessForDownscaling(variable="temperature")
        p = pre.run_processing_sequence(
            dem, {"temperature": base}, stations,
            highres_factor=2, lowres_factor=4, include_time_of_year=True)
        bf = next(iter(p["base_ds"].values()))
        out = estimate_init_lengthscale(bf, p["station_df"], max_scale=1.0)
        rows.append({"seed": seed,
                     "fitted_scale": round(out["lengthscale"], 4),
                     "nugget": round(out["nugget"], 3),
                     "n_pairs": out["n_pairs"],
                     "min_pair_distance": round(
                         out["min_pair_distance"], 4)})
        print(json.dumps(rows[-1]))
    print(json.dumps({"measured_setconv_optimum": 0.00714, "rows": rows}))


if __name__ == "__main__":
    main()
