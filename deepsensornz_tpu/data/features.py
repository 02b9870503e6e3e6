"""Feature engineering for the downscaling pipeline.

Host-side (numpy/scipy) transforms with capability parity to the reference
preprocessing steps:

- :func:`compute_tpi` — topographic position index at multiple window scales
  (``nzdownscale/downscaler/preprocess.py:426-466``),
- :func:`elevation_difference` — highres − NN-interpolated lowres elevation
  (``preprocess.py:468-477``),
- :func:`landmask_from_elevation` — land/sea mask from DEM NaNs
  (``preprocess.py:693-701``),
- :func:`circ_time_encoding` — circular day-of-year / hour-of-day encodings
  (engine ``construct_circ_time_ds``; call site ``preprocess.py:704-723``),
- :func:`x1x2_channels` — positional-coordinate aux channels (engine
  ``construct_x1x2_ds``; call site ``preprocess.py:917-924``),
- :func:`wind_components` — u/v from speed+direction
  (``nzdownscale/dataprocess/stations.py:295-303``),
- humidity interval shifts (``preprocess.py:209-211,233-235``).
"""

from __future__ import annotations

import numpy as np
from scipy.ndimage import gaussian_filter

from deepsensornz_tpu.data.grid import Dataset, Field


def compute_tpi(elevation: Field, window_degrees: tuple[float, ...] = (0.1, 0.05, 0.025)) -> Dataset:
    """Topographic position index at several smoothing scales.

    TPI(scale) = elevation − gaussian_filter(elevation, sigma=scale), where
    sigma is the window size converted from degrees to grid cells. NaNs (sea)
    are treated as elevation 0 for the filter, matching the reference's
    fill-then-filter behaviour (``preprocess.py:426-466``).
    """
    res = elevation.resolution("latitude")
    elev = elevation.fillna(0.0).data.astype(np.float64)
    out = {}
    for w in window_degrees:
        sigma = max(w / res, 1e-6)
        smoothed = gaussian_filter(elev, sigma=sigma, mode="nearest")
        name = f"TPI_{w}"
        out[name] = Field(
            (elev - smoothed).astype(np.float32),
            elevation.dims,
            dict(elevation.coords),
            name,
            {"window_degrees": w},
        )
    return Dataset(out)


def elevation_difference(highres: Field, lowres: Field) -> Field:
    """highres − nearest-neighbour-upsampled lowres elevation.

    Captures sub-grid orography the coarse field cannot see
    (``preprocess.py:468-477``).
    """
    up = lowres.fillna(0.0).interp_like(highres, method="nearest")
    diff = highres.fillna(0.0).data - up.data
    return Field(diff.astype(np.float32), highres.dims, dict(highres.coords),
                 "elevation_diff", {})


def landmask_from_elevation(elevation: Field) -> Field:
    """1.0 over land, 0.0 over sea, from DEM NaNs (``preprocess.py:693-701``)."""
    mask = (~np.isnan(elevation.data)).astype(np.float32)
    return Field(mask, elevation.dims, dict(elevation.coords), "landmask", {})


def circ_time_encoding(times: np.ndarray, freq: str = "D") -> dict[str, np.ndarray]:
    """Circular encodings of time.

    ``freq='D'`` → ``cos_D``/``sin_D`` over day-of-year; ``freq='H'`` →
    additionally ``cos_H``/``sin_H`` over hour-of-day. Engine parity:
    ``construct_circ_time_ds`` (used at ``preprocess.py:704-723``).
    """
    t = np.asarray(times, dtype="datetime64[s]")
    years = t.astype("datetime64[Y]")
    doy = (t - years).astype("timedelta64[D]").astype(np.float64)
    year_len = ((years + 1).astype("datetime64[D]") - years.astype("datetime64[D]")).astype(np.float64)
    phase_d = 2.0 * np.pi * doy / year_len
    out = {"cos_D": np.cos(phase_d), "sin_D": np.sin(phase_d)}
    if freq.upper().startswith("H"):
        days = t.astype("datetime64[D]")
        hours = (t - days).astype("timedelta64[h]").astype(np.float64)
        phase_h = 2.0 * np.pi * hours / 24.0
        out["cos_H"] = np.cos(phase_h)
        out["sin_H"] = np.sin(phase_h)
    return out


def x1x2_channels(template: Field) -> Dataset:
    """Broadcast x1/x2 coordinate arrays as aux channels.

    Engine parity: ``construct_x1x2_ds`` (``preprocess.py:917-924``) —
    deliberately breaks CNN translation equivariance so the model can learn
    location-specific behaviour.
    """
    x1 = template.coords[template.dims[-2]].astype(np.float32)
    x2 = template.coords[template.dims[-1]].astype(np.float32)
    h, w = len(x1), len(x2)
    x1_arr = np.broadcast_to(x1[:, None], (h, w)).copy()
    x2_arr = np.broadcast_to(x2[None, :], (h, w)).copy()
    dims = template.dims[-2:]
    coords = {dims[0]: template.coords[dims[0]], dims[1]: template.coords[dims[1]]}
    return Dataset({
        "x1_arr": Field(x1_arr, dims, coords, "x1_arr", {}),
        "x2_arr": Field(x2_arr, dims, coords, "x2_arr", {}),
    })


def wind_components(speed: np.ndarray, direction_deg: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Meteorological u/v from speed + direction (``stations.py:295-303``)."""
    theta = np.deg2rad(np.asarray(direction_deg, dtype=np.float64))
    u = -np.asarray(speed, dtype=np.float64) * np.sin(theta)
    v = -np.asarray(speed, dtype=np.float64) * np.cos(theta)
    return u, v


def shift_humidity_to_unit_interval(values: np.ndarray) -> np.ndarray:
    """[-1, 1] (min_max output) → [0, 1] (``preprocess.py:209-211``)."""
    return (np.asarray(values) + 1.0) / 2.0


def shift_humidity_from_unit_interval(values: np.ndarray) -> np.ndarray:
    """[0, 1] → [-1, 1] before unnormalisation (``preprocess.py:233-235``)."""
    return np.asarray(values) * 2.0 - 1.0


def random_hour_subset(field: Field, seed: int = 0) -> Field:
    """One random hour per day (normalisation-statistics subsample for
    hourly data — ``utils.py:278-289`` / ``preprocess.py:787-790``: fitting
    stats on every hour of a long hourly record is wasteful and biases
    toward high-frequency structure)."""
    t = field.coords["time"].astype("datetime64[s]")
    days = t.astype("datetime64[D]")
    uniq = np.unique(days)
    rng = np.random.default_rng(seed)
    picks = []
    for d in uniq:
        idx = np.nonzero(days == d)[0]
        picks.append(idx[rng.integers(len(idx))])
    return field.isel(time=np.asarray(picks))


def rmse(pred: np.ndarray, truth: np.ndarray) -> float:
    """Root-mean-square error over finite pairs (``utils.py:30``)."""
    p = np.asarray(pred, dtype=np.float64).ravel()
    t = np.asarray(truth, dtype=np.float64).ravel()
    ok = np.isfinite(p) & np.isfinite(t)
    return float(np.sqrt(np.mean((p[ok] - t[ok]) ** 2)))
