"""ERA5(-Land) reanalysis loader.

Capability parity with ``nzdownscale/dataprocess/era5.py``:

- multi-file loads by variable/year across several on-disk layouts
  (``era5.py:78-117``: year files directly under the variable folder, or
  nested ``<var>/<year>/*.nc``, or single flat files),
- hourly→daily resampling — mean, or sum for precipitation
  (``era5.py:60-71``),
- time-targeted loading for operational inference (``era5.py:119-138``),
- Kelvin→Celsius (``era5.py:141``),
- bilinear regrid onto an arbitrary regular grid (module-level
  ``interpolate_era5``, ``era5.py:145-178``) — here just separable linear
  interpolation on the regular lat/lon grid (no xESMF needed).
"""

from __future__ import annotations

import glob
import os
from typing import Sequence

import numpy as np

from deepsensornz_tpu import config as cfg
from deepsensornz_tpu.data.grid import Field, open_dataset


class ERA5Source:
    """Load ERA5 variables from a directory of netCDF files."""

    def __init__(self, parent: str):
        self.parent = parent

    # -- file discovery ----------------------------------------------------------

    def candidate_files(self, variable: str, years: Sequence[int]) -> list[str]:
        """Resolve files for a canonical variable across known layouts."""
        short = cfg.VAR_ERA5[variable]["var_name"]
        pats = []
        for name in (variable, short):
            for y in years:
                pats += [
                    os.path.join(self.parent, name, f"*{y}*.nc"),
                    os.path.join(self.parent, name, str(y), "*.nc"),
                    os.path.join(self.parent, f"*{name}*{y}*.nc"),
                ]
        seen, out = set(), []
        for p in pats:
            for f in sorted(glob.glob(p)):
                if f not in seen:
                    seen.add(f)
                    out.append(f)
        return out

    # -- loading -----------------------------------------------------------------

    def load(self, variable: str, years: Sequence[int],
             time_window: tuple | None = None) -> Field:
        """Concatenate year files along time for one variable.

        ``time_window=(t0, t1)`` restricts every file read to the rows
        inside the window (h5py hyperslab — a month's query against hourly
        year files moves a month's bytes, not a year's); files with no
        overlap contribute nothing."""
        files = self.candidate_files(variable, years)
        if not files:
            raise FileNotFoundError(
                f"no ERA5 files for {variable!r} years {list(years)} under {self.parent}"
            )
        short = cfg.VAR_ERA5[variable]["var_name"]
        pieces = []
        for f in files:
            ds = open_dataset(f, time_window=time_window)
            name = short if short in ds else next(iter(ds.keys()))
            fld = ds[name]
            if "time" in fld.dims and fld.data.shape[fld.axis("time")] == 0:
                continue  # file entirely outside the window
            # drop the ERA5T 'expver' axis if present (era5.py:131-135)
            if "expver" in fld.dims:
                fld = fld.isel(expver=0)
            pieces.append(fld)
        if not pieces:
            raise FileNotFoundError(
                f"ERA5 files for {variable!r} exist but none overlap "
                f"time_window={time_window}"
            )
        return concat_time(pieces).rename(short)

    def load_time(self, variable: str, times: np.ndarray,
                  window_pad: np.timedelta64 = np.timedelta64(1, "h")) -> Field:
        """Load exactly the requested timestamps (``era5.py:119-138``).

        Windowed: only the file rows inside [min(times)−pad, max(times)+pad]
        are read (reference laziness parity — the eager round-3 form paid a
        year's I/O and ~0.6 GB RAM per variable-year for a month's query).
        ``window_pad`` keeps nearest-neighbour semantics at the window edges
        for off-stamp queries."""
        times = np.asarray(times, dtype="datetime64[s]")
        years = sorted({int(str(t.astype("datetime64[Y]"))) for t in times})
        fld = self.load(variable, years,
                        time_window=(times.min() - window_pad,
                                     times.max() + window_pad))
        return fld.sel(time=times, method="nearest")

    # -- transforms ---------------------------------------------------------------

    @staticmethod
    def hourly_to_daily(fld: Field, variable: str) -> Field:
        """Daily mean (sum for precipitation) — ``era5.py:60-71``."""
        how = "sum" if variable == "precipitation" else "mean"
        return daily_resample(fld, how)

    @staticmethod
    def kelvin_to_celsius(fld: Field) -> Field:
        out = fld.copy(fld.data - 273.15)
        out.attrs["units"] = "°C"
        return out

    @staticmethod
    def interpolate_to(fld: Field, target: Field) -> Field:
        """Bilinear regrid onto another Field's lat/lon grid
        (``interpolate_era5`` parity, ``era5.py:145-178``)."""
        return fld.interp_like(target, method="linear")


def daily_resample(fld: Field, how: str = "mean") -> Field:
    """Group a time-dimensioned Field by calendar day and reduce."""
    t = fld.coords["time"].astype("datetime64[s]")
    days = t.astype("datetime64[D]")
    uniq, inv = np.unique(days, return_inverse=True)
    ax = fld.axis("time")
    shape = list(fld.data.shape)
    shape[ax] = len(uniq)
    out = np.zeros(shape, dtype=np.float64)
    counts = np.zeros(len(uniq))
    data = np.moveaxis(fld.data, ax, 0)
    acc = np.zeros((len(uniq),) + data.shape[1:], dtype=np.float64)
    np.add.at(acc, inv, np.nan_to_num(data))
    np.add.at(counts, inv, 1)
    if how == "mean":
        acc = acc / np.maximum(counts.reshape((-1,) + (1,) * (acc.ndim - 1)), 1)
    out = np.moveaxis(acc, 0, ax)
    coords = dict(fld.coords)
    coords["time"] = uniq.astype("datetime64[s]")
    return Field(out.astype(fld.data.dtype), fld.dims, coords, fld.name, dict(fld.attrs))


def concat_time(fields: list[Field]) -> Field:
    """Concatenate Fields along time, sorted and deduplicated."""
    if len(fields) == 1:
        f = fields[0]
    else:
        ax = fields[0].axis("time")
        data = np.concatenate([x.data for x in fields], axis=ax)
        t = np.concatenate([x.coords["time"] for x in fields]).astype("datetime64[s]")
        coords = dict(fields[0].coords)
        coords["time"] = t
        f = Field(data, fields[0].dims, coords, fields[0].name, dict(fields[0].attrs))
    order = np.argsort(f.coords["time"].astype("datetime64[s]"))
    t_sorted = f.coords["time"][order]
    keep = np.ones(len(order), bool)
    keep[1:] = t_sorted[1:] != t_sorted[:-1]
    return f.isel(time=order[keep])
