"""Weather-station archive loader (one netCDF per station).

Capability parity with ``nzdownscale/dataprocess/stations.py``:

- metadata scan across the archive with silent skip of corrupt files
  (``stations.py:96-120``),
- single-station frames with optional daily resample and attached
  lon/lat/name (``stations.py:59-76``),
- time-targeted multi-station load keeping stations that cover the
  requested range, daily mean/sum option, ``remove_stations`` /
  ``keep_stations`` holdout filters, value column named
  ``{var}_station`` (``stations.py:216-293``),
- u/v wind derivation from speed+direction (``stations.py:295-303``),
- station registry builder — the generator behind the reference's
  hard-coded 619-entry ``STATION_LATLON`` table (``stations.py:181-214``,
  ``config.py:208-2683``) — cached to JSON.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Optional, Sequence

import numpy as np

from deepsensornz_tpu import config as cfg
from deepsensornz_tpu.data.features import wind_components
from deepsensornz_tpu.data.grid import open_dataset

try:
    import pandas as pd
except Exception:  # pragma: no cover
    pd = None


class StationSource:
    """Load station observations from a directory of per-station files."""

    def __init__(self, parent: str):
        self.parent = parent

    def station_files(self) -> list[str]:
        return sorted(glob.glob(os.path.join(self.parent, "*.nc")))

    # -- metadata ------------------------------------------------------------------

    def get_metadata(self) -> "pd.DataFrame":
        """Per-station name/lat/lon/elevation/first/last year; corrupt files
        skipped (``stations.py:117-118``)."""
        rows = []
        for path in self.station_files():
            try:
                ds = open_dataset(path)
                rows.append(self._meta_row(path, ds))
            except Exception:
                continue
        return pd.DataFrame(rows)

    @staticmethod
    def _meta_row(path: str, ds) -> dict:
        attrs = ds.attrs
        anyvar = next(iter(ds.values()))
        t = anyvar.coords.get("time")
        return {
            "file": path,
            "station_name": attrs.get("station_name", os.path.basename(path).replace(".nc", "")),
            "station_id": attrs.get("station_id", -1),
            "latitude": float(attrs.get("latitude", np.nan)),
            "longitude": float(attrs.get("longitude", np.nan)),
            "elevation": float(attrs.get("elevation", np.nan)),
            "start_year": int(str(t.min().astype("datetime64[Y]"))) if t is not None else -1,
            "end_year": int(str(t.max().astype("datetime64[Y]"))) if t is not None else -1,
        }

    def build_registry(self, cache_path: Optional[str] = None) -> dict:
        """name → {station_id, latitude, longitude, elevation} (the
        generated equivalent of ``STATION_LATLON``)."""
        meta = self.get_metadata()
        reg = {
            r["station_name"]: {
                "station_id": r["station_id"],
                "latitude": r["latitude"],
                "longitude": r["longitude"],
                "elevation": r["elevation"],
            }
            for _, r in meta.iterrows()
        }
        if cache_path:
            with open(cache_path, "w") as f:
                json.dump(reg, f, indent=1)
        return reg

    # -- loading -------------------------------------------------------------------

    def load_station(self, path: str, variable: str, daily: bool = False) -> "pd.DataFrame":
        """One station's frame with lon/lat/name attached
        (``stations.py:59-76``)."""
        short = cfg.VAR_STATIONS[variable]["var_name"]
        ds = open_dataset(path)
        if short not in ds:
            if variable.endswith("wind") and "wind_speed" in ds and "wind_direction" in ds:
                u, v = wind_components(ds["wind_speed"].data, ds["wind_direction"].data)
                vals = u if "u_component" in variable else v
                t = ds["wind_speed"].coords["time"]
            else:
                raise KeyError(f"{short} not in {path}")
        else:
            vals = ds[short].data
            t = ds[short].coords["time"]
        df = pd.DataFrame({
            "time": t.astype("datetime64[s]"),
            f"{short}_station": np.asarray(vals, np.float64),
        })
        if daily:
            how = "sum" if variable == "precipitation" else "mean"
            df = (
                df.set_index("time").resample("1D").agg(how).reset_index()
            )
        meta = self._meta_row(path, ds)
        df["latitude"] = meta["latitude"]
        df["longitude"] = meta["longitude"]
        df["station_name"] = meta["station_name"]
        df["elevation"] = meta["elevation"]
        return df

    def load_stations_time(
        self,
        variable: str,
        times: np.ndarray,
        daily: bool = False,
        remove_stations: Sequence[str] = (),
        keep_stations: Sequence[str] = (),
    ) -> "pd.DataFrame":
        """All stations covering the requested times, with holdout filters
        (``stations.py:216-293``)."""
        times = np.asarray(times, dtype="datetime64[s]")
        t_lo, t_hi = times.min(), times.max()
        frames = []
        for path in self.station_files():
            try:
                df = self.load_station(path, variable, daily=daily)
            except Exception:
                continue
            name = df["station_name"].iloc[0] if len(df) else ""
            if keep_stations and name not in keep_stations:
                continue
            if name in remove_stations:
                continue
            tt = df["time"].to_numpy().astype("datetime64[s]")
            if len(tt) == 0 or tt.min() > t_lo or tt.max() < t_hi:
                continue
            sel = df[np.isin(tt, times)]
            if len(sel):
                frames.append(sel)
        if not frames:
            return pd.DataFrame(
                columns=["time", "latitude", "longitude", "station_name", "elevation"]
            )
        return pd.concat(frames, ignore_index=True)


def save_station_file(path: str, name: str, lat: float, lon: float, elev: float,
                      times: np.ndarray, values_by_var: dict[str, np.ndarray]) -> None:
    """Write a per-station netCDF in the archive layout (test fixtures)."""
    from deepsensornz_tpu.data.grid import Dataset, Field, save_dataset

    fields = {
        short: Field(np.asarray(v, np.float64), ("time",),
                     {"time": np.asarray(times, "datetime64[s]")}, short)
        for short, v in values_by_var.items()
    }
    ds = Dataset(fields, attrs={
        "station_name": name, "latitude": lat, "longitude": lon,
        "elevation": elev, "station_id": abs(hash(name)) % 100000,
    })
    save_dataset(ds, path, float32=False)
