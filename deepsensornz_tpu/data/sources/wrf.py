"""WRF NWP forecast loader.

Capability parity with ``nzdownscale/dataprocess/wrf.py``:

- forecast-cycle file discovery: midnight init runs, **skip the first 6
  spin-up hours, take hours 6–30** (``wrf.py:24-88``; model
  ``nz4kmN-ECMWF-SIGMA`` naming at ``validate_WRF.py:89-103``),
- multi-file ingest with per-file variable projection and a per-file
  fallback scan that identifies corrupt members instead of failing the
  whole cycle (``wrf.py:96-161``),
- curvilinear→regular regrid onto the topography grid with **weights
  (triangulation) cached** keyed by grid shapes (``wrf.py:240-274``;
  the legacy scipy path ``wrf.py:277-325`` is the same math per-timestep —
  here the triangulation is built once and reused),
- WRF→ERA5 variable-name alignment (applied by the preprocess layer,
  ``preprocess.py:329-331``).
"""

from __future__ import annotations

import glob
import os
from datetime import datetime, timedelta
from typing import Optional, Sequence

import numpy as np

from deepsensornz_tpu import config as cfg
from deepsensornz_tpu.data.grid import Field, open_dataset

SPINUP_HOURS = 6
CYCLE_HOURS = 24  # hours used per cycle after spin-up (6..30)


class WRFSource:
    """Load WRF forecast cycles from a directory tree of hourly files."""

    def __init__(
        self,
        parent: str,
        model: str = "nz4kmN-ECMWF-SIGMA",
        weights_dir: Optional[str] = None,
    ):
        """``weights_dir``: directory for on-disk regrid-weight persistence
        (the reference's ``regridder_weights.parent``, ``wrf.py:252-271``);
        defaults to ``paths.get_path('regridder_weights')`` when configured,
        else memory-only caching."""
        self.parent = parent
        self.model = model
        self._regrid_cache: dict[tuple, object] = {}
        if weights_dir is None:
            try:
                from deepsensornz_tpu.paths import get_data_paths

                weights_dir = get_data_paths().get("regridder_weights", {}).get("parent")
            except Exception:
                weights_dir = None
        self.weights_dir = weights_dir

    # -- cycle discovery -----------------------------------------------------------

    @staticmethod
    def cycle_hours(init: datetime) -> list[datetime]:
        """Valid times used from one (midnight) init: hours 6..30."""
        return [init + timedelta(hours=h) for h in range(SPINUP_HOURS, SPINUP_HOURS + CYCLE_HOURS)]

    def filename_for(self, init: datetime, valid: datetime) -> str:
        """``<parent>/<YYYYMMDD>/<model>/wrf_hourly_<model>_d02_<valid>.nc``."""
        return os.path.join(
            self.parent,
            init.strftime("%Y%m%d"),
            self.model,
            f"wrf_hourly_{self.model}_d02_{valid.strftime('%Y-%m-%d_%H:%M:%S')}.nc",
        )

    def get_filepaths(self, init_start: datetime, init_end: Optional[datetime] = None,
                      step_days: int = 1) -> list[str]:
        """All hourly files for midnight cycles in [init_start, init_end]."""
        init_end = init_end or init_start
        out = []
        init = init_start.replace(hour=0, minute=0, second=0, microsecond=0)
        while init <= init_end:
            for valid in self.cycle_hours(init):
                path = self.filename_for(init, valid)
                if os.path.exists(path):
                    out.append(path)
            init += timedelta(days=step_days)
        return out

    @staticmethod
    def parse_valid_time(path: str) -> np.datetime64:
        """Valid time from a d02 filename (``train.py:322-325`` parses the
        same ``d02_%Y-%m-%d_%H:%M:%S`` pattern)."""
        stem = os.path.basename(path)
        ts = stem.split("d02_")[-1].replace(".nc", "")
        dt = datetime.strptime(ts, "%Y-%m-%d_%H:%M:%S")
        return np.datetime64(dt)

    # -- loading ----------------------------------------------------------------------

    def load(self, filepaths: Sequence[str], variables: Sequence[str]) -> dict[str, Field]:
        """Load + concatenate hourly files; returns canonical-name → Field.

        Files that fail to open are reported (path list in the exception)
        rather than silently breaking the whole cycle (``wrf.py:145-152``).
        """
        from concurrent.futures import ThreadPoolExecutor

        shorts = {v: cfg.VAR_WRF[v]["var_name"] for v in variables}

        def one(path):
            """(path, time, per-var arrays, lat2d, lon2d) or (path, None…)."""
            try:
                ds = open_dataset(path)
            except Exception:
                return path, None, None, None, None
            cols = {}
            for v, s in shorts.items():
                if s not in ds:
                    raise KeyError(f"variable {s} missing from {path}")
                cols[v] = np.squeeze(ds[s].data)
            la = lo = None
            for latname in ("XLAT", "latitude", "lat"):
                if latname in ds:
                    la = np.squeeze(ds[latname].data)
            for lonname in ("XLONG", "longitude", "lon"):
                if lonname in ds:
                    lo = np.squeeze(ds[lonname].data)
            return path, self.parse_valid_time(path), cols, la, lo

        # hourly member files are independent; read them on a thread pool
        # (h5py releases the GIL per read — same pattern as StationSource;
        # reference role: dask open_mfdataset(parallel=True), wrf.py:141)
        with ThreadPoolExecutor(min(8, max(1, len(filepaths)))) as ex:
            loaded = list(ex.map(one, filepaths))

        per_var: dict[str, list] = {v: [] for v in variables}
        times, bad = [], []
        lat2d = lon2d = None
        for path, t_valid, cols, la, lo in loaded:
            if t_valid is None:
                bad.append(path)
                continue
            times.append(t_valid)
            for v in shorts:
                per_var[v].append(cols[v])
            lat2d = la if la is not None else lat2d
            lon2d = lo if lo is not None else lon2d
        if bad:
            raise IOError(f"unreadable WRF files: {bad}")
        if lat2d is None or lon2d is None:
            raise KeyError("WRF files missing XLAT/XLONG coordinates")
        t = np.asarray(times, dtype="datetime64[s]")
        out = {}
        for v in variables:
            data = np.stack(per_var[v]).astype(np.float32)
            fld = Field(
                data, ("time", "y", "x"),
                {"time": t}, shorts[v],
                {"curvilinear": 1},
            )
            fld.attrs["lat2d"] = lat2d
            fld.attrs["lon2d"] = lon2d
            out[v] = fld
        return out

    # -- regridding -------------------------------------------------------------------

    def _weights_path(self, key: tuple) -> Optional[str]:
        if not self.weights_dir:
            return None
        (sh, nlat, nlon, lat0, lon0) = key
        name = (
            f"regrid_{sh[0]}x{sh[1]}_to_{nlat}x{nlon}"
            f"_{lat0:.4f}_{lon0:.4f}.npz"
        )
        return os.path.join(self.weights_dir, name)

    def _load_weights(self, key: tuple):
        """Load persisted regrid weights (reference persists xESMF weights
        keyed by grid shapes, ``wrf.py:252-271``) — every operational
        process would otherwise pay the Delaunay triangulation again."""
        path = self._weights_path(key)
        if path is None or not os.path.exists(path):
            return None
        try:
            z = np.load(path)
            return z["verts"], z["bary"], z["valid"]
        except Exception:
            return None  # corrupt cache file → recompute

    def _save_weights(self, key: tuple, verts, bary, valid) -> None:
        path = self._weights_path(key)
        if path is None:
            return
        os.makedirs(self.weights_dir, exist_ok=True)
        # per-writer tmp name: two operational processes regridding the same
        # geometry concurrently must not interleave writes into one tmp file
        # before the atomic os.replace
        tmp = f"{path}.{os.getpid()}.tmp"
        np.savez_compressed(tmp, verts=verts, bary=bary, valid=valid)
        # np.savez appends .npz to the tmp name
        os.replace(tmp if os.path.exists(tmp) else tmp + ".npz", path)

    def regrid_to(self, fld: Field, target_lat: np.ndarray, target_lon: np.ndarray) -> Field:
        """Curvilinear → regular bilinear regrid with cached triangulation.

        The Delaunay triangulation + barycentric weights are computed once
        per (source shape, target shape) and reused for every timestep and
        variable — the role of the reference's on-disk xESMF weight cache
        (``wrf.py:252-271``).
        """
        from scipy.spatial import Delaunay

        lat2d = fld.attrs["lat2d"]
        lon2d = fld.attrs["lon2d"]
        key = (lat2d.shape, len(target_lat), len(target_lon),
               float(target_lat[0]), float(target_lon[0]))
        if key not in self._regrid_cache:
            loaded = self._load_weights(key)
            if loaded is not None:
                self._regrid_cache[key] = loaded
        if key not in self._regrid_cache:
            pts = np.column_stack([lat2d.ravel(), lon2d.ravel()])
            tri = Delaunay(pts)
            tg_lat, tg_lon = np.meshgrid(target_lat, target_lon, indexing="ij")
            query = np.column_stack([tg_lat.ravel(), tg_lon.ravel()])
            simplex = tri.find_simplex(query)
            valid = simplex >= 0
            verts = tri.simplices[np.maximum(simplex, 0)]
            T = tri.transform[np.maximum(simplex, 0)]
            bary2 = np.einsum("nij,nj->ni", T[:, :2], query - T[:, 2])
            bary = np.column_stack([bary2, 1.0 - bary2.sum(1)])
            self._regrid_cache[key] = (verts, bary, valid)
            self._save_weights(key, verts, bary, valid)
        verts, bary, valid = self._regrid_cache[key]

        data = fld.data.reshape(fld.data.shape[0], -1)
        vals = data[:, verts]  # (T, P, 3)
        out = np.einsum("tpv,pv->tp", np.nan_to_num(vals), bary)
        out[:, ~valid] = np.nan
        out = out.reshape(fld.data.shape[0], len(target_lat), len(target_lon))
        return Field(
            out.astype(np.float32), ("time", "latitude", "longitude"),
            {"time": fld.coords["time"], "latitude": np.asarray(target_lat),
             "longitude": np.asarray(target_lon)},
            fld.name, {"units": fld.attrs.get("units", "")},
        )
