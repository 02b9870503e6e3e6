"""Weather-station archive loader (one netCDF per station).

Capability parity with ``nzdownscale/dataprocess/stations.py``, reading the
REFERENCE archive's on-disk conventions:

- per-variable subfolder layout ``{parent}/{VAR_STATIONS[var]['subdir']}/
  *.nc`` (``get_parent_path``, ``stations.py:21-24,46-51``), with a flat
  ``{parent}/*.nc`` fallback for single-folder archives,
- station name in ``ds.attrs['site name']``, id in
  ``attrs['agent_number']`` / the filename stem (``stations.py:74,91-92,
  190-191``),
- latitude/longitude/elevation stored as dataset *variables*
  (``float(ds.longitude)``, ``station_height`` — ``stations.py:79-82,
  192-198``), attrs accepted as fallback,
- metadata scan with a SKIP COUNTER for unreadable files (the reference
  skips silently, ``stations.py:117-118``; here every scan records
  ``self.skipped`` and warns, so a mis-pointed archive cannot read as
  "zero stations" without a trace),
- single-station frames with optional daily resample and attached
  lon/lat/name (``stations.py:59-76``),
- time-targeted multi-station load keeping stations that cover the
  requested range, daily mean/sum option, ``remove_stations`` /
  ``keep_stations`` holdout filters, value column named
  ``{var}_station`` (``stations.py:216-293``),
- u/v wind derivation from the archive's speed+direction variables
  (``stations.py:295-303``),
- station registry builder — the generator behind the reference's
  hard-coded 619-entry ``STATION_LATLON`` table (``stations.py:181-214``,
  ``config.py:208-2683``) — cached to JSON.
"""

from __future__ import annotations

import glob
import json
import os
import warnings
from typing import Optional, Sequence

import numpy as np

from deepsensornz_tpu import config as cfg
from deepsensornz_tpu.data.features import wind_components
from deepsensornz_tpu.data.grid import open_dataset

try:
    import pandas as pd
except Exception:  # pragma: no cover
    pd = None


class VariableAbsent(KeyError):
    """The file opened fine but does not carry the requested variable —
    benign (mixed archives), unlike a structurally broken file."""


def _scalar_var(ds, name: str) -> Optional[float]:
    """A 0-d (or length-1) dataset variable as float, else None."""
    if name in ds:
        v = np.asarray(ds[name].data).ravel()
        if v.size >= 1:
            return float(v[0])
    return None


class StationSource:
    """Load station observations from a reference-layout archive.

    A persisted per-archive metadata index (name/coords/time span/variables
    per file, keyed by (mtime, size)) lets time-targeted loads open ONLY the
    files that can contribute — a monthly operational predict stops paying a
    619-file rescan (VERDICT r4 item 7; the reference leaned on dask for
    this, ``wrf.py:141``/``utils.py:305``). Loads fan out over a thread
    pool; HDF5 serialises internally, but frame assembly overlaps I/O.
    """

    INDEX_NAME = ".dsnz_station_index.json"

    def __init__(self, parent: str, index_path: Optional[str] = None,
                 n_workers: int = 8):
        self.parent = parent
        # unreadable/ill-formed files from the LAST scan — the reference
        # swallows these silently (stations.py:117-118); surfacing the count
        # is what distinguishes "empty archive" from "wrong archive format"
        self.skipped: list[str] = []
        self.index_path = index_path or os.path.join(parent, self.INDEX_NAME)
        self.n_workers = n_workers
        self._index: Optional[dict] = None

    def variable_dir(self, variable: Optional[str]) -> str:
        """Archive folder for a variable: ``{parent}/{subdir}`` when the
        reference's per-variable layout is present, else ``parent``."""
        if variable is not None:
            sub = cfg.VAR_STATIONS.get(variable, {}).get("subdir")
            if sub and os.path.isdir(os.path.join(self.parent, sub)):
                return os.path.join(self.parent, sub)
        return self.parent

    def station_files(self, variable: Optional[str] = None) -> list[str]:
        return sorted(glob.glob(os.path.join(self.variable_dir(variable), "*.nc")))

    # -- metadata ------------------------------------------------------------------

    def get_metadata(self, variable: Optional[str] = None) -> "pd.DataFrame":
        """Per-station name/id/lat/lon/elevation/first/last year
        (``get_metadata_dict``, ``stations.py:96-120``). Unreadable files
        are counted in ``self.skipped`` and reported with a warning."""
        from concurrent.futures import ThreadPoolExecutor

        def one(path):
            try:
                return path, self._meta_row(path, open_dataset(path))
            except Exception:
                return path, None

        with ThreadPoolExecutor(self.n_workers) as ex:
            results = list(ex.map(one, self.station_files(variable)))
        rows = [r for _, r in results if r is not None]
        self.skipped = [p for p, r in results if r is None]
        self._warn_skipped("metadata scan")
        return pd.DataFrame(rows)

    def _warn_skipped(self, what: str) -> None:
        if self.skipped:
            warnings.warn(
                f"StationSource {what}: skipped {len(self.skipped)} "
                f"unreadable station file(s), e.g. {self.skipped[0]!r} "
                "(see .skipped for the full list)",
                stacklevel=3,
            )

    @staticmethod
    def _meta_row(path: str, ds) -> dict:
        """One metadata row, reading the REFERENCE schema first:
        name = attrs['site name'], id = attrs['agent_number'] (filename stem
        as fallback — ``get_metadata_df``, ``stations.py:91-92``), lat/lon/
        elevation as dataset variables (``stations.py:79-82,192-198``)."""
        attrs = ds.attrs
        stem = os.path.basename(path).replace(".nc", "")
        name = attrs.get("site name", attrs.get("station_name", stem))
        station_id = attrs.get("agent_number", attrs.get("station_id", stem))
        if isinstance(station_id, np.ndarray):
            station_id = station_id.ravel()[0]
        if isinstance(station_id, np.integer):
            station_id = int(station_id)
        lat = _scalar_var(ds, "latitude")
        if lat is None:
            lat = float(attrs.get("latitude", np.nan))
        lon = _scalar_var(ds, "longitude")
        if lon is None:
            lon = float(attrs.get("longitude", np.nan))
        elev = _scalar_var(ds, "station_height")
        if elev is None:
            elev = float(attrs.get("elevation", np.nan))
        t = None
        for f in ds.values():
            if "time" in f.dims:
                t = f.coords.get("time")
                break
        return {
            "file": path,
            "station_name": name,
            "station_id": station_id,
            "latitude": lat,
            "longitude": lon,
            "elevation": elev,
            "start_year": int(str(t.min().astype("datetime64[Y]"))) if t is not None else -1,
            "end_year": int(str(t.max().astype("datetime64[Y]"))) if t is not None else -1,
        }

    def build_registry(self, cache_path: Optional[str] = None,
                       variables: Optional[Sequence[str]] = None) -> dict:
        """name → {station_id, latitude, longitude, elevation}: the
        generator of the reference's ``STATION_LATLON`` table
        (``get_all_station_info``, ``stations.py:205-214`` — first
        occurrence of a name across variables wins).

        With ``variables=None`` every variable whose per-variable subfolder
        exists is scanned (plus the flat parent for single-folder archives)
        — defaulting to the flat parent alone would silently produce an
        empty registry on a reference-layout archive."""
        if variables:
            variables = list(variables)
        else:
            variables = [v for v in cfg.VAR_STATIONS
                         if self.variable_dir(v) != self.parent]
            if self.station_files(None):
                variables.append(None)  # flat single-folder archive
        reg: dict = {}
        for var in variables:
            meta = self.get_metadata(var)
            for _, r in meta.iterrows():
                reg.setdefault(r["station_name"], {
                    "station_id": r["station_id"],
                    "latitude": r["latitude"],
                    "longitude": r["longitude"],
                    "elevation": r["elevation"],
                })
        if not reg:
            warnings.warn(
                f"StationSource.build_registry: no stations found under "
                f"{self.parent!r} (scanned {variables!r}) — wrong archive "
                "path or layout?", stacklevel=2,
            )
        if cache_path:
            with open(cache_path, "w") as f:
                json.dump(reg, f, indent=1)
        return reg

    # -- metadata index --------------------------------------------------------

    def _scan_index_entry(self, path: str) -> Optional[dict]:
        """One file's index record: identity + coords + time span + the
        variable short-names it carries. None = unreadable."""
        try:
            st = os.stat(path)
            ds = open_dataset(path)
            meta = self._meta_row(path, ds)
            t0 = t1 = None
            names = []
            for n, f in ds.items():
                if "time" in f.dims and len(f.coords.get("time", ())):
                    names.append(n)
                    tt = f.coords["time"].astype("datetime64[s]")
                    lo, hi = str(tt.min()), str(tt.max())
                    t0 = lo if t0 is None or lo < t0 else t0
                    t1 = hi if t1 is None or hi > t1 else t1
            return {
                "mtime": st.st_mtime, "size": st.st_size,
                "station_name": str(meta["station_name"]),
                "station_id": str(meta["station_id"]),
                "latitude": meta["latitude"], "longitude": meta["longitude"],
                "elevation": meta["elevation"],
                "t_min": t0, "t_max": t1, "variables": sorted(names),
            }
        except Exception:
            return None

    def build_index(self, variable: Optional[str] = None,
                    persist: bool = True) -> dict:
        """(Re)build the archive index for one variable folder: reuse
        entries whose (mtime, size) match, scan the rest in a thread pool,
        persist atomically next to the archive (skipped silently when the
        archive is read-only)."""
        from concurrent.futures import ThreadPoolExecutor

        index = dict(self._load_index())
        files = self.station_files(variable)
        todo = []
        for p in files:
            ent = index.get(p)
            try:
                st = os.stat(p)
            except OSError:
                continue
            if not ent or ent.get("mtime") != st.st_mtime \
                    or ent.get("size") != st.st_size:
                todo.append(p)
        if todo:
            with ThreadPoolExecutor(self.n_workers) as ex:
                for p, ent in zip(todo, ex.map(self._scan_index_entry, todo)):
                    if ent is not None:
                        index[p] = ent
                    else:
                        index.pop(p, None)
            if persist:
                self._persist_index(index)
        self._index = index
        return index

    def _load_index(self) -> dict:
        if self._index is not None:
            return self._index
        try:
            with open(self.index_path) as f:
                self._index = json.load(f)
        except Exception:
            self._index = {}
        return self._index

    def _persist_index(self, index: dict) -> None:
        try:
            tmp = f"{self.index_path}.{os.getpid()}.tmp"
            with open(tmp, "w") as f:
                json.dump(index, f)
            os.replace(tmp, self.index_path)
        except OSError:
            pass  # read-only archive: in-memory index still serves this run

    # -- loading -------------------------------------------------------------------

    def _values_and_time(self, ds, path: str, variable: str):
        """Value series + time coord for one station file, deriving u/v wind
        from the archive's speed/direction (``stations.py:295-303``)."""
        short = cfg.VAR_STATIONS[variable]["var_name"]
        if short in ds:
            return ds[short].data, ds[short].coords["time"]
        if "wind" in variable:
            # reference files carry 'speed'/'direction'; legacy fixtures
            # 'wind_speed'/'wind_direction'
            for sp, dr in (("speed", "direction"), ("wind_speed", "wind_direction")):
                if sp in ds and dr in ds:
                    u, v = wind_components(ds[sp].data, ds[dr].data)
                    vals = u if "u_component" in variable else v
                    return vals, ds[sp].coords["time"]
        raise VariableAbsent(f"{short} not in {path}")

    def load_station(self, path: str, variable: str, daily: bool = False,
                     time_window: tuple | None = None) -> "pd.DataFrame":
        """One station's frame with lon/lat/name attached
        (``load_station_df``, ``stations.py:59-76``). ``time_window``
        restricts the read to the window's rows (h5py hyperslab)."""
        short = cfg.VAR_STATIONS[variable]["var_name"]
        ds = open_dataset(path, time_window=time_window)
        vals, t = self._values_and_time(ds, path, variable)
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
        use_index: bool = True,
    ) -> "pd.DataFrame":
        """All stations covering the requested times, with holdout filters
        (``stations.py:216-293``). Unreadable files are counted in
        ``self.skipped`` (+ warning) rather than silently eaten.

        With ``use_index`` (default) the persisted archive index prefilters
        files (conservatively — only certain drops are skipped; unindexed
        files always get the real load), and the survivors load through a
        thread pool. Same output frame either way
        (tests/test_sources.py)."""
        from concurrent.futures import ThreadPoolExecutor

        times = np.asarray(times, dtype="datetime64[s]")
        if daily:
            # daily-resampled station series carry midnight stamps; floor
            # the query times to days so an HOURLY query still matches
            # (the coverage check below otherwise drops every station:
            # its last daily stamp is midnight, strictly below any
            # intra-day t_hi)
            times = np.unique(times.astype("datetime64[D]")
                              .astype("datetime64[s]"))
        t_lo, t_hi = times.min(), times.max()

        # index prefilter: drop files the full load would CERTAINLY drop
        # (name filter, variable absent, span cannot cover the query);
        # unindexed/stale files always fall through to the real load so the
        # skip counter keeps its contract
        short = cfg.VAR_STATIONS[variable]["var_name"]
        index = self.build_index(variable) if use_index else {}
        candidates = []
        for path in self.station_files(variable):
            ent = index.get(path)
            if ent:
                name = ent["station_name"]
                if keep_stations and name not in keep_stations:
                    continue
                if name in remove_stations:
                    continue
                have = set(ent.get("variables", ()))
                if not (short in have
                        or ("wind" in variable
                            and ({"speed", "direction"} <= have
                                 or {"wind_speed", "wind_direction"} <= have))):
                    continue
                if ent.get("t_min") is None:
                    continue
                e0 = np.datetime64(ent["t_min"], "s")
                e1 = np.datetime64(ent["t_max"], "s")
                if daily:
                    e0 = e0.astype("datetime64[D]").astype("datetime64[s]")
                    e1 = e1.astype("datetime64[D]").astype("datetime64[s]")
                if e0 > t_lo or e1 < t_hi:
                    continue
            candidates.append(path)

        # indexed files passed the coverage check on their RAW span above,
        # so they can read just the query window (whole days when daily, so
        # the resample sees complete days); unindexed files read whole and
        # keep the original frame-level coverage check
        hi_ext = (t_hi + np.timedelta64(86399, "s")) if daily else t_hi

        def one(path):
            windowed = path in index
            try:
                df = self.load_station(
                    path, variable, daily=daily,
                    time_window=(t_lo, hi_ext) if windowed else None)
                return "ok", path, df, windowed
            except VariableAbsent:
                return "absent", path, None, windowed
            except Exception:
                # includes KeyErrors raised deeper in load_station (value
                # variable present but e.g. no time coord): structurally
                # broken files must be COUNTED, not read as variable-absent
                return "bad", path, None, windowed

        with ThreadPoolExecutor(self.n_workers) as ex:
            results = list(ex.map(one, candidates))
        self.skipped = [p for s, p, _, _ in results if s == "bad"]
        frames = []
        for s, _, df, windowed in results:
            if s != "ok":
                continue
            name = df["station_name"].iloc[0] if len(df) else ""
            if keep_stations and name not in keep_stations:
                continue
            if name in remove_stations:
                continue
            tt = df["time"].to_numpy().astype("datetime64[s]")
            if len(tt) == 0 or (not windowed
                                and (tt.min() > t_lo or tt.max() < t_hi)):
                continue
            sel = df[np.isin(tt, times)]
            if len(sel):
                frames.append(sel)
        self._warn_skipped("load_stations_time")
        if not frames:
            return pd.DataFrame(
                columns=["time", "latitude", "longitude", "station_name", "elevation"]
            )
        return pd.concat(frames, ignore_index=True)


def save_station_file(path: str, name: str, lat: float, lon: float, elev: float,
                      times: np.ndarray, values_by_var: dict[str, np.ndarray]) -> None:
    """Write a per-station netCDF in the legacy fixture layout (attrs-based
    metadata). Kept for pre-round-3 fixtures; new fixtures should use
    :func:`save_station_file_reference`, which writes the REFERENCE schema
    the production archive actually uses."""
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


def save_station_file_reference(
    path: str, name: str, agent_number: int, lat: float, lon: float,
    elev: Optional[float], times: np.ndarray,
    values_by_var: dict[str, np.ndarray],
) -> None:
    """Write a per-station netCDF in the REFERENCE archive schema: station
    name in ``attrs['site name']``, id in ``attrs['agent_number']``, lat/lon
    and ``station_height`` as scalar dataset VARIABLES
    (``stations.py:74,79-82,190-198``). Test fixtures written with this
    exercise the loaders against the production contract, not a mirror of
    their own output. ``elev=None`` omits ``station_height`` (the archive
    has stations with missing elevation, ``stations.py:194-198``)."""
    from deepsensornz_tpu.data.grid import Dataset, Field, save_dataset

    t = np.asarray(times, "datetime64[s]")
    fields = {
        short: Field(np.asarray(v, np.float64), ("time",), {"time": t}, short)
        for short, v in values_by_var.items()
    }
    fields["latitude"] = Field(np.float64(lat), (), {}, "latitude")
    fields["longitude"] = Field(np.float64(lon), (), {}, "longitude")
    if elev is not None:
        fields["station_height"] = Field(np.float64(elev), (), {}, "station_height")
    ds = Dataset(fields, attrs={"site name": name, "agent_number": int(agent_number)})
    save_dataset(ds, path, float32=False)
