"""DataProcessor: coordinate maps + per-variable value normalisation.

Rebuilds the engine-level ``deepsensor.data.DataProcessor`` capability the
reference depends on (call sites: ``nzdownscale/downscaler/preprocess.py:23,
751-849``, ``validate_ERA.py:146,175``):

- maps geographic ``latitude``/``longitude`` to normalised ``x1``/``x2``
  via linear maps derived from the data extent,
- per-variable value normalisation with methods ``mean_std``, ``min_max``
  (to [-1, 1]) and ``positive_semidefinite`` (divide by std, for
  non-negative variables like precipitation),
- lazily computes & caches stats in a ``config`` dict keyed by variable name,
- works on :class:`Field`, :class:`Dataset`, pandas DataFrames, and lists,
- exact inverses (``unnormalise``) including coordinate back-mapping,
- apply-only mode (``assert_computed=True``) and JSON/pickle serialisation.
"""

from __future__ import annotations

import json
from typing import Any, Sequence

import numpy as np

from deepsensornz_tpu.data.grid import Dataset, Field

try:
    import pandas as pd

    _HAS_PANDAS = True
except Exception:  # pragma: no cover
    _HAS_PANDAS = False

METHODS = ("mean_std", "min_max", "positive_semidefinite")


class DataProcessor:
    """Normalise data + coordinates into model space and back."""

    def __init__(
        self,
        x1_map: tuple[float, float] | None = None,
        x2_map: tuple[float, float] | None = None,
        x1_name: str = "latitude",
        x2_name: str = "longitude",
        config: dict[str, Any] | None = None,
    ):
        # (lo, hi) in raw coordinates mapping to x in [0, (hi-lo)/scale].
        self.x1_map = tuple(x1_map) if x1_map is not None else None
        self.x2_map = tuple(x2_map) if x2_map is not None else None
        self.x1_name = x1_name
        self.x2_name = x2_name
        # var name -> {"method": ..., "params": {...}}
        self.config: dict[str, Any] = dict(config or {})

    # -- coordinate maps ------------------------------------------------------

    def set_coord_maps_from_extent(self, minlat, maxlat, minlon, maxlon) -> None:
        """Derive x1/x2 maps from a data extent (parity: preprocess.py:771-778)."""
        self.x1_map = (float(minlat), float(maxlat))
        self.x2_map = (float(minlon), float(maxlon))

    def map_x1(self, lat) -> np.ndarray:
        lo, hi = self.x1_map
        return (np.asarray(lat, dtype=np.float64) - lo) / (hi - lo)

    def map_x2(self, lon) -> np.ndarray:
        lo, hi = self.x2_map
        return (np.asarray(lon, dtype=np.float64) - lo) / (hi - lo)

    def unmap_x1(self, x1) -> np.ndarray:
        lo, hi = self.x1_map
        return np.asarray(x1, dtype=np.float64) * (hi - lo) + lo

    def unmap_x2(self, x2) -> np.ndarray:
        lo, hi = self.x2_map
        return np.asarray(x2, dtype=np.float64) * (hi - lo) + lo

    # -- value normalisation ---------------------------------------------------

    def _fit(self, name: str, values: np.ndarray, method: str) -> dict:
        v = np.asarray(values, dtype=np.float64)
        v = v[np.isfinite(v)]
        if method == "mean_std":
            params = {"mean": float(v.mean()), "std": float(max(v.std(), 1e-12))}
        elif method == "min_max":
            params = {"min": float(v.min()), "max": float(v.max())}
        elif method == "positive_semidefinite":
            params = {"std": float(max(v.std(), 1e-12))}
        else:
            raise ValueError(f"unknown normalisation method {method!r}")
        self.config[name] = {"method": method, "params": params}
        return self.config[name]

    def _apply_values(self, name: str, values: np.ndarray, inverse: bool) -> np.ndarray:
        cfg = self.config[name]
        p = cfg["params"]
        m = cfg["method"]
        v = np.asarray(values, dtype=np.float64)
        if m == "mean_std":
            out = v * p["std"] + p["mean"] if inverse else (v - p["mean"]) / p["std"]
        elif m == "min_max":
            # maps [min, max] -> [-1, 1] (the reference then shifts humidity
            # to [0, 1] itself, preprocess.py:209-211)
            span = max(p["max"] - p["min"], 1e-12)
            out = (v + 1.0) / 2.0 * span + p["min"] if inverse else 2.0 * (v - p["min"]) / span - 1.0
        elif m == "positive_semidefinite":
            out = v * p["std"] if inverse else v / p["std"]
        else:  # pragma: no cover
            raise ValueError(m)
        return out.astype(values.dtype if np.issubdtype(np.asarray(values).dtype, np.floating) else np.float64)

    # -- public API -------------------------------------------------------------

    def __call__(self, data, method: str | None = None, assert_computed: bool = False):
        """Normalise Field/Dataset/DataFrame (or list thereof) into model space."""
        if isinstance(data, (list, tuple)):
            return [self(d, method=method, assert_computed=assert_computed) for d in data]
        if isinstance(data, Dataset):
            return Dataset(
                {k: self(v, method=method, assert_computed=assert_computed) for k, v in data.items()},
                dict(data.attrs),
            )
        if isinstance(data, Field):
            return self._process_field(data, method, inverse=False, assert_computed=assert_computed)
        if _HAS_PANDAS and isinstance(data, pd.DataFrame):
            return self._process_df(data, method, inverse=False, assert_computed=assert_computed)
        raise TypeError(f"cannot process {type(data)}")

    def unnormalise(self, data):
        """Inverse transform back to physical units + geographic coords."""
        if isinstance(data, (list, tuple)):
            return [self.unnormalise(d) for d in data]
        if isinstance(data, Dataset):
            return Dataset({k: self.unnormalise(v) for k, v in data.items()}, dict(data.attrs))
        if isinstance(data, Field):
            return self._process_field(data, None, inverse=True, assert_computed=True)
        if _HAS_PANDAS and isinstance(data, pd.DataFrame):
            return self._process_df(data, None, inverse=True, assert_computed=True)
        raise TypeError(f"cannot unnormalise {type(data)}")

    # -- Field path ---------------------------------------------------------------

    def _process_field(self, f: Field, method, inverse: bool, assert_computed: bool) -> Field:
        name = f.name
        if inverse:
            if name not in self.config:
                raise KeyError(f"no normalisation stats for {name!r}")
        elif name not in self.config:
            if assert_computed:
                raise KeyError(f"stats for {name!r} not computed and assert_computed=True")
            self._fit(name, f.data, method or "mean_std")
        data = self._apply_values(name, f.data, inverse)
        coords = dict(f.coords)
        dims = list(f.dims)
        if inverse:
            ren = {}
            if "x1" in coords:
                coords[self.x1_name] = self.unmap_x1(coords.pop("x1"))
                ren["x1"] = self.x1_name
            if "x2" in coords:
                coords[self.x2_name] = self.unmap_x2(coords.pop("x2"))
                ren["x2"] = self.x2_name
            dims = [ren.get(d, d) for d in dims]
        else:
            ren = {}
            if self.x1_name in coords:
                coords["x1"] = self.map_x1(coords.pop(self.x1_name))
                ren[self.x1_name] = "x1"
            if self.x2_name in coords:
                coords["x2"] = self.map_x2(coords.pop(self.x2_name))
                ren[self.x2_name] = "x2"
            dims = [ren.get(d, d) for d in dims]
        return Field(data, tuple(dims), coords, name, dict(f.attrs))

    # -- DataFrame path --------------------------------------------------------------

    def _process_df(self, df, method, inverse: bool, assert_computed: bool):
        df = df.reset_index() if df.index.nlevels > 1 or df.index.name else df.copy()
        out = df.copy()
        if inverse:
            if "x1" in out.columns:
                out[self.x1_name] = self.unmap_x1(out.pop("x1").to_numpy())
            if "x2" in out.columns:
                out[self.x2_name] = self.unmap_x2(out.pop("x2").to_numpy())
        else:
            if self.x1_name in out.columns:
                out["x1"] = self.map_x1(out.pop(self.x1_name).to_numpy())
            if self.x2_name in out.columns:
                out["x2"] = self.map_x2(out.pop(self.x2_name).to_numpy())
        coord_cols = {"time", "x1", "x2", self.x1_name, self.x2_name, "station_id", "station_name", "elevation"}
        for col in out.columns:
            if col in coord_cols or not np.issubdtype(out[col].dtype, np.number):
                continue
            if inverse:
                if col not in self.config:
                    continue
            elif col not in self.config:
                if assert_computed:
                    raise KeyError(f"stats for {col!r} not computed and assert_computed=True")
                self._fit(col, out[col].to_numpy(), method or "mean_std")
            out[col] = self._apply_values(col, out[col].to_numpy(), inverse)
        return out

    # -- (de)serialisation --------------------------------------------------------------

    def to_dict(self) -> dict:
        return {
            "x1_map": self.x1_map,
            "x2_map": self.x2_map,
            "x1_name": self.x1_name,
            "x2_name": self.x2_name,
            "config": self.config,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "DataProcessor":
        return cls(
            x1_map=d.get("x1_map"),
            x2_map=d.get("x2_map"),
            x1_name=d.get("x1_name", "latitude"),
            x2_name=d.get("x2_name", "longitude"),
            config=d.get("config"),
        )

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=2)

    @classmethod
    def load(cls, path: str) -> "DataProcessor":
        with open(path) as f:
            return cls.from_dict(json.load(f))

    def __repr__(self):
        return (
            f"<DataProcessor x1_map={self.x1_map} x2_map={self.x2_map} "
            f"vars={list(self.config)}>"
        )
