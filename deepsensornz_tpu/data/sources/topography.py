"""Digital elevation model loader.

Capability parity with ``nzdownscale/dataprocess/topography.py``: opens the
pre-built NZ DEM netCDF (25 m source coarsened offline to ~0.002°,
``topography.py:36-56``) with optional area crop and further coarsening.
"""

from __future__ import annotations

import glob
import os
import re
from typing import Optional

from deepsensornz_tpu import config as cfg
from deepsensornz_tpu.data.grid import Field, open_dataset


class TopographySource:
    def __init__(self, path: str):
        self.path = path

    @classmethod
    def discover(cls, parent: str, pattern: str = "nz_elevation_*.nc"
                 ) -> "TopographySource":
        """Find the DEM by the reference archive's naming convention —
        ``nz_elevation_<res>.nc`` under the topography parent folder
        (``topography.py:36-56`` builds e.g. ``nz_elevation_25m.nc`` /
        ``nz_elevation_200m.nc``). With several resolutions present, the
        FINEST (smallest ``<N>m``) wins; unparsable names sort last."""
        hits = sorted(glob.glob(os.path.join(parent, pattern)))
        if not hits:
            raise FileNotFoundError(
                f"no DEM matching {pattern!r} under {parent!r} "
                "(reference convention: nz_elevation_<res>m.nc)"
            )

        def res_m(p: str) -> float:
            m = re.search(r"_(\d+)m", os.path.basename(p))
            return float(m.group(1)) if m else float("inf")

        return cls(min(hits, key=res_m))

    def load(self, area: Optional[str] = None, coarsen: int = 1) -> Field:
        ds = open_dataset(self.path)
        name = "elevation" if "elevation" in ds else next(iter(ds.keys()))
        dem = ds[name].rename("elevation")
        if area is not None:
            e = cfg.EXTENTS[area]
            lat = dem.coords["latitude"]
            asc = lat[0] < lat[-1]
            lat_slice = (
                slice(e["minlat"], e["maxlat"]) if asc else slice(e["maxlat"], e["minlat"])
            )
            dem = dem.sel(latitude=lat_slice, longitude=slice(e["minlon"], e["maxlon"]))
        if coarsen > 1:
            dem = dem.coarsen(coarsen)
        return dem


def topography_from_paths(paths: dict) -> TopographySource:
    """Resolve the DEM from a DATA_PATHS-style dict: explicit
    ``topography.file`` wins (reference ``config_local`` convention,
    ``topography.py:17-18``); otherwise discover ``nz_elevation_*.nc``
    under ``topography.parent`` (``topography.py:36``)."""
    topo = paths.get("topography", {})
    if topo.get("file"):
        return TopographySource(topo["file"])
    if topo.get("parent"):
        return TopographySource.discover(topo["parent"])
    raise KeyError(
        "DATA_PATHS['topography'] needs 'file' or 'parent' "
        "(nz_elevation_*.nc discovery)"
    )
