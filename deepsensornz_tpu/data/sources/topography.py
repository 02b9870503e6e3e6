"""Digital elevation model loader.

Capability parity with ``nzdownscale/dataprocess/topography.py``: opens the
pre-built NZ DEM netCDF (25 m source coarsened offline to ~0.002°,
``topography.py:36-56``) with optional area crop and further coarsening.
"""

from __future__ import annotations

from typing import Optional

from deepsensornz_tpu import config as cfg
from deepsensornz_tpu.data.grid import Field, open_dataset


class TopographySource:
    def __init__(self, path: str):
        self.path = path

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
