"""NZ data sources: ERA5(-Land), WRF forecasts, station archive, DEM."""

from deepsensornz_tpu.data.sources.era5 import ERA5Source  # noqa: F401
from deepsensornz_tpu.data.sources.wrf import WRFSource  # noqa: F401
from deepsensornz_tpu.data.sources.stations import StationSource  # noqa: F401
from deepsensornz_tpu.data.sources.topography import TopographySource  # noqa: F401
