"""Native (C++) host-side runtime components, loaded via ctypes.

``libtaskpack.so`` implements the TaskLoader's host hot path — per-date row
bucketing + padded batch packing + aux-grid gather (``native/taskpack.cpp``).
The library is built on demand with g++ if missing; every entry point has a
pure-numpy fallback so the framework works without a toolchain.
"""

from deepsensornz_tpu.native.taskpack import (  # noqa: F401
    available,
    pack_station_batches,
    interp_grid_points_native,
)
