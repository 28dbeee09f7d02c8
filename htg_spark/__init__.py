"""htg_spark — a PySpark-native spatial-join + tiling engine.

Re-expresses SRTM-style per-point elevation lookup (reference:
pedrosanzmtz/htg, a Rust mmap/LRU engine) as bulk raster<->vector joins over
DataFrames: geotagged image+caption rows are cell-encoded in vectorized
Arrow UDFs and joined (broadcast or range-partitioned, skew-salted) against
a tile catalog of HGT grids, with nearest/floor/bilinear kernels, kNN
nearest-tile fallback, per-partition checkpoint lineage, and exact parity
with the reference's index math and void/missing semantics.
"""

from .hgt import (  # noqa: F401
    VOID_VALUE,
    coords_to_filename,
    filename_to_lat_lon,
    is_valid_srtm_coord,
    lat_lon_to_filename,
)

__version__ = "0.2.0"
