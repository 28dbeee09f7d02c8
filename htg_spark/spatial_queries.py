"""Driver-contract queries for the spatial key/join additions: geohash
encoding (the interoperable base-32 cell string alongside the integer
cell_id scheme) and the grid-bucketed radius self-join.

Parity design:
- the geohash is ONE double multiply+floor per axis (identical op order on
  both engines) followed by pure integer bit math; the DuckDB mirror is
  GENERATED from the same Python loops as the Spark expression
  (cells.geohash_interleave / geohash_chars), so the two cannot drift.
- the radius-join oracle is INDEPENDENT: a bbox range self-join (no grid
  cells at all) with a 2r-wide prefilter, then the same exact d2 <= r2
  predicate — a covering-cell bug on the Spark side (missed neighbor cell,
  wrong floor) surfaces as a value mismatch, not a shared blind spot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import cells
from .driver_queries import _SQL_PTS, derive_points
from .operators import geo_misc

GEOHASH_PRECISION = 6
RADIUS_SCALE = 2048  # r = 2^-11 deg — ~4.9 steps of the fixture's 1e-4 lattice


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def q_geohash_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-point geohash at precision 6 plus the precision-4 prefix.
    Geohash prefixes nest exactly (floor(floor(q*2^15)/2^5) == floor(q*2^10)),
    so the coarser cell is substring — the property that makes geohash a
    multi-resolution partition key for spatial bucketing at scale."""
    p = GEOHASH_PRECISION
    pts = derive_points(_events(spark, sf_dir))
    idx = pts.select(
        "event_id",
        cells.geohash_lon_idx(F.col("lon"), p).alias("lon_idx"),
        cells.geohash_lat_idx(F.col("lat"), p).alias("lat_idx"),
    )
    code = idx.select(
        "event_id",
        cells.geohash_interleave(F.col("lon_idx"), F.col("lat_idx"), p).alias("gh_code"),
    )
    gh = code.select(
        "event_id", "gh_code", cells.geohash_chars(F.col("gh_code"), p).alias("gh6")
    )
    return gh.select(
        "event_id", "gh_code", "gh6", F.substring("gh6", 1, 4).alias("gh4")
    )


def q_radius_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = derive_points(_events(spark, sf_dir))
    return geo_misc.radius_neighbors(
        pts, scale=RADIUS_SCALE, id_col="event_id", x_col="lon", y_col="lat"
    )


# --- DuckDB oracles ---------------------------------------------------------


def _geohash_oracle_sql(precision: int = GEOHASH_PRECISION) -> str:
    """Mirror generated from the SAME loops as cells.geohash_* — one shared
    bit layout, two rendering targets."""
    bits, lon_bits, lat_bits = cells.geohash_axis_bits(precision)
    lon_idx = (
        f"greatest(least(CAST(floor((lon + 180.0) / 360.0 * {float(1 << lon_bits)!r}) "
        f"AS BIGINT), {(1 << lon_bits) - 1}), 0)"
    )
    lat_idx = (
        f"greatest(least(CAST(floor((lat + 90.0) / 180.0 * {float(1 << lat_bits)!r}) "
        f"AS BIGINT), {(1 << lat_bits) - 1}), 0)"
    )
    terms = []
    for t in range(bits):
        if t % 2 == 0:
            src, sbit = "lon_idx", lon_bits - 1 - t // 2
        else:
            src, sbit = "lat_idx", lat_bits - 1 - t // 2
        terms.append(f"((({src} >> {sbit}) & 1) * {1 << (bits - 1 - t)})")
    code = " + ".join(terms)
    chars = " || ".join(
        f"substr('{cells.GEOHASH32}', "
        f"CAST(((gh_code >> {5 * (precision - 1 - c)}) & 31) + 1 AS INT), 1)"
        for c in range(precision)
    )
    return f"""
{_SQL_PTS.strip()},
idx AS (SELECT event_id, {lon_idx} AS lon_idx, {lat_idx} AS lat_idx FROM pts),
code AS (SELECT event_id, {code} AS gh_code FROM idx),
gh AS (SELECT event_id, gh_code, {chars} AS gh6 FROM code)
SELECT event_id, gh_code, gh6, substr(gh6, 1, 4) AS gh4 FROM gh
"""


def _radius_oracle_sql(scale: int = RADIUS_SCALE) -> str:
    r = 1.0 / scale
    # bbox prefilter uses 2r so a half-ulp rounding of (lon - r) can never
    # drop a pair the exact d2 <= r2 predicate would keep
    return f"""
{_SQL_PTS.strip()},
prs AS (
  SELECT a.event_id AS id, (a.lon - b.lon) AS dx, (a.lat - b.lat) AS dy
  FROM pts a JOIN pts b
    ON b.lon >= a.lon - {2 * r!r} AND b.lon <= a.lon + {2 * r!r}
   AND b.lat >= a.lat - {2 * r!r} AND b.lat <= a.lat + {2 * r!r}
   AND a.event_id <> b.event_id
),
hits AS (
  SELECT id, count(*) AS n_neighbors, min(dx * dx + dy * dy) AS min_d2
  FROM prs WHERE dx * dx + dy * dy <= {r * r!r} GROUP BY id
)
SELECT p.event_id, coalesce(h.n_neighbors, 0) AS n_neighbors, h.min_d2
FROM pts p LEFT JOIN hits h ON p.event_id = h.id
"""


def queries():
    return {
        "geohash_cells": q_geohash_cells,
        "radius_neighbors": q_radius_neighbors,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "geohash_cells": _geohash_oracle_sql(),
        "radius_neighbors": _radius_oracle_sql(),
    }
