"""Point-in-polygon driver query + DuckDB oracle.

Fixture: 25 deterministic concave star polygons (4-spike octagons) derived
from the `nation` table via exact closed forms (integer-mod centers, radii
in {0.25, 0.75, 1.25, 1.75} degrees — up to 4x4 half-degree cells each), and
a point set derived from `events` that is half clustered around the stars
(dense-cluster skew, the north rule's case) and half spread over the globe.
Every coordinate is an integer-mod-then-divide closed form, so the Spark
side and the DuckDB oracle compute bitwise-identical doubles, and the
PNPOLY crossing expression (operators/polygon.py) matches exactly.

The oracle is *independent*: it prunes candidates by the polygon bbox
(a range join) instead of mirroring the covering-cell equi-join, then
applies the same ray-crossing parity — so a covering-cell bug (a missed
cell, a wrong index) shows up as a value mismatch, not a shared blind spot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import polygon as poly_op

# concave 4-spike star: unit offsets scaled by r; every value is an exact
# binary fraction so cx + dx*r is bit-identical across Spark/DuckDB/Python
STAR_OFFSETS = [
    (1.0, 0.0),
    (0.25, 0.25),
    (0.0, 1.0),
    (-0.25, 0.25),
    (-1.0, 0.0),
    (-0.25, -0.25),
    (0.0, -1.0),
    (0.25, -0.25),
]

PIP_LEVEL = 1  # half-degree cells


def derive_polygons(nation: DataFrame) -> DataFrame:
    """(poly_id, ring) star polygons — MUST mirror the SQL in oracle_sql()."""
    nk = F.col("n_nationkey").cast("long")
    cx = ((F.lit(-170) + (nk * 29) % 340).cast("double") + F.lit(0.5)).alias("cx")
    cy = ((F.lit(-55) + (nk * 37) % 110).cast("double") + F.lit(0.25)).alias("cy")
    r = (F.lit(0.25) + (nk % 4).cast("double") * F.lit(0.5)).alias("r")
    base = nation.select(nk.alias("poly_id"), cx, cy, r)
    ring = F.array(
        *[
            F.struct(
                (F.col("cx") + F.lit(dx) * F.col("r")).alias("x"),
                (F.col("cy") + F.lit(dy) * F.col("r")).alias("y"),
            )
            for dx, dy in STAR_OFFSETS
        ]
    )
    return base.select("poly_id", ring.alias("ring"))


def derive_pip_points(events: DataFrame) -> DataFrame:
    """(event_id, px, py) — half clustered at the star of event_id%25
    (within +-2 deg of its center), half spread globally. Mirrors _SQL_PTS."""
    e = F.col("event_id")
    u = F.col("user_id")
    nk = e % 25
    cxe = (F.lit(-170) + (nk * 29) % 340).cast("double") + F.lit(0.5)
    cye = (F.lit(-55) + (nk * 37) % 110).cast("double") + F.lit(0.25)
    px = F.when(
        e % 2 == 0,
        (cxe - F.lit(2.0)) + ((e * 7 + u) % 4000).cast("double") / F.lit(1000.0),
    ).otherwise(
        F.lit(-178.0) + ((e * 17 + u) % 356000).cast("double") / F.lit(1000.0)
    )
    py = F.when(
        e % 2 == 0,
        (cye - F.lit(2.0)) + ((e * 11 + u * 3) % 4000).cast("double") / F.lit(1000.0),
    ).otherwise(
        F.lit(-58.0) + ((e * 13 + u) % 116000).cast("double") / F.lit(1000.0)
    )
    return events.select("event_id", px.alias("px"), py.alias("py"))


def q_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cell-pruned PNPOLY join, broadcast strategy + fold exact test —
    map-only over the points scan (the J1 shape, applied to vector geometry)."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    return poly_op.point_in_polygon_join(
        derive_pip_points(events),
        derive_polygons(nation),
        level=PIP_LEVEL,
        strategy="broadcast",
        exact="fold",
    )


_SQL_POLYS = """
polys AS (
  SELECT CAST(n_nationkey AS BIGINT) AS poly_id,
         CAST(-170 + (CAST(n_nationkey AS BIGINT) * 29) % 340 AS DOUBLE) + 0.5 AS cx,
         CAST(-55 + (CAST(n_nationkey AS BIGINT) * 37) % 110 AS DOUBLE) + 0.25 AS cy,
         0.25 + CAST(CAST(n_nationkey AS BIGINT) % 4 AS DOUBLE) * 0.5 AS r
  FROM nation
)
"""

_SQL_PTS = """
pts AS (
  SELECT event_id,
    CASE WHEN event_id % 2 = 0
         THEN (CAST(-170 + ((event_id % 25) * 29) % 340 AS DOUBLE) + 0.5 - 2.0)
              + CAST((event_id * 7 + user_id) % 4000 AS DOUBLE) / 1000.0
         ELSE -178.0 + CAST((event_id * 17 + user_id) % 356000 AS DOUBLE) / 1000.0
    END AS px,
    CASE WHEN event_id % 2 = 0
         THEN (CAST(-55 + ((event_id % 25) * 37) % 110 AS DOUBLE) + 0.25 - 2.0)
              + CAST((event_id * 11 + user_id * 3) % 4000 AS DOUBLE) / 1000.0
         ELSE -58.0 + CAST((event_id * 13 + user_id) % 116000 AS DOUBLE) / 1000.0
    END AS py
  FROM events
)
"""


def _edges_values_sql() -> str:
    """VALUES rows (dx1, dy1, dx2, dy2) for the closed star ring, generated
    from STAR_OFFSETS — the single source of truth for both sides."""
    rows = []
    n = len(STAR_OFFSETS)
    for i in range(n):
        dx1, dy1 = STAR_OFFSETS[i]
        dx2, dy2 = STAR_OFFSETS[(i + 1) % n]
        rows.append(f"({dx1!r}, {dy1!r}, {dx2!r}, {dy2!r})")
    return ",\n          ".join(rows)


def _pip_oracle_sql() -> str:
    return f"""
WITH {_SQL_POLYS.strip()},
{_SQL_PTS.strip()},
edges AS (
  SELECT poly_id, cx, cy, r,
         cx + o.dx1 * r AS x1, cy + o.dy1 * r AS y1,
         cx + o.dx2 * r AS x2, cy + o.dy2 * r AS y2
  FROM polys
  CROSS JOIN (VALUES {_edges_values_sql()}) AS o(dx1, dy1, dx2, dy2)
),
cand AS (
  SELECT p.event_id, p.px, p.py, e.poly_id, e.x1, e.y1, e.x2, e.y2
  FROM pts p JOIN edges e
    ON p.px >= e.cx - e.r AND p.px <= e.cx + e.r
   AND p.py >= e.cy - e.r AND p.py <= e.cy + e.r
),
hits AS (
  SELECT event_id, px, py, poly_id,
         SUM(CASE WHEN (y1 > py) <> (y2 > py)
                  THEN CASE WHEN px < (x2 - x1) * (py - y1) / (y2 - y1) + x1
                            THEN 1 ELSE 0 END
                  ELSE 0 END) AS crossings
  FROM cand
  GROUP BY event_id, px, py, poly_id
)
SELECT event_id, px, py, poly_id FROM hits WHERE crossings % 2 = 1
"""


def queries():
    return {"point_in_polygon": q_point_in_polygon}


def oracle_sql():
    return {"point_in_polygon": _pip_oracle_sql()}
