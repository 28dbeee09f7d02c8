"""Small geo operators completing the SURVEY.md §2 inventory: the continent
router (S5), the HTG_PRELOAD bounds grammar (P4), and the broadcast top-k
nearest-points join (J11)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# priority-ordered bbox rules (htg/src/download.rs:553-581); inclusive bounds
_CONTINENT_RULES = [
    ("North_America", 15.0, 60.0, -170.0, -50.0),
    ("South_America", -60.0, 15.0, -90.0, -30.0),
    ("Australia", -50.0, -10.0, 110.0, 180.0),
    ("Africa", -35.0, 35.0, -20.0, 55.0),
    ("Eurasia", 0.0, 60.0, -15.0, 180.0),
]


def coords_to_continent(lat: float, lon: float):
    """Pure-Python mirror (download.rs:553-581). None for oceans/Antarctica."""
    for name, lat0, lat1, lon0, lon1 in _CONTINENT_RULES:
        if lat0 <= lat <= lat1 and lon0 <= lon <= lon1:
            return name
    return None


def continent_col(lat: Column, lon: Column) -> Column:
    """Column expression with the same priority-ordered CASE chain."""
    expr = F.lit(None).cast("string")
    for name, lat0, lat1, lon0, lon1 in reversed(_CONTINENT_RULES):
        expr = F.when(lat.between(lat0, lat1) & lon.between(lon0, lon1), name).otherwise(expr)
    return expr


def knn_points_join(
    pts: DataFrame,
    pois: Sequence[tuple[int, float, float]],
    k: int = 3,
    id_col: str = "image_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Top-k nearest-neighbor join of every point against a small reference
    point set (POIs) — the 2-D spatial analog of the embedding ANN top-k,
    generalizing the engine's nearest-TILE-center kNN fallback
    (engine.py:154-189, service parity htg/src/service.rs nearest-tile) to
    an arbitrary point table and k > 1.

    Scale shape (the broadcast side of the trade): the POI set rides into
    the plan as an inline array literal, so the whole query is ONE
    zero-shuffle codegen projection over the points scan — per point, an
    array of (d2, poi_id) structs, array_sort (lexicographic: distance
    first, poi_id tie-break), slice k, posexplode. 10^12 points stream
    through map-only; nothing is collected or shuffled. For POI sets too
    large to inline (>~10^3), the scale path is the covering-cell
    equi-join family (operators/polygon.py) — bucket POIs by cell, join
    candidates by neighboring cells, and fall back to ring expansion —
    exactly the IVF trade in 2-D.

    Distances are squared planar degrees computed in a FIXED op order
    ((lat-plat)*(lat-plat) + (lon-plon)*(lon-plon)) so every engine agrees
    bit-for-bit; sorting on (d2, poi_id) makes ranks total and
    reproducible even when two POIs tie exactly (perpendicular-bisector
    points).

    Output: (id, lat, lon, rank 1..k, poi_id, d2).
    """
    lat, lon = F.col(lat_col), F.col(lon_col)
    arr = F.array(
        *[
            F.struct(
                (
                    (lat - F.lit(plat)) * (lat - F.lit(plat))
                    + (lon - F.lit(plon)) * (lon - F.lit(plon))
                ).alias("d2"),
                F.lit(int(pid)).cast("int").alias("poi_id"),
            )
            for pid, plat, plon in pois
        ]
    )
    exploded = pts.select(
        id_col,
        lat_col,
        lon_col,
        F.posexplode(F.slice(F.array_sort(arr), 1, k)).alias("pos", "nn"),
    )
    return exploded.select(
        id_col,
        lat_col,
        lon_col,
        (F.col("pos") + 1).cast("int").alias("rank"),
        F.col("nn.poi_id").alias("poi_id"),
        F.col("nn.d2").alias("d2"),
    )


def radius_neighbors(
    pts: DataFrame,
    scale: int = 2048,
    id_col: str = "event_id",
    x_col: str = "lon",
    y_col: str = "lat",
) -> DataFrame:
    """Grid-bucketed radius self-join: for every point, the count of other
    points within planar distance r = 1/scale degrees, plus the squared
    distance to the closest one — the neighborhood-density primitive under
    DBSCAN, spatial dedup, and POI-clustering jobs (the 2-D analog of the
    embedding near-dup candidate join, operators/ann.py).

    Scale shape: bucket every point into a grid of cell size exactly r
    (gx = floor(x*scale)); the PROBE side explodes to its 3x3 neighboring
    cells (9x fan-out of four narrow columns — no payload), the BUILD side
    keeps its home cell, and one equi-join on (jx, jy) yields every
    candidate pair exactly once per direction. The exact d2 <= r2 filter
    runs inside the join stage, and only surviving (id) hits reach the
    single count/min aggregation — so this is ONE shuffle of narrow
    columns at any corpus size, never an all-pairs product. Dense-cluster
    skew (many points in one cell) is the AQE skew-join case; for extreme
    hotspots the salting pattern from engine.elevation_join applies
    unchanged. `scale` MUST be a power of two so x*scale and r*r are exact
    IEEE doubles — both engines and the SQL oracle agree bit-for-bit.

    Output: (id, n_neighbors, min_d2 — NULL when no neighbor in range).
    """
    if scale & (scale - 1) != 0:
        raise ValueError(f"scale must be a power of two, got {scale}")
    r = 1.0 / scale
    x, y = F.col(x_col), F.col(y_col)
    # base feeds THREE plan branches (probe, build, the zero-count left
    # join); Spark has no cross-branch subtree reuse, so materialize it
    # lazily once instead of re-running the upstream plan per branch
    base = pts.select(
        id_col,
        x_col,
        y_col,
        F.floor(x * F.lit(float(scale))).cast("long").alias("gx"),
        F.floor(y * F.lit(float(scale))).cast("long").alias("gy"),
    ).localCheckpoint(eager=False)
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    probe = base.select(
        id_col, x_col, y_col, "gx", "gy", F.explode(offsets).alias("o")
    ).select(
        id_col,
        x_col,
        y_col,
        (F.col("gx") + F.col("o.dx")).alias("jx"),
        (F.col("gy") + F.col("o.dy")).alias("jy"),
    )
    build = base.select(
        F.col(id_col).alias("_bid"),
        F.col(x_col).alias("_bx"),
        F.col(y_col).alias("_by"),
        F.col("gx").alias("jx"),
        F.col("gy").alias("jy"),
    )
    dx = F.col(x_col) - F.col("_bx")
    dy = F.col(y_col) - F.col("_by")
    hits = (
        probe.join(build, on=["jx", "jy"])
        .where((F.col(id_col) != F.col("_bid")) & (dx * dx + dy * dy <= F.lit(r * r)))
        .select(id_col, (dx * dx + dy * dy).alias("d2"))
        .groupBy(id_col)
        .agg(F.count("*").alias("n_neighbors"), F.min("d2").alias("min_d2"))
    )
    return (
        base.select(id_col)
        .join(hits, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce(F.col("n_neighbors"), F.lit(0)).cast("long").alias("n_neighbors"),
            F.col("min_d2"),
        )
    )


def parse_preload_bounds(value: str):
    """HTG_PRELOAD grammar (htg-service/src/main.rs:165-204):
    'true'/'all'/'1' -> None (all tiles); ';'-separated
    'min_lat,min_lon,max_lat,max_lon' quadruples -> list of boxes;
    unparseable -> None (fall back to all, with the reference's semantics)."""
    trimmed = value.strip()
    if trimmed.lower() in ("true", "all", "1"):
        return None
    boxes = []
    for part in trimmed.split(";"):
        nums = []
        for s in part.split(","):
            try:
                nums.append(float(s.strip()))
            except ValueError:
                pass
        if len(nums) == 4:
            boxes.append((nums[0], nums[1], nums[2], nums[3]))
    return boxes or None
