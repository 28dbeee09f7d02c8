"""Point-in-polygon join — the north rule's "point-in-polygon tile-boundary
tests", generalized to arbitrary simple polygons (reference scope: the tile
extent test in htg/src/service.rs:102-110 is the axis-aligned special case;
this operator covers the general vector-geometry case a raster<->vector
engine needs at scale).

Design (100-TB shape):
- Candidate generation is a *cell equi-join*: every polygon is exploded to
  the grid cells covering its bbox at a chosen subdivision level (the same
  closed-form degree/2^level scheme as `cells.cell_id_at_level`); every
  point computes its single cell. No cross join, no range join — the plan
  is a hash join on a long key, broadcastable when the polygon set is small
  and shuffle-partitioned by cell when it is not (dense clusters distribute
  because the cell, not the polygon, is the key).
- The exact test is the standard PNPOLY ray-crossing parity (W. Randolph
  Franklin's construction: edge straddles the horizontal ray AND the
  intersection lies right of the point), evaluated entirely JVM-side:
  * ``exact='fold'``   — one `F.aggregate` over the per-polygon edges array:
    zero extra shuffle (map-only after the candidate join), at the cost of
    CodegenFallback interpretation of the single lambda.
  * ``exact='explode'`` — posexplode edges + whole-stage-codegen filter +
    groupBy(point, poly) count parity: one extra shuffle, full codegen.
  Both produce identical results (tests assert set equality); the fold form
  is the default because candidate fan-out is small after cell pruning.
- Boundary semantics are PNPOLY's: strict inequalities, vertices on the ray
  handled by the `>` / `<=` asymmetry. Points exactly on an edge get a
  deterministic (side-dependent) answer. All float math is plain IEEE
  double in a fixed op order, so Spark, DuckDB and NumPy agree bitwise.

Limitations (documented, not silent): polygons must be simple rings that do
NOT cross the antimeridian or poles (the reference's SRTM tiling has the
same constraint, filename.rs:146-148); holes can be expressed as a second
ring with reversed orientation unioned into the same edges array (parity
test composes), but the fixture queries use single rings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "geojson_point_in_polygon",
    "point_cell",
    "point_in_polygon_join",
    "polygon_cells",
    "refined_cell_flag",
    "rings_from_geojson",
    "with_edges",
]


def _gy(lat: Column, k: int) -> Column:
    """Global row index at level: (floor(lat)+90)*k + floor(frac(lat)*k).

    Monotone in lat (floor and frac*k are each monotone within a degree and
    across degree boundaries), so a bbox corner range covers every interior
    point's index. Identical expression on the point and polygon sides —
    the join key can never disagree with itself.
    """
    return (F.floor(lat).cast("long") + 90) * k + F.floor(
        (lat - F.floor(lat)) * F.lit(float(k))
    ).cast("long")


def _gx(lon: Column, k: int) -> Column:
    return (F.floor(lon).cast("long") + 180) * k + F.floor(
        (lon - F.floor(lon)) * F.lit(float(k))
    ).cast("long")


def _cell(gy: Column, gx: Column, k: int) -> Column:
    # 361*k multiplier: lon=180.0 exactly yields gx == 360*k, which would
    # alias the next row's gx=0 under a 360*k multiplier
    return gy * F.lit(361 * k) + gx


def point_cell(x: Column, y: Column, level: int) -> Column:
    """The single covering cell of a point (x=lon-like, y=lat-like)."""
    k = 1 << level
    return _cell(_gy(y, k), _gx(x, k), k)


def with_edges(polygons: DataFrame, ring_col: str = "ring") -> DataFrame:
    """Precompute per-polygon `edges` (closed ring: v[i] -> v[i+1], wrap) and
    the bbox. Runs once per polygon row; the HOFs here are off the hot path.
    """
    ring = F.col(ring_col)
    n = F.size(ring)
    i_to_edge = lambda i: F.struct(  # noqa: E731
        F.element_at(ring, i)["x"].alias("x1"),
        F.element_at(ring, i)["y"].alias("y1"),
        F.element_at(ring, F.when(i == n, F.lit(1)).otherwise(i + 1))["x"].alias("x2"),
        F.element_at(ring, F.when(i == n, F.lit(1)).otherwise(i + 1))["y"].alias("y2"),
    )
    return polygons.withColumns(
        {
            "edges": F.transform(F.sequence(F.lit(1), n), i_to_edge),
            "min_x": F.array_min(F.transform(ring, lambda p: p["x"])),
            "max_x": F.array_max(F.transform(ring, lambda p: p["x"])),
            "min_y": F.array_min(F.transform(ring, lambda p: p["y"])),
            "max_y": F.array_max(F.transform(ring, lambda p: p["y"])),
        }
    )


def polygon_cells(polygons_with_bbox: DataFrame, level: int) -> DataFrame:
    """Explode each polygon to the cells covering its bbox at `level`.

    Cell count per polygon is O((span*2^level + 2)^2) — pick the level so
    typical polygons cover tens of cells (level 1 half-degree cells for
    degree-scale polygons). The enumeration is closed-form (sequence over
    the corner indices), so it plans as a codegen explode, not a UDF.
    """
    k = 1 << level
    gy_lo, gy_hi = _gy(F.col("min_y"), k), _gy(F.col("max_y"), k)
    gx_lo, gx_hi = _gx(F.col("min_x"), k), _gx(F.col("max_x"), k)
    cells2d = F.flatten(
        F.transform(
            F.sequence(gy_lo, gy_hi),
            lambda gy: F.transform(F.sequence(gx_lo, gx_hi), lambda gx: _cell(gy, gx, k)),
        )
    )
    return polygons_with_bbox.withColumn("pip_cell", F.explode(cells2d))


def rings_from_geojson(features: DataFrame, id_col: str = "feature_id") -> DataFrame:
    """(id_col, ring_id, ring) rows from GeoJSON Polygon / MultiPolygon
    features (`geometry_json` column, the geojson_pipeline schema;
    geojson.rs:108-125 ring layout). One row per ring — outer rings AND
    holes alike; containment with holes is ring-count parity (even-odd
    rule), composed by `geojson_point_in_polygon`. Closing positions
    (first == last, the GeoJSON convention) are stripped: `with_edges`
    closes rings itself. GeometryCollection recurses (nested collections
    included, geojson.rs:120-125); other geometry types yield no rows —
    points and lines have zero area, so nothing is ever contained in them.

    Python-side JSON parse via mapInPandas — the polygon side is the small
    dimension (thousands of features, not the 10^12-point side), so this is
    off the hot path by construction."""
    import json
    from collections.abc import Iterator

    import pandas as pd

    out_schema = (
        f"{id_col} long, ring_id int, ring array<struct<x: double, y: double>>"
    )

    def polys_of(geom):
        t = geom.get("type")
        if t == "Polygon":
            yield geom["coordinates"]
        elif t == "MultiPolygon":
            yield from geom["coordinates"]
        elif t == "GeometryCollection":
            for g in geom.get("geometries", []):
                yield from polys_of(g)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fid, gj in zip(pdf[id_col], pdf["geometry_json"]):
                rid = 0
                for poly in polys_of(json.loads(gj)):
                    for ring in poly:
                        if len(ring) > 1 and ring[0] == ring[-1]:
                            ring = ring[:-1]
                        rows.append(
                            (
                                fid,
                                rid,
                                [{"x": float(p[0]), "y": float(p[1])} for p in ring],
                            )
                        )
                        rid += 1
            yield pd.DataFrame(rows, columns=[id_col, "ring_id", "ring"])

    return features.select(id_col, "geometry_json").mapInPandas(gen, out_schema)


def geojson_point_in_polygon(
    points: DataFrame,
    features: DataFrame,
    *,
    x_col: str = "px",
    y_col: str = "py",
    id_col: str = "feature_id",
    level: int = 1,
    strategy: str = "broadcast",
    exact: str = "fold",
) -> DataFrame:
    """Points contained in GeoJSON (Multi)Polygon features, even-odd rule:
    a point is inside iff it lies in an ODD number of the feature's rings
    (outer minus holes; disjoint MultiPolygon parts union). Plan shape: the
    per-ring PIP join (map-only on the broadcast path) + one narrow
    groupBy(point, feature) parity count."""
    rings = rings_from_geojson(features, id_col=id_col)
    per_ring = point_in_polygon_join(
        points,
        rings.select(F.concat_ws("#", id_col, "ring_id").alias("_ring_key"), "ring"),
        x_col=x_col,
        y_col=y_col,
        poly_id="_ring_key",
        level=level,
        strategy=strategy,
        exact=exact,
    )
    fid = F.split(F.col("_ring_key"), "#")[0].cast("long").alias(id_col)
    return (
        per_ring.select(*points.columns, fid)
        .groupBy(*points.columns, id_col)
        .agg(F.count(F.lit(1)).alias("_rings_hit"))
        .where(F.col("_rings_hit") % 2 == 1)
        .select(*points.columns, id_col)
    )


def refined_cell_flag(edges: Column, cell: Column, level: int) -> Column:
    """True when the covering cell `cell` can intersect the polygon — the
    exact-geometry covering refinement. A bbox covering of a concave polygon
    (a star, a coastline) is mostly empty corners; every retained cell is a
    candidate row the big point side must pay a full PNPOLY fold for, so at
    10^12-point scale dropping non-intersecting cells cuts the dominant cost
    directly. The test is conservative-safe, never dropping a cell that
    intersects the polygon:

    - keep if ANY edge's bbox overlaps the (closed) cell rect — if the
      polygon boundary passes through the cell, the crossing edge's bbox
      must overlap it;
    - else keep if the cell's lower-left corner is inside the polygon
      (crossing parity) — boundary-disjoint cells are entirely inside or
      entirely outside, and the corner belongs to the cell.

    One `F.aggregate` fold computes both (crossings + any-overlap) in a
    single pass over the edges; the cell-rect coordinates ride in the
    accumulator seed (the captured-outer-attribute pitfall, see the fold in
    `point_in_polygon_join`). Runs on the polygon-cells side only — the
    small dimension — so the HOF interpretation cost is off the hot path."""
    k = 1 << level
    kk = F.lit(361 * k)
    gy = F.floor(cell / kk).cast("long")
    gx = cell - gy * kk
    # gx/k and gy/k are exact (k a power of two, magnitudes << 2^53)
    x0 = gx.cast("double") / F.lit(float(k)) - F.lit(180.0)
    y0 = gy.cast("double") / F.lit(float(k)) - F.lit(90.0)
    s = F.lit(1.0 / k)

    def step(acc: Column, e: Column) -> Column:
        ex_min, ex_max = F.least(e["x1"], e["x2"]), F.greatest(e["x1"], e["x2"])
        ey_min, ey_max = F.least(e["y1"], e["y2"]), F.greatest(e["y1"], e["y2"])
        ov = (
            (ex_min <= acc["qx"] + acc["s"])
            & (ex_max >= acc["qx"])
            & (ey_min <= acc["qy"] + acc["s"])
            & (ey_max >= acc["qy"])
        ).cast("int")
        return F.struct(
            (acc["n"] + _crossing_flag(e, acc["qx"], acc["qy"])).alias("n"),
            F.greatest(acc["ov"], ov).alias("ov"),
            acc["qx"].alias("qx"),
            acc["qy"].alias("qy"),
            acc["s"].alias("s"),
        )

    return F.aggregate(
        edges,
        F.struct(
            F.lit(0).alias("n"),
            F.lit(0).alias("ov"),
            x0.alias("qx"),
            y0.alias("qy"),
            s.alias("s"),
        ),
        step,
        lambda acc: (acc["ov"] == 1) | (acc["n"] % 2 == 1),
    )


def _crossing_flag(e: Column, px: Column, py: Column) -> Column:
    """1 when edge e crosses the rightward horizontal ray from (px, py).

    Nested-when (not `&`) so the division is only *evaluated* when the edge
    straddles the ray — straddling implies y1 != y2, so the divide can never
    see a zero under ANSI mode, by construction rather than by IEEE luck.
    The intersect expression's op order (x2-x1)*(py-y1)/(y2-y1)+x1 is the
    bit-parity contract shared with the SQL oracle.
    """
    straddle = (e["y1"] > py) != (e["y2"] > py)
    x_int = (e["x2"] - e["x1"]) * (py - e["y1"]) / (e["y2"] - e["y1"]) + e["x1"]
    return F.when(
        straddle, F.when(px < x_int, F.lit(1)).otherwise(F.lit(0))
    ).otherwise(F.lit(0))


def point_in_polygon_join(
    points: DataFrame,
    polygons: DataFrame,
    *,
    x_col: str = "px",
    y_col: str = "py",
    poly_id: str = "poly_id",
    ring_col: str = "ring",
    level: int = 1,
    strategy: str = "broadcast",
    exact: str = "fold",
    refine: bool = True,
    spread: bool = True,
) -> DataFrame:
    """Inner-join points to the polygons containing them.

    points:   any columns + (x_col, y_col) doubles.
    polygons: (poly_id, ring_col: array<struct<x double, y double>>), simple
              rings, not antimeridian-crossing.
    strategy: 'broadcast' — polygon cells (with edges inlined) broadcast;
              the whole operator is map-only over the points scan (the same
              shape as the engine's J1 broadcast tile join). 'shuffle' —
              thin (cell, poly_id) candidate join shuffled by cell, edges
              re-joined by poly_id afterwards; for polygon sets too large
              to broadcast.
    exact:    'fold' (aggregate HOF, no extra shuffle) or 'explode'
              (codegen filter + count-parity groupBy, one extra shuffle).
    refine:   drop covering cells that provably cannot intersect the polygon
              (`refined_cell_flag`) — result-identical, fewer candidate
              pairs (and a smaller broadcast) for concave polygons.
    Returns points columns + poly_id for each containing polygon.
    """
    if exact not in ("fold", "explode"):
        raise ValueError(f"exact must be 'fold' or 'explode', got {exact!r}")
    if strategy not in ("broadcast", "shuffle"):
        raise ValueError(f"strategy must be 'broadcast' or 'shuffle', got {strategy!r}")

    from ..partitioning import spread_scan

    px, py = F.col(x_col), F.col(y_col)
    out_cols = [*points.columns, poly_id]
    pe = with_edges(polygons, ring_col)
    # spread_scan: the interpreted PNPOLY fold over candidate edges is the
    # dominant cost and runs in the points scan's partitioning (polygons
    # broadcast) — a single-row-group scan would pin it to one core.
    # Callers whose points frame already crossed a shuffle (e.g. the
    # geofence timeline, post-window) pass spread=False: the probe itself
    # would re-execute the upstream stages under AQE, and post-shuffle
    # partitioning is already at parallelism.
    pts = spread_scan(points) if spread else points
    pts = pts.withColumn("pip_cell", point_cell(px, py, level))

    cells = polygon_cells(pe, level)
    if refine:
        cells = cells.where(
            refined_cell_flag(F.col("edges"), F.col("pip_cell"), level)
        )
    if strategy == "broadcast":
        cand = pts.join(
            F.broadcast(cells.select(poly_id, "pip_cell", "edges")), "pip_cell"
        )
    else:
        cand = pts.join(cells.select(poly_id, "pip_cell"), "pip_cell").join(
            pe.select(poly_id, "edges"), poly_id
        )

    if exact == "fold":
        # the point coordinates ride inside the fold ACCUMULATOR, not as
        # outer references in the lambda body: a lambda's captured outer
        # attributes are invisible to HigherOrderFunction.references, so
        # Catalyst's column pruning pushes the expression to the polygon
        # side of the join and binding fails at runtime with
        # INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND (Spark 4.1). Seed expressions
        # are ordinary expressions with correctly-tracked references.
        crossings = F.aggregate(
            F.col("edges"),
            F.struct(F.lit(0).alias("n"), px.alias("qx"), py.alias("qy")),
            lambda acc, e: F.struct(
                (acc["n"] + _crossing_flag(e, acc["qx"], acc["qy"])).alias("n"),
                acc["qx"].alias("qx"),
                acc["qy"].alias("qy"),
            ),
            lambda acc: acc["n"],
        )
        return (
            cand.withColumn("_crossings", crossings)
            .where(F.col("_crossings") % 2 == 1)
            .select(*out_cols)
        )

    # explode form: count crossing edges per candidate pair, keep odd parity.
    # Pairs whose every edge misses the ray produce zero rows — outside.
    key_cols = [c for c in points.columns] + [poly_id]
    e = F.explode(F.col("edges")).alias("e")
    return (
        cand.select(*key_cols, e)
        .where(_crossing_flag(F.col("e"), px, py) == 1)
        .groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("_crossings"))
        .where(F.col("_crossings") % 2 == 1)
        .select(*out_cols)
    )


def polygon_metrics(polygons: DataFrame, ring_col: str = "ring") -> DataFrame:
    """Shoelace area, centroid, and perimeter per polygon — the vector-
    geometry measures every GIS ships — as ONE JVM ``F.aggregate`` fold
    over the closed edge ring: zero Python workers, zero shuffles,
    map-only whatever the polygon count.

    Bit-parity float order (shared verbatim with the SQL oracle; DuckDB
    ``list_reduce`` folds left-to-right seeded with the first element,
    which equals this fold's 0.0 seed since 0.0 + x == x):

        cross_i = (x1*y2) - (x2*y1)
        area2   = sum cross_i            (signed; > 0 for CCW rings)
        sx_i    = (x1 + x2) * cross_i    ; sy_i = (y1 + y2) * cross_i
        len_i   = sqrt((x2-x1)*(x2-x1) + (y2-y1)*(y2-y1))
        area    = abs(area2) / 2.0
        cx      = sx / (area2 * 3.0)     ; cy = sy / (area2 * 3.0)

    All four folds ride one accumulator struct, so the ring is traversed
    once. cx/cy are NULL for degenerate (zero-area) rings rather than an
    IEEE infinity."""
    p = with_edges(polygons, ring_col)

    def step(acc: Column, e: Column) -> Column:
        cross = (e["x1"] * e["y2"]) - (e["x2"] * e["y1"])
        dx = e["x2"] - e["x1"]
        dy = e["y2"] - e["y1"]
        return F.struct(
            (acc["a2"] + cross).alias("a2"),
            (acc["sx"] + (e["x1"] + e["x2"]) * cross).alias("sx"),
            (acc["sy"] + (e["y1"] + e["y2"]) * cross).alias("sy"),
            (acc["pl"] + F.sqrt(dx * dx + dy * dy)).alias("pl"),
        )

    zero = F.lit(0.0)
    acc = F.aggregate(
        F.col("edges"),
        F.struct(
            zero.alias("a2"), zero.alias("sx"), zero.alias("sy"), zero.alias("pl")
        ),
        step,
    )
    a2 = acc["a2"]
    return p.select(
        F.col("poly_id"),
        F.size(F.col(ring_col)).alias("n_vertices"),
        a2.alias("area2"),
        (F.abs(a2) / F.lit(2.0)).alias("area"),
        F.when(a2 != 0.0, acc["sx"] / (a2 * F.lit(3.0))).alias("cx"),
        F.when(a2 != 0.0, acc["sy"] / (a2 * F.lit(3.0))).alias("cy"),
        acc["pl"].alias("perimeter"),
    )


def geofence_dwell(
    pings: DataFrame,
    polygons: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    x_col: str = "px",
    y_col: str = "py",
    poly_id: str = "poly_id",
    ring_col: str = "ring",
    level: int = 1,
) -> DataFrame:
    """Geofence dwell analytics: per (user, polygon), how long the user's
    piecewise-constant position state sat inside the fence and how many
    distinct visits that was — the store-visit / zone-occupancy rollup
    run over every location stream at scale. Composes point_in_polygon_join
    (the map-only broadcast PNPOLY join) with the sessionization window
    machinery.

    Semantics: a ping's state holds until the NEXT ping (the standard
    last-observation-carried-forward model), so each inside-ping whose
    user has a later ping contributes (next_ts - ts) microseconds of
    dwell; the user's last ping contributes 0 (unknown horizon, counted
    in n_inside but not dwell). A visit (entry) starts at any inside-ping
    whose immediate predecessor on the user's FULL timeline was not
    inside the same fence. Overlapping fences accrue independently.
    Ordering ties break by event id — total and reproducible.

    Scale shape: window 1 (row_number + lead over the user key) is ONE
    hash Exchange; the PNPOLY join stays map-only broadcast; window 2 and
    the final rollup share ONE (user, poly) Exchange (grouping keys
    prefix the partition key). Exact integer-microsecond sums — no float
    time math, bit-reproducible at any partitioning.

    Output: (user_id, poly_id, n_inside, n_entries, dwell_us).
    """
    us = F.timestamp_diff(
        "MICROSECOND",
        F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
        F.col(ts_col).cast("timestamp_ntz"),
    )
    from pyspark.sql.window import Window

    staged = pings.select(user_col, id_col, x_col, y_col, us.alias("_us"))
    w = Window.partitionBy(user_col).orderBy(
        F.col("_us").asc(), F.col(id_col).asc()
    )
    timeline = staged.select(
        user_col,
        x_col,
        y_col,
        "_us",
        F.row_number().over(w).alias("_rn"),
        F.lead("_us").over(w).alias("_nus"),
    )
    inside = point_in_polygon_join(
        timeline,
        polygons,
        x_col=x_col,
        y_col=y_col,
        poly_id=poly_id,
        ring_col=ring_col,
        level=level,
        strategy="broadcast",
        exact="fold",
        spread=False,  # timeline already crossed the window's hash Exchange
    )
    w2 = Window.partitionBy(user_col, poly_id).orderBy(F.col("_rn").asc())
    prev_rn = F.lag("_rn").over(w2)
    flagged = inside.select(
        user_col,
        poly_id,
        "_us",
        "_nus",
        (prev_rn.isNull() | (prev_rn != F.col("_rn") - F.lit(1)))
        .cast("long")
        .alias("_entry"),
    )
    return flagged.groupBy(user_col, poly_id).agg(
        F.count(F.lit(1)).alias("n_inside"),
        F.sum("_entry").alias("n_entries"),
        F.sum(
            F.when(F.col("_nus").isNotNull(), F.col("_nus") - F.col("_us")).otherwise(
                F.lit(0).cast("long")
            )
        ).alias("dwell_us"),
    )
