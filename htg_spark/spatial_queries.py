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
from .operators import events as events_ops
from .operators import geo_misc
from .operators.events import (
    resample_tracks,
    simplify_trajectories,
    trajectory_segments,
)

GEOHASH_PRECISION = 6
RADIUS_SCALE = 2048  # r = 2^-11 deg — ~4.9 steps of the fixture's 1e-4 lattice
IDW_SCALE = 16  # r = 2^-4 deg — ~20 fixture samples per query disc at sf0.01
IDW_EPS = 2.0 ** -24
IDW_GRID_N = 32  # 32x32 query grid over the dense fixture cluster
TRAJ_CUT_D2 = 0.0625  # 2^-4 — quarter-degree segment cut
SMOOTH_LEVEL = 4
DBSCAN_SCALE = 8192  # eps = 2^-13 — 4-connects the 1e-4 fixture lattice
DBSCAN_MIN_PTS = 2  # core iff >= 2 in-range neighbors (excluding self)
MERCATOR_ZOOM = 12  # 4096x4096 slippy grid — ~0.088 deg/tile
MERCATOR_PARENT = 9  # rollup level: quadkey prefix length of the parent key
DENSITY_TILE_PX = 64  # density render: 64x64 gray8 pixels per zoom-12 tile
SNAP_SCALE = 256  # segment snapping radius r = 2^-8 deg (exact double)
SIMPLIFY_EPS2 = 0.0625  # Douglas-Peucker tolerance^2 = 2^-4 (exact double)
RESAMPLE_STEP_US = 3_600_000_000  # 1-hour grid (exact integer microseconds)
COLOC_WINDOW_US = 86_400_000_000  # 24-hour co-location window
COLOC_SCALE = 2048  # co-location radius r = 2^-11 deg (shared with radius_neighbors)
OD_GAP_MINUTES = 30  # od_flows trip break (shared with user_sessions)
OD_SCALE = 16  # od_flows cell grid: 1/16 deg (~7 km) — power of two (exact IEEE)
KIN_VMAX = 2.0 ** -12  # track_kinematics impossible-speed bar (~27 m/s), exact double
OD_TOP_K = 3  # od_top_destinations: destinations kept per origin cell


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


def q_mercator_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-mercator z/x/y tile rollup at zoom 12 plus the Bing quadkey and
    its level-9 parent prefix — the interoperable raster-serving grid the
    Terrain-RGB / pyramid products (L32) would be published on. Per-point
    tile assignment is a zero-shuffle projection (sin+ln+floor, then pure
    integer bit interleave for the quadkey); the rollup is ONE hash
    aggregation on the tile key. Quadkeys nest (parent = length-(z-1)
    prefix), which is what makes the string a multi-resolution partition /
    range-pruning key for a 100-TB tile store."""
    z = MERCATOR_ZOOM
    pts = derive_points(_events(spark, sf_dir))
    idx = pts.select(
        "event_id",
        cells.mercator_tile_x(F.col("lon"), z).alias("zx"),
        cells.mercator_tile_y(F.col("lat"), z).alias("zy"),
    )
    qk = idx.select(
        "event_id",
        "zx",
        "zy",
        cells.quadkey(F.col("zx"), F.col("zy"), z).alias("quadkey"),
    )
    return (
        qk.groupBy("zx", "zy", "quadkey")
        .agg(
            F.count(F.lit(1)).alias("n_pts"),
            F.min("event_id").alias("min_event"),
            F.max("event_id").alias("max_event"),
        )
        .withColumn("qk_parent", F.substring("quadkey", 1, MERCATOR_PARENT))
    )


def q_density_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector -> raster density-tile render (geo_misc.density_tiles) at
    zoom 12, 64px tiles: the oracle checks the exact integer render stats
    (n_pts / nonzero_px / max_count / sum_clipped); the payload bytes are
    pinned to the stats by test_density_tiles_payload."""
    pts = derive_points(_events(spark, sf_dir))
    return geo_misc.density_tiles(
        pts, zoom=MERCATOR_ZOOM, tile_px=DENSITY_TILE_PX
    ).select("zx", "zy", "n_pts", "nonzero_px", "max_count", "sum_clipped")


def q_radius_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = derive_points(_events(spark, sf_dir))
    return geo_misc.radius_neighbors(
        pts, scale=RADIUS_SCALE, id_col="event_id", x_col="lon", y_col="lat"
    )


def _snap_segments(spark: SparkSession) -> DataFrame:
    """64 deterministic road segments gridded over the dense fixture
    cluster — every coordinate an exact dyadic double (0.25 / 0.1875 /
    0.125 steps), mirrored literally by the oracle CTE."""
    i = F.col("id")
    return spark.range(64).select(
        i.alias("seg_id"),
        (F.lit(138.0) + (i % 8).cast("double") * F.lit(0.25)).alias("ax"),
        (F.lit(35.0) + F.expr("id div 8").cast("double") * F.lit(0.25)).alias("ay"),
        (F.lit(138.0) + (i % 8).cast("double") * F.lit(0.25) + F.lit(0.1875)).alias("bx"),
        (F.lit(35.0) + F.expr("id div 8").cast("double") * F.lit(0.25) + F.lit(0.125)).alias("by"),
    )


def q_segment_snap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-matching: snap every derived point to its nearest road segment
    within r = 2^-8 deg (geo_misc.snap_to_segments). The far clusters
    (lat 50/75) have no segments in range and exercise the NULL rows."""
    pts = derive_points(_events(spark, sf_dir))
    return geo_misc.snap_to_segments(
        pts, _snap_segments(spark), scale=SNAP_SCALE, id_col="event_id"
    )


def q_idw_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDW-interpolate the events' value field onto a 32x32 query grid over
    the dense fixture cluster (lat [35,37) x lon [138,140), step 1/16 —
    every coordinate an exact double: 35.0 + i*2^-4)."""
    n = IDW_GRID_N
    samples = derive_points(_events(spark, sf_dir), extra_cols=("value",))
    i = F.col("id")
    grid = spark.range(n * n).select(
        i.alias("query_id"),
        (F.lit(35.0) + F.floor(i / n).cast("double") * F.lit(0.0625)).alias("qlat"),
        (F.lit(138.0) + (i % n).cast("double") * F.lit(0.0625)).alias("qlon"),
    )
    return geo_misc.idw_interpolate(samples, grid, scale=IDW_SCALE, eps=IDW_EPS)


def q_trajectory_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = derive_points(_events(spark, sf_dir), extra_cols=("user_id", "ts"))
    return trajectory_segments(pts, cut_d2=TRAJ_CUT_D2)


def q_simplify_track(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Douglas-Peucker per-user track simplification at eps^2 = 2^-4
    (events.simplify_trajectories). The oracle replays the subdivision as
    a recursive interval CTE — pivots are exactly the interval endpoints
    the closure accumulates."""
    pts = derive_points(_events(spark, sf_dir), extra_cols=("user_id", "ts"))
    return simplify_trajectories(pts, epsilon2=SIMPLIFY_EPS2)



def q_resample_track(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-regular track resampling on a 1-hour grid anchored at each
    user's first ping (events.resample_tracks): linear interpolation
    between bracketing pings, one window pass + map-side sequence
    explode, one Exchange. ~10 grid samples per ping interval at the
    fixture cadence."""
    pts = derive_points(_events(spark, sf_dir), extra_cols=("user_id", "ts"))
    return resample_tracks(pts, step_us=RESAMPLE_STEP_US)



def q_convex_hull(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user convex hull of the ping cloud (geo_misc.convex_hulls):
    gift wrapping with a token-mirrored orientation test; the oracle
    replays the march as a recursive CTE whose step winner is the
    quantified NOT-EXISTS extreme point."""
    pts = derive_points(_events(spark, sf_dir), extra_cols=("user_id",))
    return geo_misc.convex_hulls(pts)



def q_colocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per unordered user pair: contact count, closest approach, first
    contact instant, at r = 2^-11 deg and a 24 h window
    (geo_misc.colocation_pairs). The oracle is an INDEPENDENT quadratic
    time-range self-join — no grid cells, so a covering bug mismatches
    instead of hiding."""
    pts = derive_points(_events(spark, sf_dir), extra_cols=("user_id", "ts"))
    return geo_misc.colocation_pairs(
        pts, scale=COLOC_SCALE, window_us=COLOC_WINDOW_US
    )


def q_od_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Origin-destination flow matrix: 30-minute-gap trips rolled up per
    directed (origin cell, destination cell) pair on the 1/16-degree grid
    (events.od_flows) — trip count, distinct travellers, exact total
    duration. The oracle token-mirrors the gap/running-sum/row_number
    windows and the floor cell math."""
    pts = derive_points(_events(spark, sf_dir), extra_cols=("user_id", "ts"))
    return events_ops.od_flows(pts, gap_minutes=OD_GAP_MINUTES, scale=OD_SCALE)


def q_track_kinematics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-ping speed / acceleration / impossible-speed flag under the
    (ts, id) total order (events.track_kinematics) — the GPS-noise
    filter. The oracle token-mirrors the lag windows and the
    sqrt-then-divide op order; duplicate-timestamp pings yield NULLs by
    contract (never engine-specific Inf/NaN bits)."""
    pts = derive_points(_events(spark, sf_dir), extra_cols=("user_id", "ts"))
    return events_ops.track_kinematics(pts, vmax=KIN_VMAX)


def q_od_top_destinations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 destination cells per origin cell over the OD flow matrix,
    ranked (n_trips DESC, d_gx, d_gy) — a deterministic total order
    because the destination cell is the rollup's own group key."""
    return events_ops.top_destinations(
        q_od_flows(spark, sf_dir), k=OD_TOP_K
    )


def q_trip_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-trip path length / net displacement / tortuosity over
    30-minute-gap trips (events.trip_shape). The path-length float sum
    folds jump distances in ascending VALUE order — the canonical-order
    pattern both engines replay bit-exactly (sort_array + F.aggregate ==
    list_sort + list_reduce)."""
    pts = derive_points(_events(spark, sf_dir), extra_cols=("user_id", "ts"))
    return events_ops.trip_shape(pts, gap_minutes=OD_GAP_MINUTES)


def q_cell_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = derive_points(_events(spark, sf_dir))
    return geo_misc.smooth_cell_counts(pts, level=SMOOTH_LEVEL)


def q_dbscan_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic grid-DBSCAN over the derived points (eps = 2^-13,
    min_pts = 2): ~14% core / 4% border / 82% noise on the fixture — the
    dense 1e-4-lattice micro-cluster fragments into small components
    (sub-percolation occupancy), exercising all three roles."""
    pts = derive_points(_events(spark, sf_dir))
    return geo_misc.dbscan_clusters(
        pts, scale=DBSCAN_SCALE, min_pts=DBSCAN_MIN_PTS, id_col="event_id"
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


def _mercator_oracle_sql(zoom: int = MERCATOR_ZOOM, parent: int = MERCATOR_PARENT) -> str:
    """Mirror generated from the SAME constants/loops as
    cells.mercator_tile_x/y and cells.quadkey — one projection, two
    rendering targets (the geohash-oracle pattern)."""
    x_sql, y_sql = cells.mercator_sql_idx(zoom)
    qk_sql = cells.quadkey_sql(zoom)
    return f"""
{_SQL_PTS.strip()},
idx AS (SELECT event_id, {x_sql} AS zx, {y_sql} AS zy FROM pts),
qk AS (SELECT event_id, zx, zy, {qk_sql} AS quadkey FROM idx)
SELECT zx, zy, quadkey, count(*) AS n_pts,
  min(event_id) AS min_event, max(event_id) AS max_event,
  substr(quadkey, 1, {parent}) AS qk_parent
FROM qk GROUP BY zx, zy, quadkey
"""


def _density_oracle_sql(
    zoom: int = MERCATOR_ZOOM, tile_px: int = DENSITY_TILE_PX
) -> str:
    """Mirror generated from the same cells.mercator_fractional /
    tile_pixel renderings the operator uses. DuckDB sums BIGINT into
    HUGEINT, hence the explicit casts back."""
    fx_sql, fy_sql = cells.mercator_fractional_sql(zoom)
    hi = (1 << zoom) - 1
    px_sql = cells.tile_pixel_sql("fx", "zx", tile_px)
    py_sql = cells.tile_pixel_sql("fy", "zy", tile_px)
    return f"""
{_SQL_PTS.strip()},
frac AS (SELECT event_id, {fx_sql} AS fx, {fy_sql} AS fy FROM pts),
tkeys AS (
  SELECT greatest(least(CAST(floor(fx) AS BIGINT), {hi}), 0) AS zx,
         greatest(least(CAST(floor(fy) AS BIGINT), {hi}), 0) AS zy,
         fx, fy
  FROM frac
),
pix AS (SELECT zx, zy, {px_sql} AS px, {py_sql} AS py FROM tkeys),
cnts AS (SELECT zx, zy, px, py, count(*) AS cnt FROM pix GROUP BY zx, zy, px, py)
SELECT zx, zy,
  CAST(sum(cnt) AS BIGINT) AS n_pts,
  count(*) AS nonzero_px,
  CAST(max(cnt) AS BIGINT) AS max_count,
  CAST(sum(least(cnt, 255)) AS BIGINT) AS sum_clipped
FROM cnts GROUP BY zx, zy
"""


def _segment_snap_oracle_sql(scale: int = SNAP_SCALE) -> str:
    """INDEPENDENT quadratic oracle (points x segments, no grid cells) —
    a covering-cell bug in snap_to_segments mismatches instead of hiding.
    The distance math mirrors the operator's op order token-for-token."""
    r2 = (1.0 / scale) * (1.0 / scale)
    return f"""
{_SQL_PTS.strip()},
segs AS (
  SELECT id AS seg_id,
    138.0 + CAST(id % 8 AS DOUBLE) * 0.25 AS ax,
    35.0 + CAST(id // 8 AS DOUBLE) * 0.25 AS ay,
    138.0 + CAST(id % 8 AS DOUBLE) * 0.25 + 0.1875 AS bx,
    35.0 + CAST(id // 8 AS DOUBLE) * 0.25 + 0.125 AS by
  FROM (SELECT unnest(generate_series(0, 63)) AS id)
),
cand AS (
  SELECT p.event_id, s.seg_id,
    CASE WHEN (s.bx - s.ax) * (s.bx - s.ax) + (s.by - s.ay) * (s.by - s.ay) > 0.0
      THEN greatest(least(
        ((p.lon - s.ax) * (s.bx - s.ax) + (p.lat - s.ay) * (s.by - s.ay))
          / ((s.bx - s.ax) * (s.bx - s.ax) + (s.by - s.ay) * (s.by - s.ay)),
        1.0), 0.0)
      ELSE 0.0 END AS t,
    p.lon AS px, p.lat AS py, s.ax, s.ay, s.bx, s.by
  FROM pts p, segs s
),
d AS (
  SELECT event_id, seg_id, t,
    (px - (ax + t * (bx - ax))) * (px - (ax + t * (bx - ax)))
    + (py - (ay + t * (by - ay))) * (py - (ay + t * (by - ay))) AS d2
  FROM cand
),
q AS (
  SELECT event_id, seg_id, t, d2,
    row_number() OVER (PARTITION BY event_id ORDER BY d2, seg_id) AS rn
  FROM d WHERE d2 <= {r2!r}
)
SELECT p.event_id, q.seg_id, q.d2 AS snap_d2, q.t AS snap_t
FROM pts p LEFT JOIN q ON q.event_id = p.event_id AND q.rn = 1
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


def _idw_oracle_sql() -> str:
    """INDEPENDENT bbox-join oracle (no grid cells — a covering-cell bug on
    the Spark side mismatches instead of hiding); the weighted sums fold the
    neighbor list in the same ascending (d2, id) order, each term the same
    single-divide expression, so the floats agree bit-for-bit (list_reduce
    seeds with the first element == Spark's 0.0 seed since 0.0 + x == x for
    the strictly positive terms)."""
    n, r, eps = IDW_GRID_N, 1.0 / IDW_SCALE, IDW_EPS
    return f"""
{_SQL_PTS.strip()},
grid AS (
  SELECT i AS query_id,
    35.0 + CAST(i // {n} AS DOUBLE) * 0.0625 AS qlat,
    138.0 + CAST(i % {n} AS DOUBLE) * 0.0625 AS qlon
  FROM generate_series(0, {n * n - 1}) t(i)
),
sv AS (
  SELECT p.event_id, p.lat, p.lon, e.value
  FROM pts p JOIN events e USING (event_id)
),
hits AS (
  SELECT g.query_id,
    (g.qlon - s.lon) * (g.qlon - s.lon) + (g.qlat - s.lat) * (g.qlat - s.lat) AS d2,
    s.event_id, s.value
  FROM grid g JOIN sv s
    ON s.lon >= g.qlon - {2 * r!r} AND s.lon <= g.qlon + {2 * r!r}
   AND s.lat >= g.qlat - {2 * r!r} AND s.lat <= g.qlat + {2 * r!r}
  WHERE (g.qlon - s.lon) * (g.qlon - s.lon) + (g.qlat - s.lat) * (g.qlat - s.lat)
        <= {r * r!r}
),
lsts AS (
  SELECT query_id, count(*) AS n_samples,
    list(row(d2, event_id, value) ORDER BY d2 ASC, event_id ASC) AS l
  FROM hits GROUP BY query_id
),
agg AS (
  SELECT query_id, n_samples,
    list_reduce(list_transform(l, s -> s[3] / (s[1] + {eps!r})), (a, b) -> a + b)
      / list_reduce(list_transform(l, s -> 1.0 / (s[1] + {eps!r})), (a, b) -> a + b)
      AS idw
  FROM lsts
)
SELECT g.query_id, g.qlat, g.qlon,
  coalesce(a.n_samples, 0) AS n_samples, a.idw
FROM grid g LEFT JOIN agg a USING (query_id)
"""


def _trajectory_oracle_sql() -> str:
    """Identical windows in DuckDB (the user_sessions precedent): one
    (user, us, id) total order serves the lag jump, the running-sum segment
    grouping, and the rollup; epoch_us == the Spark NTZ micros bit-exactly."""
    cut = TRAJ_CUT_D2
    return f"""
{_SQL_PTS.strip()},
j AS (
  SELECT e.user_id, p.event_id, epoch_us(e.ts) AS us, p.lat, p.lon
  FROM pts p JOIN events e USING (event_id)
),
f AS (
  SELECT user_id, event_id, us, lat, lon,
    (lat - lag(lat) OVER w) * (lat - lag(lat) OVER w)
      + (lon - lag(lon) OVER w) * (lon - lag(lon) OVER w) AS d2
  FROM j WINDOW w AS (PARTITION BY user_id ORDER BY us ASC, event_id ASC)
),
g AS (
  SELECT *,
    CASE WHEN d2 IS NULL OR d2 > {cut!r} THEN 1 ELSE 0 END AS newf,
    sum(CASE WHEN d2 IS NULL OR d2 > {cut!r} THEN 1 ELSE 0 END) OVER (
      PARTITION BY user_id ORDER BY us ASC, event_id ASC
      ROWS UNBOUNDED PRECEDING) AS grp
  FROM f
)
SELECT user_id, min(event_id) AS segment_id, count(*) AS n_pings,
  max(us) - min(us) AS duration_us,
  min(lat) AS lat_min, max(lat) AS lat_max,
  min(lon) AS lon_min, max(lon) AS lon_max,
  max(CASE WHEN newf = 0 THEN d2 END) AS max_jump_d2,
  count(*) >= 3 AS is_stay
FROM g GROUP BY user_id, grp
"""


def _dp_d2_sql(p: str) -> str:
    """Squared perpendicular distance of point alias `p` to the chord
    pa->pb — token-mirrors the operator's NumPy kernel (cross^2 / len2,
    point-to-anchor fallback when the chord endpoints coincide)."""
    vx = "(pb.lon - pa.lon)"
    vy = "(pb.lat - pa.lat)"
    len2 = f"({vx} * {vx} + {vy} * {vy})"
    cross = f"({vx} * ({p}.lat - pa.lat) - {vy} * ({p}.lon - pa.lon))"
    pt = (
        f"(({p}.lon - pa.lon) * ({p}.lon - pa.lon) "
        f"+ ({p}.lat - pa.lat) * ({p}.lat - pa.lat))"
    )
    return f"CASE WHEN {len2} > 0.0 THEN ({cross} * {cross}) / {len2} ELSE {pt} END"


def _simplify_oracle_sql(eps2: float = SIMPLIFY_EPS2) -> str:
    """Recursive-CTE replay of the Douglas-Peucker subdivision: the
    working set is the interval tree; each interval's pivot is the
    strictly-farthest interior point (tie -> lowest index, the np.argmax
    rule) found via a NOT-EXISTS argmax (aggregates are not allowed in a
    recursive term); children intervals are emitted UNFILTERED so every
    pivot appears as an interval endpoint — the kept set is exactly the
    distinct endpoints of the closure plus each track's first/last point.
    ix is MATERIALIZED per the dbscan-oracle precedent (DuckDB otherwise
    re-evaluates it every recursion step)."""
    d2p, d2q = _dp_d2_sql("p"), _dp_d2_sql("q")
    pts = _SQL_PTS.strip().replace("WITH pts AS (", "WITH RECURSIVE pts AS (", 1)
    return f"""
{pts},
j AS (
  SELECT e.user_id, p.event_id, e.ts, p.lat, p.lon
  FROM pts p JOIN events e USING (event_id)
),
ix AS MATERIALIZED (
  SELECT user_id, event_id, ts, lat, lon,
    row_number() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) - 1 AS idx,
    count(*) OVER (PARTITION BY user_id) AS n
  FROM j
),
iv(user_id, a, b) AS (
  SELECT user_id, CAST(0 AS BIGINT), CAST(n - 1 AS BIGINT)
  FROM (SELECT DISTINCT user_id, n FROM ix) roots WHERE n > 2
  UNION
  SELECT s.user_id,
    CASE WHEN sd.side = 0 THEN s.a ELSE p.idx END,
    CASE WHEN sd.side = 0 THEN p.idx ELSE s.b END
  FROM iv s
  JOIN ix pa ON pa.user_id = s.user_id AND pa.idx = s.a
  JOIN ix pb ON pb.user_id = s.user_id AND pb.idx = s.b
  JOIN ix p ON p.user_id = s.user_id AND p.idx > s.a AND p.idx < s.b
  CROSS JOIN (SELECT unnest([0, 1]) AS side) sd
  WHERE {d2p} > {eps2!r}
    AND NOT EXISTS (
      SELECT 1 FROM ix q
      WHERE q.user_id = s.user_id AND q.idx > s.a AND q.idx < s.b
        AND ({d2q} > {d2p} OR ({d2q} = {d2p} AND q.idx < p.idx))
    )
),
kept_idx AS (
  -- explicit outer DISTINCT: DuckDB 1.0 does not reliably set-dedupe a
  -- UNION whose branches reference the recursive CTE more than once
  -- (measured: one duplicate endpoint row per track without it)
  SELECT DISTINCT user_id, idx FROM (
    SELECT user_id, a AS idx FROM iv
    UNION ALL SELECT user_id, b AS idx FROM iv
    UNION ALL SELECT user_id, 0 AS idx FROM (SELECT DISTINCT user_id FROM ix) u1
    UNION ALL SELECT user_id, n - 1 AS idx FROM (SELECT DISTINCT user_id, n FROM ix) u2
  ) z
),
kept AS (
  SELECT i.user_id, i.event_id, i.ts, i.lat, i.lon, i.n AS n_in, i.idx
  FROM ix i JOIN kept_idx k ON k.user_id = i.user_id AND k.idx = i.idx
)
SELECT user_id, event_id, ts, lat, lon, CAST(n_in AS BIGINT) AS n_in,
  row_number() OVER (PARTITION BY user_id ORDER BY idx ASC) - 1 AS pt_rank
FROM kept
"""



def _resample_oracle_sql(step: int = RESAMPLE_STEP_US) -> str:
    """Token-mirror of resample_tracks: identical (ts, id) windows, exact
    BIGINT ceil-division grid indices (`//` = DuckDB integer division),
    the same single double-division frac and interpolation op order, and
    the same last-ping-on-grid rule. epoch_us matches Spark's
    TIMESTAMP_NTZ microsecond diff bit-exactly (CLAUDE.md); the grid
    instants come back via make_timestamp(micros) (naive)."""
    return f"""
{_SQL_PTS.strip()},
j AS (
  SELECT e.user_id, p.event_id, epoch_us(e.ts) AS us, p.lat, p.lon
  FROM pts p JOIN events e USING (event_id)
),
iv AS (
  SELECT user_id, lat, lon, us,
    first_value(us) OVER w AS t0,
    lead(us) OVER w AS nus,
    lead(lat) OVER w AS nlat,
    lead(lon) OVER w AS nlon
  FROM j
  WINDOW w AS (PARTITION BY user_id ORDER BY us ASC, event_id ASC)
),
expl AS (
  SELECT user_id, lat, lon, us, t0, nus, nlat, nlon,
    unnest(CASE
      WHEN nus IS NOT NULL
           AND (nus - t0 + {step - 1}) // {step} > (us - t0 + {step - 1}) // {step}
        THEN generate_series((us - t0 + {step - 1}) // {step},
                             (nus - t0 + {step - 1}) // {step} - 1)
      WHEN nus IS NULL AND (us - t0) % {step} = 0
        THEN [(us - t0 + {step - 1}) // {step}]
      ELSE []
    END) AS grid_idx
  FROM iv
)
SELECT user_id, grid_idx,
  make_timestamp(t0 + grid_idx * {step}) AS ts,
  CASE WHEN t0 + grid_idx * {step} = us THEN lat
       ELSE lat + (nlat - lat) * (CAST(t0 + grid_idx * {step} - us AS DOUBLE)
                                  / CAST(nus - us AS DOUBLE)) END AS lat,
  CASE WHEN t0 + grid_idx * {step} = us THEN lon
       ELSE lon + (nlon - lon) * (CAST(t0 + grid_idx * {step} - us AS DOUBLE)
                                  / CAST(nus - us AS DOUBLE)) END AS lon
FROM expl
"""



def _hull_cross_sql(c: str, p: str, q: str) -> str:
    """cross(c, p, q) = (px-cx)*(qy-cy) - (py-cy)*(qx-cx) — the kernel's
    token order (geo_misc.convex_hulls)."""
    return (
        f"(({p}.lon - {c}.lon) * ({q}.lat - {c}.lat)"
        f" - ({p}.lat - {c}.lat) * ({q}.lon - {c}.lon))"
    )


def _hull_d2_sql(c: str, p: str) -> str:
    return (
        f"(({p}.lon - {c}.lon) * ({p}.lon - {c}.lon)"
        f" + ({p}.lat - {c}.lat) * ({p}.lat - {c}.lat))"
    )


def _hull_oracle_sql() -> str:
    """Recursive gift-wrap replay: dedupe coordinates (min event id),
    start at the lexicographic (lon, lat) minimum, and each step's next
    vertex is the point with NO other point strictly right of the ray
    (collinear ties -> strictly farther wins) — the exact quantified
    definition the Spark kernel verifies its tournament winner against,
    on identical input bits. Recursion stops when the winner is the
    start vertex."""
    cross_pq = _hull_cross_sql("h", "p", "q")
    d2q, d2p = _hull_d2_sql("h", "q"), _hull_d2_sql("h", "p")
    pts = _SQL_PTS.strip().replace("WITH pts AS (", "WITH RECURSIVE pts AS (", 1)
    return f"""
{pts},
j AS (
  SELECT e.user_id, p.event_id, p.lat, p.lon
  FROM pts p JOIN events e USING (event_id)
),
d AS MATERIALIZED (
  SELECT user_id, lon, lat, min(event_id) AS event_id
  FROM j GROUP BY user_id, lon, lat
),
np AS (SELECT user_id, count(*) AS n_pts FROM d GROUP BY user_id),
start AS (
  SELECT s.user_id, s.lon, s.lat, s.event_id FROM d s
  WHERE NOT EXISTS (
    SELECT 1 FROM d t WHERE t.user_id = s.user_id
      AND (t.lon < s.lon OR (t.lon = s.lon AND t.lat < s.lat))
  )
),
hull(user_id, hull_rank, lon, lat, event_id, sx, sy) AS (
  SELECT user_id, CAST(0 AS BIGINT), lon, lat, event_id, lon, lat FROM start
  UNION ALL
  SELECT h.user_id, h.hull_rank + 1, p.lon, p.lat, p.event_id, h.sx, h.sy
  FROM hull h
  JOIN d p ON p.user_id = h.user_id
          AND (p.lon <> h.lon OR p.lat <> h.lat)
  WHERE NOT (p.lon = h.sx AND p.lat = h.sy)
    AND NOT EXISTS (
      SELECT 1 FROM d q
      WHERE q.user_id = h.user_id
        AND (q.lon <> h.lon OR q.lat <> h.lat)
        AND (q.lon <> p.lon OR q.lat <> p.lat)
        AND ({cross_pq} < 0.0
             OR ({cross_pq} = 0.0 AND {d2q} > {d2p}))
    )
)
SELECT h.user_id, h.hull_rank, h.event_id, h.lon, h.lat, np.n_pts
FROM hull h JOIN np USING (user_id)
"""



def _colocation_oracle_sql(
    scale: int = COLOC_SCALE, window_us: int = COLOC_WINDOW_US
) -> str:
    """Quadratic cross-user self-join with the exact d2/dt predicates —
    deliberately grid-free (the segment_snap precedent): the operator's
    27-key covering must reproduce these values bit-for-bit or the
    driver compare fails. d2 op order mirrors the operator's
    probe-minus-build with probe = the smaller user. Assumes us >= 0
    (Spark `div` truncates, DuckDB `//` floors — identical only for
    non-negative epochs; the fixture is 2024+)."""
    w = int(window_us)
    r2 = repr((1.0 / scale) ** 2)
    d2 = (
        "((a.lon - b.lon) * (a.lon - b.lon)"
        " + (a.lat - b.lat) * (a.lat - b.lat))"
    )
    return f"""
{_SQL_PTS.strip()},
tl AS (
  SELECT e.user_id, epoch_us(e.ts) AS us, p.lat, p.lon
  FROM pts p JOIN events e USING (event_id)
)
SELECT a.user_id AS user_a, b.user_id AS user_b,
  count(*) AS n_contacts,
  min({d2}) AS min_d2,
  CAST(min(least(a.us, b.us)) AS BIGINT) AS first_us
FROM tl a JOIN tl b
  ON a.user_id < b.user_id
 AND b.us BETWEEN a.us - {w} AND a.us + {w}
 AND {d2} <= {r2}
GROUP BY a.user_id, b.user_id
"""


def _od_oracle_sql(
    gap_minutes: int = OD_GAP_MINUTES, scale: int = OD_SCALE
) -> str:
    """Token-mirror of od_flows: identical gap-lag / running-sum /
    endpoint row_number windows under the (ts, id) total order, the same
    floor(coord * scale) cell math (scale is a power of two — exact IEEE
    product, identical floor on both engines), exact BIGINT durations.
    DuckDB sum(BIGINT) is HUGEINT — cast back to BIGINT."""
    gap_us = int(gap_minutes) * 60 * 1_000_000
    s = f"{float(scale)!r}"
    return f"""
{_SQL_PTS.strip()},
j AS (
  SELECT e.user_id, p.event_id, epoch_us(e.ts) AS us, p.lat, p.lon
  FROM pts p JOIN events e USING (event_id)
),
flagged AS (
  SELECT *,
    CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > {gap_us}
         THEN 1 ELSE 0 END AS new
  FROM j
  WINDOW w AS (PARTITION BY user_id ORDER BY us ASC, event_id ASC)
),
grp AS (
  SELECT *, sum(new) OVER (
    PARTITION BY user_id ORDER BY us ASC, event_id ASC
    ROWS UNBOUNDED PRECEDING) AS g
  FROM flagged
),
ends AS (
  SELECT *,
    row_number() OVER (PARTITION BY user_id, g
                       ORDER BY us ASC, event_id ASC) AS rna,
    row_number() OVER (PARTITION BY user_id, g
                       ORDER BY us DESC, event_id DESC) AS rnd
  FROM grp
),
trips AS (
  SELECT user_id, g,
    min(CASE WHEN rna = 1 THEN CAST(floor(lon * {s}) AS BIGINT) END) AS o_gx,
    min(CASE WHEN rna = 1 THEN CAST(floor(lat * {s}) AS BIGINT) END) AS o_gy,
    min(CASE WHEN rnd = 1 THEN CAST(floor(lon * {s}) AS BIGINT) END) AS d_gx,
    min(CASE WHEN rnd = 1 THEN CAST(floor(lat * {s}) AS BIGINT) END) AS d_gy,
    max(us) - min(us) AS dur
  FROM ends GROUP BY user_id, g
)
SELECT o_gx, o_gy, d_gx, d_gy,
  count(*) AS n_trips,
  count(DISTINCT user_id) AS n_users,
  CAST(sum(dur) AS BIGINT) AS total_duration_us
FROM trips GROUP BY o_gx, o_gy, d_gx, d_gy
"""


def _od_topk_oracle_sql(k: int = OD_TOP_K) -> str:
    """The od_flows oracle nested as a subquery (DuckDB allows WITH
    inside a parenthesized subquery), then the identical
    (n_trips DESC, d_gx, d_gy) row_number ranking and top-k filter."""
    return f"""
SELECT o_gx, o_gy, d_gx, d_gy, n_trips, n_users, total_duration_us,
       dest_rank
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY o_gx, o_gy
    ORDER BY n_trips DESC, d_gx ASC, d_gy ASC) AS dest_rank
  FROM ({_od_oracle_sql()}
  ) od
) ranked
WHERE dest_rank <= {int(k)}
"""


def _trip_shape_oracle_sql(gap_minutes: int = OD_GAP_MINUTES) -> str:
    """Token-mirror of trip_shape: identical gap/running-sum/row_number
    windows, the same dlat*dlat + dlon*dlon jump form, and the canonical
    ascending-value fold (list_sort + list_reduce == sort_array +
    F.aggregate seeded 0.0 — CLAUDE.md: the first-element seed equals
    the 0.0 seed). list(x) FILTER (WHERE new = 0) mirrors collect_list
    dropping the when()-NULLs; all-filtered groups (single-ping trips)
    come back as NULL lists (not []) from DuckDB's FILTER and must fold
    to 0.0 explicitly — list_reduce also raises on empty input."""
    gap_us = int(gap_minutes) * 60 * 1_000_000
    return f"""
{_SQL_PTS.strip()},
j AS (
  SELECT e.user_id, p.event_id, epoch_us(e.ts) AS us, p.lat, p.lon
  FROM pts p JOIN events e USING (event_id)
),
flagged AS (
  SELECT *,
    (lat - lag(lat) OVER w) * (lat - lag(lat) OVER w)
      + (lon - lag(lon) OVER w) * (lon - lag(lon) OVER w) AS d2,
    CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > {gap_us}
         THEN 1 ELSE 0 END AS new
  FROM j
  WINDOW w AS (PARTITION BY user_id ORDER BY us ASC, event_id ASC)
),
grp AS (
  SELECT *, sum(new) OVER (
    PARTITION BY user_id ORDER BY us ASC, event_id ASC
    ROWS UNBOUNDED PRECEDING) AS g
  FROM flagged
),
ends AS (
  SELECT *,
    row_number() OVER (PARTITION BY user_id, g
                       ORDER BY us ASC, event_id ASC) AS rna,
    row_number() OVER (PARTITION BY user_id, g
                       ORDER BY us DESC, event_id DESC) AS rnd
  FROM grp
),
trips AS (
  SELECT user_id, g,
    min(event_id) AS trip_id,
    count(*) AS n_pings,
    list_sort(list(sqrt(d2)) FILTER (WHERE new = 0)) AS jumps,
    min(CASE WHEN rna = 1 THEN lat END) AS olat,
    min(CASE WHEN rna = 1 THEN lon END) AS olon,
    min(CASE WHEN rnd = 1 THEN lat END) AS dlat,
    min(CASE WHEN rnd = 1 THEN lon END) AS dlon
  FROM ends GROUP BY user_id, g
),
shaped AS (
  SELECT user_id, trip_id, n_pings,
    CASE WHEN jumps IS NULL OR len(jumps) = 0 THEN 0.0
         ELSE list_reduce(jumps, (a, b) -> a + b) END AS path_len,
    sqrt((dlat - olat) * (dlat - olat)
         + (dlon - olon) * (dlon - olon)) AS displacement
  FROM trips
)
SELECT user_id, trip_id, n_pings, path_len, displacement,
  CASE WHEN displacement > 0 THEN path_len / displacement END AS tortuosity
FROM shaped
"""


def _kinematics_oracle_sql(vmax: float = KIN_VMAX) -> str:
    """Token-mirror of track_kinematics: identical (ts, id) lag windows,
    the same dlat*dlat + dlon*dlon op order, sqrt-then-divide speed, and
    the dt > 0 NULL guard (a dt = 0 Inf/NaN would compare
    engine-specific bits). epoch_us matches Spark's TIMESTAMP_NTZ
    microsecond diff bit-exactly (CLAUDE.md)."""
    v = repr(float(vmax))
    return f"""
{_SQL_PTS.strip()},
j AS (
  SELECT e.user_id, p.event_id, epoch_us(e.ts) AS us, p.lat, p.lon
  FROM pts p JOIN events e USING (event_id)
),
deltas AS (
  SELECT user_id, event_id, us,
    us - lag(us) OVER w AS dt_us,
    (lat - lag(lat) OVER w) * (lat - lag(lat) OVER w)
      + (lon - lag(lon) OVER w) * (lon - lag(lon) OVER w) AS d2
  FROM j
  WINDOW w AS (PARTITION BY user_id ORDER BY us ASC, event_id ASC)
),
spd AS (
  SELECT *,
    CASE WHEN dt_us > 0
         THEN sqrt(d2) / (CAST(dt_us AS DOUBLE) / 1000000.0) END AS speed
  FROM deltas
)
SELECT user_id, event_id, dt_us, d2, speed,
  CASE WHEN dt_us > 0
       THEN (speed - lag(speed) OVER w2)
            / (CAST(dt_us AS DOUBLE) / 1000000.0) END AS accel,
  speed > {v} AS is_impossible
FROM spd
WINDOW w2 AS (PARTITION BY user_id ORDER BY us ASC, event_id ASC)
"""


def _cell_smooth_oracle_sql() -> str:
    """Level-4 fine-grid coordinates via the same tile+subcell decomposition
    the cell_heatmap oracle pins (identical IEEE ops), then the all-integer
    3x3 kernel convolution — exact, no float parity surface at all."""
    k = 1 << SMOOTH_LEVEL
    kern_rows = ", ".join(f"({dx}, {dy}, {w})" for dx, dy, w in geo_misc.SMOOTH_KERNEL)
    return f"""
{_SQL_PTS.strip()},
c AS (
  SELECT
    (CAST(floor(lat) AS BIGINT) + 90) * {k}
      + CAST(floor((lat - floor(lat)) * {k}) AS BIGINT) AS gy,
    (CAST(floor(lon) AS BIGINT) + 180) * {k}
      + CAST(floor((lon - floor(lon)) * {k}) AS BIGINT) AS gx
  FROM pts
),
cnt AS (SELECT gy, gx, count(*) AS n FROM c GROUP BY gy, gx),
kern(dx, dy, w) AS (VALUES {kern_rows}),
contrib AS (
  SELECT gy + dy AS ry, gx + dx AS rx, n * w AS wn,
    CASE WHEN dx = 0 AND dy = 0 THEN n ELSE 0 END AS own
  FROM cnt CROSS JOIN kern
),
sm AS (
  SELECT ry, rx, sum(own) AS n_own, sum(wn) AS smoothed
  FROM contrib
  WHERE ry >= 0 AND ry < {180 * k} AND rx >= 0 AND rx < {360 * k}
  GROUP BY ry, rx
)
SELECT ((ry // {k}) * 360 + (rx // {k})) * {k * k} + (ry % {k}) * {k} + (rx % {k})
    AS cell,
  CAST(n_own AS BIGINT) AS n_own, CAST(smoothed AS BIGINT) AS smoothed
FROM sm
"""


def _dbscan_oracle_sql(scale: int = DBSCAN_SCALE, min_pts: int = DBSCAN_MIN_PTS) -> str:
    """INDEPENDENT formulation: candidate pairs come from a naive 2r bbox
    self-join (no grid cells — a covering-cell bug on the Spark side
    mismatches instead of hiding), cluster labels from a recursive-CTE
    transitive closure over the core-core eps-graph (the neardup_groups
    oracle precedent). CTEs are MATERIALIZED because DuckDB otherwise
    re-evaluates the edge join on every recursion step (~24 s -> 1.5 s).
    At eps = 2^-13 the dense fixture lattice (step 1e-4) is 4-connected at
    33% site occupancy — below the 2-D percolation threshold, so components
    stay small and the closure is ~10k rows, never quadratic."""
    r = 1.0 / scale
    pts = _SQL_PTS.strip().replace("WITH pts AS (", "WITH RECURSIVE pts AS MATERIALIZED (", 1)
    return f"""
{pts},
prs AS MATERIALIZED (
  SELECT a.event_id AS id, b.event_id AS nid
  FROM pts a JOIN pts b
    ON b.lon >= a.lon - {2 * r!r} AND b.lon <= a.lon + {2 * r!r}
   AND b.lat >= a.lat - {2 * r!r} AND b.lat <= a.lat + {2 * r!r}
   AND a.event_id <> b.event_id
  WHERE (a.lon - b.lon) * (a.lon - b.lon)
      + (a.lat - b.lat) * (a.lat - b.lat) <= {r * r!r}
),
cnt AS (SELECT id, count(*) AS n FROM prs GROUP BY id),
flags AS MATERIALIZED (
  SELECT p.event_id, COALESCE(c.n, 0) AS n_neighbors,
    COALESCE(c.n, 0) >= {min_pts} AS is_core
  FROM pts p LEFT JOIN cnt c ON c.id = p.event_id
),
core_edges AS MATERIALIZED (
  SELECT pr.id AS a, pr.nid AS b FROM prs pr
  JOIN flags fa ON fa.event_id = pr.id AND fa.is_core
  JOIN flags fb ON fb.event_id = pr.nid AND fb.is_core
),
reach(src, dst) AS (
  SELECT event_id, event_id FROM flags WHERE is_core
  UNION
  SELECT r.src, e.b FROM reach r JOIN core_edges e ON r.dst = e.a
),
lab AS (SELECT src AS id, min(dst) AS cluster_id FROM reach GROUP BY src),
bord AS (
  SELECT pr.id, min(l.cluster_id) AS cluster_id
  FROM prs pr JOIN lab l ON l.id = pr.nid
  JOIN flags f ON f.event_id = pr.id AND NOT f.is_core
  GROUP BY pr.id
)
SELECT f.event_id,
  CAST(f.n_neighbors AS BIGINT) AS n_neighbors,
  CASE WHEN f.is_core THEN 'core'
       WHEN b.cluster_id IS NOT NULL THEN 'border'
       ELSE 'noise' END AS role,
  CASE WHEN f.is_core THEN l.cluster_id ELSE b.cluster_id END AS cluster_id
FROM flags f
LEFT JOIN lab l ON l.id = f.event_id
LEFT JOIN bord b ON b.id = f.event_id
"""


def queries():
    return {
        "geohash_cells": q_geohash_cells,
        "mercator_tiles": q_mercator_tiles,
        "density_tiles": q_density_tiles,
        "segment_snap": q_segment_snap,
        "radius_neighbors": q_radius_neighbors,
        "idw_grid": q_idw_grid,
        "trajectory_segments": q_trajectory_segments,
        "simplify_track": q_simplify_track,
        "resample_track": q_resample_track,
        "convex_hull": q_convex_hull,
        "colocation": q_colocation,
        "od_flows": q_od_flows,
        "od_top_destinations": q_od_top_destinations,
        "track_kinematics": q_track_kinematics,
        "trip_shape": q_trip_shape,
        "cell_smooth": q_cell_smooth,
        "dbscan_clusters": q_dbscan_clusters,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "geohash_cells": _geohash_oracle_sql(),
        "mercator_tiles": _mercator_oracle_sql(),
        "density_tiles": _density_oracle_sql(),
        "segment_snap": _segment_snap_oracle_sql(),
        "radius_neighbors": _radius_oracle_sql(),
        "idw_grid": _idw_oracle_sql(),
        "trajectory_segments": _trajectory_oracle_sql(),
        "simplify_track": _simplify_oracle_sql(),
        "resample_track": _resample_oracle_sql(),
        "convex_hull": _hull_oracle_sql(),
        "colocation": _colocation_oracle_sql(),
        "od_flows": _od_oracle_sql(),
        "od_top_destinations": _od_topk_oracle_sql(),
        "track_kinematics": _kinematics_oracle_sql(),
        "trip_shape": _trip_shape_oracle_sql(),
        "cell_smooth": _cell_smooth_oracle_sql(),
        "dbscan_clusters": _dbscan_oracle_sql(),
    }
