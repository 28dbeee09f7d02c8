"""Event-stream analytics: gap-based sessionization.

The classic clickstream operator a 100-TB event pipeline runs first:
partition by user, order by time, cut a new session wherever the gap to
the previous event exceeds a threshold, then aggregate per session.

Scale shape: ONE hash shuffle on the user key serves everything — the two
window passes (lag for the gap flag, running sum for the session group)
share the same partitioning+ordering so Catalyst plans a single Exchange +
Sort, and the final per-session aggregation's grouping keys start with the
partition key so no further shuffle is required. All arithmetic is exact
integer microseconds — bit-identical across engines (no float time math).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DEFAULT_GAP_MINUTES = 30


def sessionize(
    events: DataFrame,
    gap_minutes: int = DEFAULT_GAP_MINUTES,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-session rollup: (user_id, session_id, n_events, duration_us,
    n_event_types) where session_id = the lowest event id in the session
    (deterministic), and a session breaks when the gap to the previous
    event exceeds `gap_minutes`. Ordering ties on identical timestamps
    break by event id, so the session assignment is total and
    reproducible."""
    gap_us = int(gap_minutes) * 60 * 1_000_000
    # naive epoch microseconds via TIMESTAMP_NTZ arithmetic — deliberately
    # NOT unix_micros(cast(.. as timestamp)), whose session-timezone offset
    # is only constant in fixed-offset zones: with a DST-observing session
    # zone, gaps straddling a transition would shift by the DST delta and
    # split sessions differently from the (naive) DuckDB oracle
    us = F.timestamp_diff(
        "MICROSECOND",
        F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
        F.col(ts_col).cast("timestamp_ntz"),
    )
    w = Window.partitionBy(user_col).orderBy(us.asc(), F.col(id_col).asc())
    flagged = events.select(
        user_col,
        id_col,
        type_col,
        us.alias("_us"),
        (F.lag(us).over(w).isNull() | ((us - F.lag(us).over(w)) > gap_us))
        .cast("long")
        .alias("_new"),
    )
    w2 = Window.partitionBy(user_col).orderBy(
        F.col("_us").asc(), F.col(id_col).asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grouped = flagged.select(
        user_col, id_col, type_col, "_us", F.sum("_new").over(w2).alias("_grp")
    )
    return (
        grouped.groupBy(user_col, "_grp")
        .agg(
            F.min(id_col).alias("session_id"),
            F.count("*").alias("n_events"),
            (F.max("_us") - F.min("_us")).alias("duration_us"),
            F.countDistinct(type_col).alias("n_event_types"),
        )
        .select(user_col, "session_id", "n_events", "duration_us", "n_event_types")
    )


def trajectory_segments(
    pings: DataFrame,
    cut_d2: float = 0.0625,
    stay_min_pings: int = 3,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Spatial sessionization of a ping stream (the trajectory analog of
    `sessionize`, and the stay-point / trip-segmentation primitive under
    mobility analytics): partition by user, order by time, cut a new
    segment wherever the planar squared jump from the previous ping
    exceeds `cut_d2`, then roll each segment up to its bounding box,
    duration, ping count, and largest within-segment jump. Segments whose
    consecutive jumps all stayed inside the cutoff AND that accumulated
    >= `stay_min_pings` pings are flagged as stays (dwell clusters).

    Scale shape: identical to `sessionize` — the lag window (previous
    lat/lon for the jump), the running-sum segment grouping, and the final
    rollup all share ONE hash Exchange + Sort on (user, ts, id); the jump
    metric is pure subtract/multiply/add on IEEE doubles (same op order on
    every engine), timestamps are exact naive-epoch integer microseconds
    (TIMESTAMP_NTZ math — DST-proof, bit-equal to DuckDB epoch_us), so the
    whole rollup is reproducible bit-for-bit at any partitioning.

    `cut_d2` MUST be an exactly-representable double (default 2^-4 — a
    quarter-degree cut) so the threshold compare cannot straddle an engine
    rounding difference.

    Output: (user_id, segment_id = lowest event id in the segment,
    n_pings, duration_us, lat_min/lat_max/lon_min/lon_max, max_jump_d2 =
    largest within-segment jump (NULL for 1-ping segments), is_stay).
    """
    us = F.timestamp_diff(
        "MICROSECOND",
        F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
        F.col(ts_col).cast("timestamp_ntz"),
    )
    # stage _us as a COLUMN before any window: both window passes must
    # order by the identical (column) sort keys or Catalyst plans a second
    # Sort it cannot prove redundant
    base = pings.select(user_col, id_col, lat_col, lon_col, us.alias("_us"))
    w = Window.partitionBy(user_col).orderBy(
        F.col("_us").asc(), F.col(id_col).asc()
    )
    lat, lon = F.col(lat_col), F.col(lon_col)
    dlat = lat - F.lag(lat).over(w)
    dlon = lon - F.lag(lon).over(w)
    d2 = dlat * dlat + dlon * dlon
    flagged = base.select(
        user_col,
        id_col,
        lat_col,
        lon_col,
        "_us",
        d2.alias("_d2"),
        (d2.isNull() | (d2 > F.lit(float(cut_d2)))).cast("long").alias("_new"),
    )
    w2 = Window.partitionBy(user_col).orderBy(
        F.col("_us").asc(), F.col(id_col).asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grouped = flagged.select(
        user_col,
        id_col,
        lat_col,
        lon_col,
        "_us",
        "_d2",
        "_new",
        F.sum("_new").over(w2).alias("_grp"),
    )
    n_pings = F.count(F.lit(1)).alias("n_pings")
    return (
        grouped.groupBy(user_col, "_grp")
        .agg(
            F.min(id_col).alias("segment_id"),
            n_pings,
            (F.max("_us") - F.min("_us")).alias("duration_us"),
            F.min(lat_col).alias("lat_min"),
            F.max(lat_col).alias("lat_max"),
            F.min(lon_col).alias("lon_min"),
            F.max(lon_col).alias("lon_max"),
            # the first ping of a segment carries the jump INTO it (the cut
            # jump, or NULL at the head) — only _new == 0 jumps are inside
            F.max(F.when(F.col("_new") == 0, F.col("_d2"))).alias("max_jump_d2"),
        )
        .select(
            user_col,
            "segment_id",
            "n_pings",
            "duration_us",
            "lat_min",
            "lat_max",
            "lon_min",
            "lon_max",
            "max_jump_d2",
            (F.col("n_pings") >= stay_min_pings).alias("is_stay"),
        )
    )


def asof_join(
    probes: DataFrame,
    markers: DataFrame,
    key_col: str,
    ts_col: str,
    payload_cols: Sequence[str],
    tolerance: int | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Backward-inclusive as-of join: for every probe row, attach the
    payload of the latest marker row with the same key and marker ts <=
    probe ts (the time-series join Spark SQL lacks as a primitive; the
    reference's nearest-tile fallback is the spatial analog of the same
    "closest earlier neighbor" contract).

    NOT a range join: the naive `probes JOIN markers ON key AND m.ts <=
    p.ts` explodes to O(probes x markers-per-key) intermediate rows before
    the per-probe max — at 100 TB that intermediate dwarfs both inputs.
    This is the union-sort shape instead: tag both inputs, union them
    (marker payload NULL on probe rows and vice versa), then ONE window
    pass per key ordered by (ts, is_probe) takes `last(payload, ignore
    nulls)` over the preceding frame. Cost: a single hash Exchange on the
    key serving both inputs + one sort — the same partitioning a
    sessionization pass already uses, and shuffle bytes are exactly
    |probes| + |markers| rows. Per-key work is sequential (windows cannot
    salt), so the scale knob is key cardinality, not corpus size; event
    streams keyed by user/session/device have millions of small keys.

    Equal timestamps: markers sort BEFORE probes (is_probe breaks the
    tie), so a marker at exactly the probe ts matches — the same inclusive
    `p.ts >= m.ts` contract as DuckDB ASOF JOIN and pandas merge_asof.
    If `tiebreak_col` is given, duplicate marker timestamps resolve to the
    row with the GREATEST tiebreak value — folded into the window sort
    order itself (markers order by (ts, tiebreak), and `last()` keeps the
    final one), so the resolution costs ZERO extra shuffle (a groupBy
    pre-reduce would add a second Exchange on (key, ts)). Without it the
    caller guarantees (key, ts) uniqueness on the marker side.

    `tolerance`, if given, voids matches older than `tolerance` ts units
    before the probe (backward-nearest means any EARLIER marker is farther
    still, so a post-filter is exact, not an approximation).

    Output: every probe row + `asof_ts` (matched marker ts) +
    `asof_<payload>` for each payload column; all NULL when no marker
    qualifies.
    """
    m_payload = F.struct(
        F.col(ts_col).alias("_mts"),
        *[F.col(c).alias(c) for c in payload_cols],
    )
    tb = (
        F.col(tiebreak_col) if tiebreak_col is not None else F.lit(None).cast("long")
    )
    marker_side = markers.select(
        key_col, ts_col, tb.alias("_tb"), m_payload.alias("_m")
    )
    m_type = marker_side.schema["_m"].dataType.simpleString()
    tb_type = dict(marker_side.dtypes)["_tb"]
    probe_cols = probes.columns
    p_types = dict(probes.dtypes)
    p = probes.select(
        *probe_cols,
        F.lit(1).alias("_is_probe"),
        F.lit(None).cast(tb_type).alias("_tb"),
        F.lit(None).cast(m_type).alias("_m"),
    )
    m = marker_side.select(
        *[
            F.col(c) if c in (key_col, ts_col) else F.lit(None).cast(p_types[c]).alias(c)
            for c in probe_cols
        ],
        F.lit(0).alias("_is_probe"),
        F.col("_tb"),
        F.col("_m"),
    )
    # probes carry a NULL tiebreak: asc_nulls_first keeps their relative
    # position irrelevant (last(_m, ignorenulls) skips probe rows anyway)
    # while equal-ts markers end with the greatest tiebreak — which last()
    # then picks, no pre-aggregation pass needed
    w = (
        Window.partitionBy(key_col)
        .orderBy(
            F.col(ts_col).asc(),
            F.col("_is_probe").asc(),
            F.col("_tb").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = (
        p.unionByName(m)
        .select(*probe_cols, "_is_probe", F.last("_m", ignorenulls=True).over(w).alias("_asof"))
        .where(F.col("_is_probe") == 1)
    )
    hit = F.col("_asof").isNotNull()
    if tolerance is not None:
        hit = hit & ((F.col(ts_col) - F.col("_asof._mts")) <= F.lit(tolerance))
    return joined.select(
        *probe_cols,
        F.when(hit, F.col("_asof._mts")).alias("asof_ts"),
        *[F.when(hit, F.col(f"_asof.{c}")).alias(f"asof_{c}") for c in payload_cols],
    )


def interval_join(
    probes: DataFrame,
    intervals: DataFrame,
    bucket_us: int,
    key_col: str = "user_id",
    us_col: str = "us",
    window_col: str = "window_id",
    start_col: str = "ws_us",
    end_col: str = "we_us",
) -> DataFrame:
    """Bucketized point-in-interval join: every probe row x every interval
    of the same key with start <= probe ts <= end (both inclusive) — the
    range join Spark SQL would otherwise plan as a per-key cross product
    (attribution windows, outage overlaps, campaign exposure joins).

    The scale shape is the 1-D analog of geo_misc.radius_neighbors: each
    INTERVAL explodes to the time buckets it covers (fan-out bounded by
    interval length / bucket_us — pick bucket_us near the median interval
    length), each PROBE lands in exactly ONE bucket map-side, and one
    (key, bucket) equi-join replaces the range predicate, which then runs
    exactly inside the join stage. Because the probe side has exactly one
    bucket per row, every qualifying (probe, interval) pair appears EXACTLY
    once — no dedup pass. Bucket math is pure int64 `div` (exact at any
    epoch). Candidate shuffle bytes: |probes| + |intervals| x avg spanned
    buckets, never the per-key product.

    Output: all probe columns + the interval's window/start/end columns.
    """
    if bucket_us <= 0:
        raise ValueError(f"bucket_us must be positive, got {bucket_us}")
    iv = intervals.select(
        window_col,
        F.col(key_col).alias("_ikey"),
        start_col,
        end_col,
        F.explode(
            F.sequence(
                F.expr(f"{start_col} div {int(bucket_us)}"),
                F.expr(f"{end_col} div {int(bucket_us)}"),
            )
        ).alias("_ibucket"),
    )
    pr = probes.withColumn("_pbucket", F.expr(f"{us_col} div {int(bucket_us)}"))
    return (
        pr.join(
            iv,
            on=(
                (F.col(key_col) == F.col("_ikey"))
                & (F.col("_pbucket") == F.col("_ibucket"))
                & (F.col(us_col) >= F.col(start_col))
                & (F.col(us_col) <= F.col(end_col))
            ),
        )
        .drop("_pbucket", "_ibucket", "_ikey")
    )


def props_stats(
    events: DataFrame,
    type_col: str = "event_type",
    props_col: str = "props",
    key: str = "k",
) -> DataFrame:
    """Semi-structured payload extraction + rollup: parse the JSON props
    column per row (get_json_object — JVM-side path evaluation, no Python,
    no schema inference pass) and aggregate per event type. The 100-TB
    shape for "events carry a JSON blob": extract the needed scalar in the
    scan projection so only (type, value) longs reach the single hash
    aggregation — the JSON string itself never crosses the shuffle.

    Aggregates are exact under any aggregation order (long sum / min / max
    / count — no float accumulation), so the result is bit-reproducible
    across engines and partitionings.

    Output: (event_type, n_events, n_with_key, sum_k, min_k, max_k).

    try_cast, not cast: under ANSI mode (the Spark 4 default, active here)
    a plain cast would throw CAST_INVALID_INPUT on any non-integer value
    (e.g. "3.5" or a string), where the documented contract — and the
    DuckDB oracle's TRY_CAST — yields NULL and excludes the row from the
    key aggregates."""
    k = F.get_json_object(F.col(props_col), f"$.{key}").try_cast("long")
    return (
        events.select(F.col(type_col).alias("event_type"), k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count("k").alias("n_with_key"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


def simplify_trajectories(
    pings: DataFrame,
    epsilon2: float,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Douglas-Peucker polyline simplification per trajectory: keep the
    minimal point subset such that every dropped point lies within
    sqrt(epsilon2) (planar perpendicular distance to the kept chord) of
    the simplified line — the standard pre-storage reducer for GPS tracks
    and vector features (a 1 Hz track at walking speed typically drops
    >90% of points at a few-meter epsilon).

    Implementation: the classic stack-based DP (no recursion) inside ONE
    applyInPandas over the user key — DP is inherently sequential per
    polyline, so per-group Python is the honest kernel; the squared
    perpendicular distance d2 = cross^2 / len2 avoids the sqrt entirely
    (epsilon2 compares in squared units). Anchor==endpoint degeneracy
    (closed loop chord, len2 = 0) falls back to point-to-anchor distance.
    First and last points are always kept; single-point groups pass
    through.

    Scale shape: one hash Exchange on the user key; group size is a
    trajectory, which real pipelines BOUND by sessionizing first
    (trajectory_segments) — compose as segment-then-simplify and the key
    becomes (user, segment_id), never an unbounded whole-history group.
    Ordering inside a group is the deterministic (ts, id) total order.

    Output: the kept pings (user, id, ts, lat, lon) plus n_in (group input
    size) and pt_rank (0-based kept order along the trajectory)."""
    import numpy as np
    import pandas as pd

    schema = (
        f"{user_col} long, {id_col} long, {ts_col} timestamp_ntz, "
        f"{lat_col} double, {lon_col} double, n_in long, pt_rank long"
    )

    def simplify(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, id_col], kind="mergesort").reset_index(drop=True)
        n = len(pdf)
        xs = pdf[lon_col].to_numpy()
        ys = pdf[lat_col].to_numpy()
        keep = np.zeros(n, dtype=bool)
        keep[0] = keep[n - 1] = True
        stack = [(0, n - 1)] if n > 2 else []
        while stack:
            a, b = stack.pop()
            if b - a < 2:
                continue
            ax, ay, bx, by = xs[a], ys[a], xs[b], ys[b]
            vx, vy = bx - ax, by - ay
            len2 = vx * vx + vy * vy
            seg_x = xs[a + 1 : b]
            seg_y = ys[a + 1 : b]
            if len2 > 0.0:
                cross = vx * (seg_y - ay) - vy * (seg_x - ax)
                d2 = (cross * cross) / len2
            else:
                dx = seg_x - ax
                dy = seg_y - ay
                d2 = dx * dx + dy * dy
            k = int(np.argmax(d2))
            if d2[k] > epsilon2:
                m = a + 1 + k
                keep[m] = True
                stack.append((a, m))
                stack.append((m, b))
        out = pdf.loc[keep, [user_col, id_col, ts_col, lat_col, lon_col]].copy()
        out["n_in"] = n
        out["pt_rank"] = np.arange(keep.sum(), dtype=np.int64)
        return out

    # explicit-count repartition on the group key: AQE sizes the Exchange
    # by shuffle BYTES and coalesces this small-but-compute-heavy stage to
    # ~2 tasks (measured 6.9 s at sf0.1); the pinned hash partitioning
    # satisfies the groupBy's ClusteredDistribution, so no second shuffle
    sess = pings.sparkSession
    n_parts = int(sess.conf.get("spark.sql.shuffle.partitions"))
    return (
        pings.repartition(n_parts, user_col)
        .groupBy(user_col)
        .applyInPandas(simplify, schema)
    )


def resample_tracks(
    pings: DataFrame,
    step_us: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Time-regular track resampling: per user, emit one linearly
    interpolated position every `step_us` microseconds on the grid
    t0 + k*step anchored at the user's FIRST ping, from t0 through the
    last ping. The standard normalizer before any fixed-rate trajectory
    model (speed/heading features, map matching, sequence models) —
    irregular GPS pings in, a constant-rate track out.

    Semantics: each grid instant t binds to the unique ping interval
    [t_i, t_{i+1}) containing it under the (ts, id) total order;
    frac = (t - t_i) / (t_{i+1} - t_i) as the ONE double division of two
    exact integer-microsecond deltas, then lat = lat_i + (lat_{i+1} -
    lat_i) * frac (same op order as the DuckDB oracle — bit-exact). A
    grid instant landing exactly on a ping takes that ping's coordinates
    (frac = 0); duplicate-timestamp pings form empty intervals, so the
    instant binds to the LAST tie — deterministic on both engines. The
    final ping emits a sample iff it falls on the grid.

    Scale shape: ONE hash Exchange on the user key serves the lead/first
    window pass; grid emission is a map-side integer `sequence` explode
    over each interval (never a time-grid join, never a per-group
    collect); interval grid indices are exact BIGINT ceil-divisions. Row
    explosion is bounded by duration/step per user — pick step_us at the
    target rate, or sessionize first to bound trajectory spans.

    Output: (user_id, grid_idx, ts = t0 + grid_idx*step as timestamp_ntz,
    lat, lon)."""
    step = int(step_us)
    if step <= 0:
        raise ValueError(f"step_us must be positive, got {step_us}")
    us = F.timestamp_diff(
        "MICROSECOND",
        F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
        F.col(ts_col).cast("timestamp_ntz"),
    )
    staged = pings.select(
        user_col, id_col, lat_col, lon_col, us.alias("_us")
    )
    w = Window.partitionBy(user_col).orderBy(
        F.col("_us").asc(), F.col(id_col).asc()
    )
    iv = staged.select(
        user_col,
        F.col(lat_col).alias("_lat"),
        F.col(lon_col).alias("_lon"),
        "_us",
        F.first("_us").over(w).alias("_t0"),
        F.lead("_us").over(w).alias("_nus"),
        F.lead(lat_col).over(w).alias("_nlat"),
        F.lead(lon_col).over(w).alias("_nlon"),
    )
    st = F.lit(step).cast("long")
    # exact BIGINT ceil((t - t0)/step) via `div` — never a double divide
    # (epoch-micros deltas can exceed 2^53 on long-span data)
    k_start = F.expr(f"(_us - _t0 + {step - 1}) div {step}")
    k_end = F.expr(f"(_nus - _t0 + {step - 1}) div {step}")
    ks = F.when(
        F.col("_nus").isNotNull() & (k_end > k_start),
        F.sequence(k_start, k_end - F.lit(1)),
    ).when(
        # last ping: emit iff it sits exactly on the grid
        F.col("_nus").isNull() & ((F.col("_us") - F.col("_t0")) % st == 0),
        F.array(k_start),
    )
    expl = iv.select(
        user_col, "_lat", "_lon", "_us", "_t0", "_nus", "_nlat", "_nlon",
        F.explode(ks).alias("grid_idx"),
    )
    t = F.col("_t0") + F.col("grid_idx") * st
    frac = (t - F.col("_us")).cast("double") / (
        F.col("_nus") - F.col("_us")
    ).cast("double")
    lat_o = F.when(t == F.col("_us"), F.col("_lat")).otherwise(
        F.col("_lat") + (F.col("_nlat") - F.col("_lat")) * frac
    )
    lon_o = F.when(t == F.col("_us"), F.col("_lon")).otherwise(
        F.col("_lon") + (F.col("_nlon") - F.col("_lon")) * frac
    )
    return expl.select(
        user_col,
        "grid_idx",
        F.timestamp_add(
            "MICROSECOND", t, F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
        ).alias(ts_col),
        lat_o.alias(lat_col),
        lon_o.alias(lon_col),
    )


def od_flows(
    pings: DataFrame,
    gap_minutes: int = DEFAULT_GAP_MINUTES,
    scale: int = 16,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Origin-destination flow matrix — the transport / mobility-analytics
    rollup: sessionize each user's ping stream by time gap (> `gap_minutes`
    starts a new trip), take the trip's FIRST and LAST ping under the
    (ts, id) total order as origin and destination, assign each end to a
    1/`scale`-degree grid cell, and roll up per directed (origin cell,
    destination cell) pair: trip count, distinct travellers, and exact
    total trip duration. Single-ping trips appear as self-flows with zero
    duration (callers filter on `o_gx = d_gx AND o_gy = d_gy` to drop
    stationary mass).

    Scale shape: ONE hash Exchange on the user key serves the gap-lag
    window, the running-sum trip grouping, BOTH endpoint row_number
    windows ((user, trip) partitioning is a superset of the user hash —
    subset rule, no re-shuffle), and the per-trip conditional rollup; the
    second and final Exchange carries only the four cell longs + two
    narrow measures into the OD hash aggregation. Never a self-join,
    never a collect. Timestamps are exact naive-epoch integer
    microseconds (TIMESTAMP_NTZ math, DST-proof — CLAUDE.md); `scale`
    MUST be a power of two so lon*scale is an exact IEEE product and the
    floor cell assignment cannot straddle an engine rounding difference.

    Output: (o_gx, o_gy, d_gx, d_gy, n_trips, n_users,
    total_duration_us), one row per directed OD cell pair."""
    if scale & (scale - 1) != 0:
        raise ValueError(f"scale must be a power of two, got {scale}")
    gap_us = int(gap_minutes) * 60 * 1_000_000
    if gap_us <= 0:
        raise ValueError(f"gap_minutes must be positive, got {gap_minutes}")
    us = F.timestamp_diff(
        "MICROSECOND",
        F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
        F.col(ts_col).cast("timestamp_ntz"),
    )
    base = pings.select(user_col, id_col, lat_col, lon_col, us.alias("_us"))
    w = Window.partitionBy(user_col).orderBy(
        F.col("_us").asc(), F.col(id_col).asc()
    )
    flagged = base.select(
        user_col,
        id_col,
        lat_col,
        lon_col,
        "_us",
        (
            F.lag("_us").over(w).isNull()
            | ((F.col("_us") - F.lag("_us").over(w)) > gap_us)
        )
        .cast("long")
        .alias("_new"),
    )
    w2 = Window.partitionBy(user_col).orderBy(
        F.col("_us").asc(), F.col(id_col).asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grouped = flagged.select(
        user_col, id_col, lat_col, lon_col, "_us",
        F.sum("_new").over(w2).alias("_grp"),
    )
    wt = Window.partitionBy(user_col, "_grp")
    rn_a = F.row_number().over(
        wt.orderBy(F.col("_us").asc(), F.col(id_col).asc())
    )
    rn_d = F.row_number().over(
        wt.orderBy(F.col("_us").desc(), F.col(id_col).desc())
    )
    ends = grouped.select(
        user_col, lat_col, lon_col, "_us", "_grp",
        rn_a.alias("_rna"), rn_d.alias("_rnd"),
    )
    lat, lon = F.col(lat_col), F.col(lon_col)
    sc = F.lit(float(scale))
    trips = ends.groupBy(user_col, "_grp").agg(
        F.min(F.when(F.col("_rna") == 1, F.floor(lon * sc))).alias("o_gx"),
        F.min(F.when(F.col("_rna") == 1, F.floor(lat * sc))).alias("o_gy"),
        F.min(F.when(F.col("_rnd") == 1, F.floor(lon * sc))).alias("d_gx"),
        F.min(F.when(F.col("_rnd") == 1, F.floor(lat * sc))).alias("d_gy"),
        (F.max("_us") - F.min("_us")).alias("_dur"),
    )
    return trips.groupBy("o_gx", "o_gy", "d_gx", "d_gy").agg(
        F.count(F.lit(1)).alias("n_trips"),
        F.countDistinct(user_col).alias("n_users"),
        F.sum("_dur").alias("total_duration_us"),
    )


def track_kinematics(
    pings: DataFrame,
    vmax: float = 2.0 ** -12,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Per-ping trajectory kinematics — the GPS-noise / teleport filter
    every mobility pipeline runs before feature extraction: for each ping
    under the per-user (ts, id) total order, the time delta, squared
    planar jump, speed, signed acceleration, and an `is_impossible` flag
    (speed > `vmax` degrees/second — physically impossible for the
    tracked modality, i.e. GPS noise, tower jumps, or device clones).

    Exactness: dt is exact naive-epoch integer microseconds
    (TIMESTAMP_NTZ math, DST-proof); d2 = dlat*dlat + dlon*dlon in that
    op order; speed = sqrt(d2) / (dt/1e6) and accel =
    (speed - prev_speed) / (dt/1e6) — sqrt and divide are both correctly
    rounded IEEE ops, so any engine replaying the same order reproduces
    the bits. Duplicate-timestamp pings (dt = 0) yield NULL
    speed/accel/flag rather than an Inf/NaN whose bit pattern is
    engine-specific; the first ping of a user carries NULLs throughout.
    `vmax` MUST be an exactly-representable double (default 2^-12 ~
    27 m/s at the equator) so the threshold compare cannot straddle an
    engine rounding difference.

    Scale shape: ONE hash Exchange on the user key serves both window
    passes (the speed lag reuses the identical partitioning + sort);
    everything else is a codegen projection — no join, no Python worker,
    no second shuffle. Output is per-ping (same row count as the input).

    Output: (user_id, event_id, dt_us, d2, speed, accel,
    is_impossible)."""
    us = F.timestamp_diff(
        "MICROSECOND",
        F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
        F.col(ts_col).cast("timestamp_ntz"),
    )
    base = pings.select(user_col, id_col, lat_col, lon_col, us.alias("_us"))
    w = Window.partitionBy(user_col).orderBy(
        F.col("_us").asc(), F.col(id_col).asc()
    )
    lat, lon = F.col(lat_col), F.col(lon_col)
    dlat = lat - F.lag(lat).over(w)
    dlon = lon - F.lag(lon).over(w)
    dt = F.col("_us") - F.lag("_us").over(w)
    d2 = dlat * dlat + dlon * dlon
    staged = base.select(
        user_col,
        id_col,
        "_us",
        dt.alias("dt_us"),
        d2.alias("d2"),
        F.when(
            dt > 0,
            F.sqrt(d2) / (dt.cast("double") / F.lit(1000000.0)),
        ).alias("speed"),
    )
    prev_speed = F.lag("speed").over(w)
    accel = F.when(
        F.col("dt_us") > 0,
        (F.col("speed") - prev_speed)
        / (F.col("dt_us").cast("double") / F.lit(1000000.0)),
    )
    return staged.select(
        user_col,
        id_col,
        "dt_us",
        "d2",
        "speed",
        accel.alias("accel"),
        (F.col("speed") > F.lit(float(vmax))).alias("is_impossible"),
    )


def trip_shape(
    pings: DataFrame,
    gap_minutes: int = DEFAULT_GAP_MINUTES,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Per-trip path geometry — the straightness/detour feature layer over
    gap-sessionized trips: total path length (sum of consecutive planar
    jumps), net displacement (origin→destination distance), and
    tortuosity = path_len / displacement (1.0 = perfectly straight; NULL
    for zero-displacement trips). Commute-vs-wander classification,
    detour detection, and odometry QA all start here.

    Float-determinism contract: the path-length sum folds the per-jump
    distances in ASCENDING VALUE order (sort_array + F.aggregate seeded
    0.0 — identical to DuckDB list_sort + list_reduce, whose
    first-element seed equals the 0.0 seed since 0.0 + x == x), so the
    accumulation order is canonical on every engine and partitioning.
    Each jump is sqrt(dlat*dlat + dlon*dlon) in that op order; endpoint
    displacement uses the same form; sqrt and divide are correctly
    rounded, so all three outputs are bit-reproducible.

    Scale shape: ONE hash Exchange on the user key serves the gap lag,
    the running-sum trip grouping, both endpoint row_number windows
    (subset rule), and the per-trip rollup (collect_list of within-trip
    jump distances — bounded by pings-per-trip, the same per-group
    payload every trajectory operator here carries); no join, no second
    shuffle, no Python worker.

    Output: (user_id, trip_id = lowest event id in the trip, n_pings,
    path_len, displacement, tortuosity)."""
    gap_us = int(gap_minutes) * 60 * 1_000_000
    if gap_us <= 0:
        raise ValueError(f"gap_minutes must be positive, got {gap_minutes}")
    us = F.timestamp_diff(
        "MICROSECOND",
        F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
        F.col(ts_col).cast("timestamp_ntz"),
    )
    base = pings.select(user_col, id_col, lat_col, lon_col, us.alias("_us"))
    w = Window.partitionBy(user_col).orderBy(
        F.col("_us").asc(), F.col(id_col).asc()
    )
    lat, lon = F.col(lat_col), F.col(lon_col)
    dlat = lat - F.lag(lat).over(w)
    dlon = lon - F.lag(lon).over(w)
    d2 = dlat * dlat + dlon * dlon
    prev_us = F.lag("_us").over(w)
    flagged = base.select(
        user_col,
        id_col,
        lat_col,
        lon_col,
        "_us",
        d2.alias("_d2"),
        (prev_us.isNull() | ((F.col("_us") - prev_us) > gap_us))
        .cast("long")
        .alias("_new"),
    )
    w2 = Window.partitionBy(user_col).orderBy(
        F.col("_us").asc(), F.col(id_col).asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grouped = flagged.select(
        user_col, id_col, lat_col, lon_col, "_us", "_d2",
        "_new",
        F.sum("_new").over(w2).alias("_grp"),
    )
    wt = Window.partitionBy(user_col, "_grp")
    rn_a = F.row_number().over(
        wt.orderBy(F.col("_us").asc(), F.col(id_col).asc())
    )
    rn_d = F.row_number().over(
        wt.orderBy(F.col("_us").desc(), F.col(id_col).desc())
    )
    ends = grouped.select(
        user_col, id_col, lat_col, lon_col, "_d2", "_new", "_grp",
        "_us",
        rn_a.alias("_rna"), rn_d.alias("_rnd"),
    )
    # within-trip jumps only: the first ping of a trip carries the jump
    # ACROSS the gap (or the user head NULL) — excluded via _new = 0;
    # collect_list drops the NULLs the when() leaves behind
    jump = F.when(F.col("_new") == 0, F.sqrt(F.col("_d2")))
    trips = ends.groupBy(user_col, "_grp").agg(
        F.min(id_col).alias("trip_id"),
        F.count(F.lit(1)).alias("n_pings"),
        F.aggregate(
            F.sort_array(F.collect_list(jump)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("path_len"),
        F.min(F.when(F.col("_rna") == 1, lat)).alias("_olat"),
        F.min(F.when(F.col("_rna") == 1, lon)).alias("_olon"),
        F.min(F.when(F.col("_rnd") == 1, lat)).alias("_dlat"),
        F.min(F.when(F.col("_rnd") == 1, lon)).alias("_dlon"),
    )
    ddlat = F.col("_dlat") - F.col("_olat")
    ddlon = F.col("_dlon") - F.col("_olon")
    disp = F.sqrt(ddlat * ddlat + ddlon * ddlon)
    return trips.select(
        user_col,
        "trip_id",
        "n_pings",
        "path_len",
        disp.alias("displacement"),
        F.when(disp > 0, F.col("path_len") / disp).alias("tortuosity"),
    )


def top_destinations(flows: DataFrame, k: int = 3) -> DataFrame:
    """Top-k destination cells per origin cell over an `od_flows` matrix —
    the "where do people go from here" ranking behind flow maps and
    demand forecasting. Rank is a row_number under the deterministic
    total order (n_trips DESC, d_gx ASC, d_gy ASC): ties on trip count
    break by destination cell, and (d_gx, d_gy) is unique within an
    origin (it is the OD rollup's group key), so the ranking is total
    and reproducible on every engine and partitioning.

    Scale shape: ONE hash Exchange on (o_gx, o_gy) for the window (the
    OD matrix is already a cell-pair rollup — orders of magnitude
    smaller than the ping input), then a codegen filter. Output keeps
    all OD measure columns plus dest_rank."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    w = Window.partitionBy("o_gx", "o_gy").orderBy(
        F.col("n_trips").desc(), F.col("d_gx").asc(), F.col("d_gy").asc()
    )
    return flows.withColumn("dest_rank", F.row_number().over(w)).where(
        F.col("dest_rank") <= k
    )
