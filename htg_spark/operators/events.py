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
