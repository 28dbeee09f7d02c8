"""Scale-adaptive scan spreading.

Small scale factors ship single-row-group parquet files, so a scan yields
ONE input partition and every map-only ("zero-shuffle") operator downstream
runs on one core — file-split knobs cannot help because a parquet row group
is the unit of read parallelism. `spread_scan` round-robin-repartitions a
frame ONLY when it arrives with fewer partitions than the session's
parallelism; at production partition counts (any input larger than
cores x row-group-size) the branch is a no-op and the plan keeps its
zero-shuffle shape. This is the partitioning-derived-from-input-size rule:
the repartition is a function of the observed scan layout, not a constant
tuned for either local mode or a cluster.

Apply it where the downstream per-row work dominates the one-time shuffle
of the narrow input (point-geometry joins, raster renders, payload
decodes). Cheap projections over small corpora (e.g. per-doc regex over a
5k-document table) measure FASTER unspread — the shuffle costs more than
the single-core compute — so this is deliberately not wired into the
shared table loaders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_scan(df: DataFrame, parallelism: int | None = None) -> DataFrame:
    """Repartition `df` to the session's parallelism iff it currently has
    fewer partitions; otherwise return it unchanged (no Exchange added).

    Call this ONLY on shuffle-free frames (scan + projections): the
    partition probe is `df.rdd.getNumPartitions()`, and under AQE the
    `.rdd` access on a plan containing Exchanges executes every upstream
    query stage — a full extra run of the pipeline just to read a number.
    For checkpointed frames, probe the checkpointed RDD instead (see
    dedup.simhash_near_dup_pairs)."""
    if df.isStreaming:
        return df  # .rdd is illegal on a streaming frame; micro-batch
        # sources control their own partitioning
    n = parallelism or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n)
    return df
