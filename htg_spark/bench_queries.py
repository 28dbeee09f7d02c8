"""Benchmark workload — high-volume elevation joins over lineitem-derived
points against a 6x6-degree gradient tile catalog (36 real HGT blobs).

Shared by bench.py (per-round headline numbers) and scripts/run_scaling.py
(local[8] vs local[32] scaling-efficiency evidence per BASELINE.md).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import hgt
from .engine import ElevationEngine

GRID_DEG = 6  # catalog spans [35, 41) x [138, 144)


def bench_grids() -> dict:
    r = np.arange(1201, dtype=np.int64)
    base = ((r[:, None] + r[None, :]) % 4000).astype(np.int16)
    flat = r[:, None] * 1201 + r[None, :]
    g = base.copy()
    g[(flat % 97) == 0] = hgt.VOID_VALUE
    return {(35 + i, 138 + j): g for i in range(GRID_DEG) for j in range(GRID_DEG)}


def bench_engine(spark: SparkSession) -> ElevationEngine:
    return ElevationEngine(spark, grids=bench_grids(), cache_size=64)


def bench_points(
    spark: SparkSession, sf_dir: str, replicate: int = 8, partitions: int | None = None
) -> DataFrame:
    """lineitem-derived points, replicated `replicate`x for volume.

    ~30% of rows land in one 0.01-degree hot cluster (skew), ~9% on a
    missing tile band, ~3% out of coverage — the same semantic mix as the
    driver queries but at bench scale.
    """
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"
    )
    if replicate > 1:
        li = li.withColumn("rep", F.explode(F.lit(list(range(replicate)))))
    else:
        li = li.withColumn("rep", F.lit(0))
    k = (F.col("l_orderkey") * 13 + F.col("l_linenumber") * 7 + F.col("rep")).cast("long")
    m = (F.col("l_partkey") * 11 + F.col("l_suppkey") * 3 + F.col("rep")).cast("long")
    lat = (
        F.when(k % 37 == 0, F.lit(75.0) + (k % 1000).cast("double") / 1000.0)
        .when(k % 11 == 0, F.lit(50.0) + (k % 900).cast("double") / 1000.0)
        .when(k % 3 == 0, F.lit(36.42) + (k % 100).cast("double") / 10000.0)
        .otherwise(F.lit(35.0) + (k % 6000).cast("double") / 1000.0)
    )
    lon = (
        F.when(k % 37 == 0, F.lit(10.0) + (m % 1000).cast("double") / 1000.0)
        .when(k % 11 == 0, F.lit(50.0) + (m % 900).cast("double") / 1000.0)
        .when(k % 3 == 0, F.lit(139.77) + (m % 100).cast("double") / 10000.0)
        .otherwise(F.lit(138.0) + (m % 6000).cast("double") / 1000.0)
    )
    # unique row id (the synthetic lineitem has no unique natural key);
    # stable once the caller persists the frame
    out = li.select(
        F.monotonically_increasing_id().alias("point_id"), lat.alias("lat"), lon.alias("lon")
    )
    # the source is one small parquet file -> ONE input partition; without an
    # explicit repartition the whole join would run as a single task
    n_parts = partitions or spark.sparkContext.defaultParallelism * 2
    return out.repartition(n_parts)


def dedup_workload(spark: SparkSession, sf_dir: str, replicate: int = 8):
    """CPU-bound scaling workload: MinHash signatures over a replicated
    documents corpus — md5 over word-bigram shingles is ~1000 CPU cycles per
    byte, so this exercises core scaling independent of memory bandwidth
    (the complement of the bandwidth-heavy elevation join)."""
    from pyspark.sql import functions as F

    from .operators.dedup import minhash_signatures

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rep = docs.withColumn("r", F.explode(F.lit(list(range(replicate))))).select(
        (F.col("doc_id") * replicate + F.col("r")).alias("cid"), "text"
    )
    n_parts = spark.sparkContext.defaultParallelism * 2
    return rep.repartition(n_parts)


def run_dedup(spark, corpus):
    from pyspark.sql import functions as F

    from .operators.dedup import minhash_signatures

    sigs = minhash_signatures(corpus, id_col="cid")
    row = sigs.agg(F.count("*").alias("n"), F.min("mh0").alias("chk")).collect()[0]
    return row["n"], row["chk"]


def run_join(eng: ElevationEngine, pts: DataFrame, mode: str, strategy: str, **kw):
    """Execute the join and force full materialization; returns (rows, checksum)."""
    out = eng.elevation_join(pts, mode=mode, strategy=strategy, id_col="point_id", **kw)
    # checksum must be order-insensitive across partition groupings: quantize
    # to int64 before summing (a float64 sum depends on aggregation order)
    row = out.agg(
        F.count("*").alias("n"),
        F.sum((F.col("elevation").cast("double") * 1000).cast("long")).alias("chk"),
        F.sum(F.col("tile_found").cast("long")).alias("found"),
    ).collect()[0]
    return row["n"], row["chk"], row["found"]
