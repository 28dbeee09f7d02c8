"""Partitioned storage for the points/images table — the Iceberg-style
layout (BASELINE.json input_hint; no Iceberg runtime jar in the sandbox, so
this is hive-partitioned parquet with the same pruning behavior; swap
`.write.parquet` for `.writeTo(...).using("iceberg")` when the jar exists).

Layout: partitioned by the level-0 tile cell id (`p_cell`), so any bbox or
tile-range predicate prunes partitions at plan time — the S9/P3 scan story:
a query for one 1-degree cell reads exactly one directory out of N.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import cells


def write_points(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write with derived (lat, lon) -> p_cell partition column. Accepts a
    frame carrying lat/lon columns or a phash column."""
    work = df
    if "lat" not in work.columns:
        work = work.withColumn("lat", cells.lat_from_phash(F.col("phash"))).withColumn(
            "lon", cells.lon_from_phash(F.col("phash"))
        )
    work = work.withColumn(
        "p_cell", cells.cell_id(cells.tile_lat(F.col("lat")), cells.tile_lon(F.col("lon")))
    )
    work.write.mode(mode).partitionBy("p_cell").parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 32,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed + per-file-sorted table write: pays the shuffle ONCE at
    write time so every later equi-join or aggregation on `key` between
    tables bucketed with the SAME (key, n_buckets) is co-located —
    Catalyst elides the Exchange on BOTH sides (asserted by
    `test_points_store.test_bucketed_join_elides_exchange`). This is the
    100-TB pattern for dimension/fact tables joined repeatedly on one key:
    at 1000 executors the per-query shuffle of the large side disappears
    entirely. The Iceberg analogue is a `bucket(N, key)` partition
    transform; with no Iceberg jar in the sandbox this uses the Spark
    datasource bucketing that ships with parquet tables.

    `path` makes the table external (explicit location) so tests never
    write into the default warehouse under the repo root."""
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, key).sortBy(key)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back through the session catalog (the bucket
    spec lives in the catalog — a plain spark.read.parquet over the same
    files would NOT carry it and joins would re-shuffle)."""
    return spark.table(table)


def read_points(
    spark: SparkSession,
    path: str,
    bbox: tuple | None = None,
) -> DataFrame:
    """Read back; a bbox (min_lat, min_lon, max_lat, max_lon) becomes a
    p_cell range predicate that Spark prunes to matching partition dirs
    (strict-inequality tile overlap, service.rs:102-110)."""
    df = spark.read.parquet(path)
    if bbox is not None:
        min_lat, min_lon, max_lat, max_lon = bbox
        import math

        lo_lat, hi_lat = math.floor(min_lat), math.ceil(max_lat) - 1
        lo_lon, hi_lon = math.floor(min_lon), math.ceil(max_lon) - 1
        # p_cell = (tile_lat+90)*360 + (tile_lon+180): enumerate the covered
        # cells (bounded: bboxes span few degrees) -> IN-list prunes exactly
        cells_in = [
            (la + 90) * 360 + (lo + 180)
            for la in range(lo_lat, hi_lat + 1)
            for lo in range(lo_lon, hi_lon + 1)
        ]
        df = df.where(F.col("p_cell").isin(cells_in))
    return df


def write_zordered(
    df: DataFrame,
    path: str,
    n_files: int = 32,
    lat_col: str = "lat",
    lon_col: str = "lon",
    precision: int = 6,
    mode: str = "overwrite",
) -> None:
    """Z-order (Morton-curve) clustered layout: sort the table by the
    interleaved-bit spatial key before writing, so each output file covers
    a spatially COMPACT region and its parquet footer min/max statistics
    on BOTH lat and lon are tight. Any later bbox scan then skips most
    files/row-groups from the footers alone — the Iceberg/Delta
    `zorder by (lat, lon)` data-layout pattern, which at 100 TB is the
    difference between reading the whole table and reading the few
    gigabytes under the query box. (A single-column sort would make only
    THAT column's stats tight; interleaving makes both axes tight at once.)

    Plan: ONE range shuffle (repartitionByRange on the z-key — sampled
    range bounds give evenly-sized files regardless of spatial skew) +
    in-partition sort, both paid once at write time. The z-key is the
    geohash bit-interleave (cells.geohash_*) and is DROPPED from the
    stored schema — it is derivable, and layout metadata does not belong
    in the logical table."""
    zkey = cells.geohash_interleave(
        cells.geohash_lon_idx(F.col(lon_col), precision),
        cells.geohash_lat_idx(F.col(lat_col), precision),
        precision,
    )
    work = df.withColumn("_zkey", zkey)
    (
        work.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode(mode)
        .parquet(path)
    )


def bbox_file_audit(
    path: str,
    min_lat: float,
    min_lon: float,
    max_lat: float,
    max_lon: float,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> tuple[int, int]:
    """Footer-only pruning audit: (total_files, files_whose_stats_overlap).
    Reads ONLY parquet footers (no data pages) and applies the same
    min/max-vs-bbox overlap test a stats-pruning reader (Spark parquet
    filter pushdown, Iceberg manifest pruning) applies — the measurable
    proof that a layout actually localizes a spatial predicate."""
    import glob
    import os as _os

    import pyarrow.parquet as pq

    files = sorted(glob.glob(_os.path.join(path, "*.parquet")))
    hit = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        lo_la = lo_lo = float("inf")
        hi_la = hi_lo = float("-inf")
        for rg in range(md.num_row_groups):
            row = md.row_group(rg)
            for ci in range(row.num_columns):
                col = row.column(ci)
                name = col.path_in_schema
                st = col.statistics
                if st is None or not st.has_min_max:
                    continue
                if name == lat_col:
                    lo_la = min(lo_la, st.min)
                    hi_la = max(hi_la, st.max)
                elif name == lon_col:
                    lo_lo = min(lo_lo, st.min)
                    hi_lo = max(hi_lo, st.max)
        if lo_la > hi_la or lo_lo > hi_lo:
            # no min/max statistics for one of the axes: a real
            # stats-pruning reader must READ a file it cannot prove
            # disjoint, so the audit counts it as a hit (unprunable)
            # rather than overstating pruning effectiveness
            hit += 1
        elif lo_la <= max_lat and hi_la >= min_lat and lo_lo <= max_lon and hi_lo >= min_lon:
            hit += 1
    return len(files), hit
