"""Streaming elevation enrichment: file-source stream -> broadcast join ->
memory sink must equal the batch result row-for-row."""

import numpy as np
import pandas as pd
import pytest

from htg_spark import fixtures
from htg_spark.engine import ElevationEngine
from htg_spark.streaming import stream_elevation_join


def test_stream_matches_batch(spark, tmp_path):
    eng = ElevationEngine(spark, grids=fixtures.default_catalog_grids())
    rng = np.random.default_rng(3)
    n = 400
    pdf = pd.DataFrame(
        {
            "image_id": [f"s{i:04d}" for i in range(n)],
            "lat": 35.0 + rng.random(n) * 2,
            "lon": 138.0 + rng.random(n) * 2,
        }
    )
    src = str(tmp_path / "src")
    spark.createDataFrame(pdf).write.parquet(src)

    batch_out = (
        eng.elevation_join(spark.read.parquet(src), mode="nearest")
        .orderBy("image_id")
        .toPandas()
    )

    stream = spark.readStream.schema("image_id string, lat double, lon double").parquet(src)
    enriched = stream_elevation_join(eng, stream, mode="nearest")
    q = (
        enriched.writeStream.format("memory")
        .queryName("elev_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream_out = spark.sql("SELECT * FROM elev_stream").orderBy("image_id").toPandas()

    assert len(stream_out) == n
    pd.testing.assert_frame_equal(
        batch_out[sorted(batch_out.columns)].reset_index(drop=True),
        stream_out[sorted(stream_out.columns)].reset_index(drop=True),
    )


def test_stream_rejects_batch_df(spark):
    eng = ElevationEngine(spark, grids={(35, 138): fixtures.tile_center(1)})
    with pytest.raises(ValueError, match="streaming"):
        stream_elevation_join(eng, spark.range(3))


def test_stream_exact_dedup_across_batches(spark, tmp_path):
    """Cross-micro-batch dedup state: a duplicate arriving in a LATER batch
    must be dropped (maxFilesPerTrigger=1 -> one file = one batch)."""
    import datetime as dt

    from htg_spark.streaming import stream_exact_dedup

    src = tmp_path / "docs"
    src.mkdir()
    ts = dt.datetime(2026, 1, 1)
    batch1 = pd.DataFrame(
        {"doc_id": [1, 2, 3], "text": ["alpha", "beta", "alpha"], "ts": [ts] * 3}
    )
    batch2 = pd.DataFrame(
        {"doc_id": [4, 5], "text": ["alpha", "gamma"], "ts": [ts] * 2}
    )
    spark.createDataFrame(batch1).coalesce(1).write.parquet(str(src / "b1"))
    spark.createDataFrame(batch2).coalesce(1).write.parquet(str(src / "b2"))

    stream = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    q = (
        stream_exact_dedup(stream)
        .writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT doc_id, text FROM dedup_stream").toPandas()
    # one row per distinct content; duplicates within AND across batches drop
    assert sorted(out["text"]) == ["alpha", "beta", "gamma"]
    assert set(out[out.text == "alpha"]["doc_id"]) <= {1, 4} and len(out) == 3


def test_stream_tile_running_stats(spark, tmp_path):
    """applyInPandasWithState: running per-tile stats must accumulate across
    micro-batches (batch 2's update reflects batch 1's state)."""
    from htg_spark.streaming import stream_tile_running_stats

    eng = ElevationEngine(spark, grids=fixtures.default_catalog_grids())
    src = tmp_path / "pts"
    src.mkdir()
    b1 = pd.DataFrame({"image_id": ["a1", "a2"], "lat": [35.5, 35.5], "lon": [138.5, 138.6]})
    b2 = pd.DataFrame({"image_id": ["a3"], "lat": [35.5], "lon": [138.5]})
    spark.createDataFrame(b1).coalesce(1).write.parquet(str(src / "b1"))
    spark.createDataFrame(b2).coalesce(1).write.parquet(str(src / "b2"))

    stream = (
        spark.readStream.schema("image_id string, lat double, lon double")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    enriched = stream_elevation_join(eng, stream, mode="nearest")
    q = (
        stream_tile_running_stats(enriched)
        .writeStream.format("memory")
        .queryName("tile_stats_stream")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql(
        "SELECT * FROM tile_stats_stream WHERE tile_lat = 35 AND tile_lon = 138"
    ).toPandas()
    # update mode emits one row per batch that touched the key; the LAST
    # (max rows) reflects the accumulated state: 3 rows total
    assert int(out["rows"].max()) == 3
    assert int(out["rows"].min()) == 2  # first batch alone
