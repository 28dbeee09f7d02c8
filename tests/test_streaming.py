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
