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


def test_stream_geofence_matches_batch(spark, tmp_path):
    """File-source stream -> stream-static PIP broadcast join -> memory sink
    equals the batch PIP result pair-for-pair; windowed per-polygon counts
    equal the batch rollup."""
    import datetime as dt

    from pyspark.sql import functions as F

    from htg_spark.operators.polygon import point_in_polygon_join
    from htg_spark.streaming import geofence_window_counts, stream_geofence

    # two star polygons and a point grid straddling them
    ring = [
        {"x": 1.0, "y": 0.0}, {"x": 0.25, "y": 0.25}, {"x": 0.0, "y": 1.0},
        {"x": -0.25, "y": 0.25}, {"x": -1.0, "y": 0.0}, {"x": -0.25, "y": -0.25},
        {"x": 0.0, "y": -1.0}, {"x": 0.25, "y": -0.25},
    ]
    polys = spark.createDataFrame(
        [
            (0, [{"x": p["x"] + 10.0, "y": p["y"] + 40.0} for p in ring]),
            (1, [{"x": p["x"] + 11.0, "y": p["y"] + 40.5} for p in ring]),
        ],
        "poly_id long, ring array<struct<x double, y double>>",
    )
    base = dt.datetime(2026, 1, 1)
    rows = []
    k = 0
    for i in range(-6, 13):
        for j in range(-6, 7):
            rows.append(
                (k, 10.0 + i * 0.17, 40.0 + j * 0.17, base + dt.timedelta(seconds=30 * k))
            )
            k += 1
    pdf = pd.DataFrame(rows, columns=["pt_id", "lon", "lat", "ts"])
    src = tmp_path / "geo"
    src.mkdir()
    half = len(pdf) // 2
    spark.createDataFrame(pdf.iloc[:half]).coalesce(1).write.parquet(str(src / "b1"))
    spark.createDataFrame(pdf.iloc[half:]).coalesce(1).write.parquet(str(src / "b2"))

    batch_pts = spark.read.parquet(f"{src}/*")
    batch_hits = point_in_polygon_join(
        batch_pts, polys, x_col="lon", y_col="lat", strategy="broadcast"
    )
    expected_pairs = sorted(
        (r["pt_id"], r["poly_id"]) for r in batch_hits.collect()
    )
    assert len(expected_pairs) > 10

    stream = (
        spark.readStream.schema("pt_id long, lon double, lat double, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    hits = stream_geofence(stream, polys)
    q = (
        hits.writeStream.format("memory").queryName("geofence_hits")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got_pairs = sorted(
        (r["pt_id"], r["poly_id"])
        for r in spark.sql("SELECT pt_id, poly_id FROM geofence_hits").collect()
    )
    assert got_pairs == expected_pairs

    counts = geofence_window_counts(
        stream_geofence(stream, polys), window="10 minutes"
    )
    qc = (
        counts.writeStream.format("memory").queryName("geofence_counts")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    qc.awaitTermination(120)
    got_counts = {
        (r["window"]["start"], r["poly_id"]): r["hits"]
        for r in spark.sql("SELECT * FROM geofence_counts").collect()
    }
    exp_counts = {
        (r["ws"], r["poly_id"]): r["hits"]
        for r in batch_hits.groupBy(
            F.window("ts", "10 minutes").alias("w"), "poly_id"
        )
        .agg(F.count(F.lit(1)).alias("hits"))
        .select(F.col("w")["start"].alias("ws"), "poly_id", "hits")
        .collect()
    }
    assert got_counts == exp_counts


def test_stream_geofence_rejects_batch_df(spark):
    from htg_spark.streaming import stream_geofence

    polys = spark.createDataFrame(
        [(0, [{"x": 0.0, "y": 0.0}, {"x": 1.0, "y": 0.0}, {"x": 0.0, "y": 1.0}])],
        "poly_id long, ring array<struct<x double, y double>>",
    )
    with pytest.raises(ValueError, match="streaming"):
        stream_geofence(spark.range(3), polys)


def test_stream_cell_heatmap_matches_batch(spark, tmp_path):
    """2-micro-batch file stream through the windowed multi-level cell
    rollup equals the batch explode+groupBy on the same rows; a batch
    frame is rejected."""
    import datetime as dt

    from pyspark.sql import functions as F

    from htg_spark import cells
    from htg_spark.streaming import stream_cell_heatmap

    base = dt.datetime(2026, 1, 1)
    rows = []
    for k in range(120):
        rows.append(
            (k, -1.7 + (k % 11) * 0.31, 9.4 + (k % 7) * 0.47,
             base + dt.timedelta(seconds=10 * k))
        )
    pdf = pd.DataFrame(rows, columns=["pt_id", "lat", "lon", "ts"])
    src = tmp_path / "heat"
    src.mkdir()
    spark.createDataFrame(pdf.iloc[:60]).coalesce(1).write.parquet(str(src / "b1"))
    spark.createDataFrame(pdf.iloc[60:]).coalesce(1).write.parquet(str(src / "b2"))

    stream = (
        spark.readStream.schema("pt_id long, lat double, lon double, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    q = (
        stream_cell_heatmap(stream, window="5 minutes")
        .writeStream.format("memory").queryName("heatmap")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        (r["window"]["start"], r["level"], r["cell"]): r["n_points"]
        for r in spark.sql("SELECT * FROM heatmap").collect()
    }

    batch = spark.read.parquet(f"{src}/*")
    lc = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(lvl).cast("int").alias("level"),
                    cells.cell_id_at_level(F.col("lat"), F.col("lon"), lvl).alias("cell"),
                )
                for lvl in (0, 2, 4)
            ]
        )
    ).alias("lc")
    exp = {
        (r["ws"], r["level"], r["cell"]): r["n_points"]
        for r in batch.select("ts", lc)
        .groupBy(
            F.window("ts", "5 minutes").alias("w"),
            F.col("lc.level").alias("level"),
            F.col("lc.cell").alias("cell"),
        )
        .agg(F.count(F.lit(1)).alias("n_points"))
        .select(F.col("w")["start"].alias("ws"), "level", "cell", "n_points")
        .collect()
    }
    assert len(exp) > 20
    assert got == exp

    with pytest.raises(ValueError, match="streaming"):
        stream_cell_heatmap(spark.range(3))


def test_stream_terrain_join_matches_batch(spark, tmp_path):
    """File-source stream -> stateless broadcast terrain join -> memory sink
    equals the batch terrain_join row-for-row (stencil sums AND derived
    products); rejects batch frames."""
    from pyspark.sql import functions as F

    from htg_spark.driver_queries import derive_points, get_engine
    from htg_spark.operators import terrain
    from htg_spark.streaming import stream_terrain_join

    eng = get_engine(spark)
    pts = derive_points(
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ).toPandas()
    src = tmp_path / "terr"
    src.mkdir()
    half = len(pts) // 2
    spark.createDataFrame(pts.iloc[:half]).coalesce(1).write.parquet(str(src / "b1"))
    spark.createDataFrame(pts.iloc[half:]).coalesce(1).write.parquet(str(src / "b2"))

    batch_pts = spark.read.parquet(f"{src}/*")
    with pytest.raises(ValueError, match="streaming"):
        stream_terrain_join(eng, batch_pts)

    cols = ["event_id", "tile_lat", "tile_lon", "terrain_ok", "gxs", "gys"]

    def project(df):
        d = terrain.terrain_cols(F.col("gxs"), F.col("gys"))
        return df.select(*cols, d["slope"].alias("slope"),
                         d["aspect_octant"].alias("aspect_octant"))

    expected = sorted(
        map(tuple, project(terrain.terrain_join(eng, batch_pts)).collect())
    )

    stream = (
        spark.readStream.schema("event_id long, lat double, lon double")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    q = (
        project(stream_terrain_join(eng, stream))
        .writeStream.format("memory").queryName("terrain_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = sorted(
        map(tuple, spark.sql("SELECT * FROM terrain_stream").collect())
    )
    assert got == expected
    assert len(got) == len(pts)


def test_incremental_dedup_sink_admits_novels(spark, tmp_path):
    """Continuous-ingestion loop: batch 1's novel doc is ADMITTED into the
    on-storage corpus, so batch 2's copy of it is flagged as its duplicate;
    corpus dups flag against the seed corpus; verdicts carry batch ids."""
    from htg_spark.streaming import incremental_dedup_sink

    corpus_dir = str(tmp_path / "corpus")
    verdicts_dir = str(tmp_path / "verdicts")
    src = tmp_path / "docs"
    src.mkdir()
    seed = pd.DataFrame(
        {"doc_id": [1, 2], "text": ["alpha bravo charlie delta", "echo foxtrot golf hotel"]}
    )
    spark.createDataFrame(seed).write.parquet(corpus_dir)

    b1 = pd.DataFrame(
        {
            "doc_id": [10, 11],
            "text": ["alpha bravo charlie delta", "india juliet kilo lima"],  # dup, novel
        }
    )
    b2 = pd.DataFrame(
        {
            "doc_id": [20, 21],
            "text": ["india juliet kilo lima", "mike november oscar papa"],  # dup-of-11, novel
        }
    )
    spark.createDataFrame(b1).coalesce(1).write.parquet(str(src / "b1"))
    import time as _time

    _time.sleep(1.1)  # file-source orders batches by modification time
    spark.createDataFrame(b2).coalesce(1).write.parquet(str(src / "b2"))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    q = (
        stream.writeStream.foreachBatch(
            incremental_dedup_sink(corpus_dir, verdicts_dir)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    v = spark.read.parquet(verdicts_dir).toPandas().set_index("doc_id")
    assert len(v) == 4
    assert v.loc[10, "exact_dup_of"] == 1 and not v.loc[10, "is_novel"]
    assert bool(v.loc[11, "is_novel"])
    # batch 2's copy resolves to batch 1's ADMITTED novel, not to a seed doc
    assert v.loc[20, "exact_dup_of"] == 11 and not v.loc[20, "is_novel"]
    assert bool(v.loc[21, "is_novel"])
    assert v.loc[20, "batch_id"] > v.loc[11, "batch_id"]
    # the corpus grew by exactly the two admitted novels
    corpus = spark.read.parquet(corpus_dir).toPandas()
    assert sorted(corpus["doc_id"]) == [1, 2, 11, 21]


def test_incremental_dedup_sink_intra_batch_dedup_and_bootstrap(spark, tmp_path):
    """Two copies of the same NOVEL doc (and a near-copy) arriving in ONE
    micro-batch: both keep is_novel verdicts (novel vs the corpus as of the
    batch), but only the canonical representative per exact/near group is
    ADMITTED — otherwise the on-storage corpus permanently violates the
    'already deduped' invariant incremental_dedup assumes. Also: the sink
    bootstraps from an ABSENT corpus directory (first deployment batch)."""
    from htg_spark.streaming import incremental_dedup_sink

    corpus_dir = str(tmp_path / "corpus")  # deliberately not created
    verdicts_dir = str(tmp_path / "verdicts")
    src = tmp_path / "docs"
    src.mkdir()
    b1 = pd.DataFrame(
        {
            "doc_id": [30, 31, 32, 33],
            "text": [
                "alpha bravo charlie delta",
                "alpha bravo charlie delta",        # exact copy of 30
                "alpha bravo charlie delta zz qq",  # near copy of 30
                "echo foxtrot golf hotel",          # independent novel
            ],
        }
    )
    spark.createDataFrame(b1).coalesce(1).write.parquet(str(src / "b1"))
    q = (
        spark.readStream.schema("doc_id long, text string")
        .parquet(f"{src}/*")
        .writeStream.foreachBatch(incremental_dedup_sink(corpus_dir, verdicts_dir))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    v = spark.read.parquet(verdicts_dir).toPandas().set_index("doc_id")
    # empty-corpus bootstrap: every batch doc is novel vs the (absent) corpus
    assert len(v) == 4 and bool(v["is_novel"].all())
    # but only the canonical per exact/near group is admitted
    corpus = spark.read.parquet(corpus_dir).toPandas()
    assert sorted(corpus["doc_id"]) == [30, 33]

    # a later batch's copies now flag against the admitted canonicals
    import time as _time

    _time.sleep(1.1)
    b2 = pd.DataFrame({"doc_id": [40], "text": ["alpha bravo charlie delta"]})
    spark.createDataFrame(b2).coalesce(1).write.parquet(str(src / "b2"))
    q = (
        spark.readStream.schema("doc_id long, text string")
        .parquet(f"{src}/*")
        .writeStream.foreachBatch(incremental_dedup_sink(corpus_dir, verdicts_dir))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    v2 = spark.read.parquet(verdicts_dir).toPandas().set_index("doc_id")
    assert v2.loc[40, "exact_dup_of"] == 30 and not bool(v2.loc[40, "is_novel"])
