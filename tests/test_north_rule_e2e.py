"""North-rule end-to-end: the full pipeline in one flow.

Iceberg-style partitioned image+caption table (exact input_hint shape) ->
phash-derived geotags (JVM bit math) -> cell-partitioned storage with
pruning -> checkpointed broadcast elevation join with kNN fallback, killed
mid-run and resumed -> per-row invariants: elevations match the NumPy
oracle exactly, captions equal, decoded pixels identical (lossless -> PSNR
infinite >= 40 dB)."""

import numpy as np
import pandas as pd
import pytest

from htg_spark import fixtures, hgt
from htg_spark.checkpoint import CheckpointedJob
from htg_spark.engine import ElevationEngine
from htg_spark.points_store import read_points, write_points


def test_north_rule_pipeline(spark, tmp_path):
    # 1. the input table (exact input_hint shape), written cell-partitioned
    imgs = fixtures.make_images_pdf(1500, skew_frac=0.3)
    store = str(tmp_path / "images_store")
    write_points(spark.createDataFrame(imgs), store)

    # 2. read back (partition-pruned reads proven in test_points_store)
    table = read_points(spark, store)
    assert table.count() == 1500

    # 3. checkpointed elevation join, killed after 2 buckets, resumed
    grids = fixtures.default_catalog_grids()
    eng = ElevationEngine(spark, grids=grids)
    out_dir = str(tmp_path / "out")
    job = CheckpointedJob(out_dir, n_buckets=6, id_col="image_id")
    transform = lambda df: eng.elevation_join(
        df, mode="nearest", strategy="broadcast", knn_fallback=True
    )
    with pytest.raises(RuntimeError, match="injected failure"):
        job.run(table, transform, fail_after=2, wave_size=2)
    summary = job.run(table, transform)
    assert summary["skipped"] == 2 and summary["processed"] == 4

    result = job.read_output(spark).toPandas().sort_values("image_id").reset_index(drop=True)
    assert len(result) == 1500

    # 4. invariants vs the oracle, row for row
    src = imgs.sort_values("image_id").reset_index(drop=True)
    lat, lon = fixtures.phash_to_lat_lon(src["phash"].to_numpy())
    assert np.array_equal(result["lat"].to_numpy(), lat)  # bitwise geotags

    # elevations: oracle with the same kNN fallback semantics is exercised
    # elsewhere; here check the no-fallback rows exactly
    exp = hgt.get_elevations_batch(
        list(zip(lat, lon)), grids, default=-(10**9), mode="nearest"
    )
    got = result["elevation"].to_numpy(dtype="float64", na_value=np.nan)
    plain = ~result["knn_used"].to_numpy()
    exp_plain = np.where(exp == -(10**9), np.nan, exp.astype(float))[plain]
    got_plain = got[plain]
    assert np.array_equal(np.isnan(exp_plain), np.isnan(got_plain))
    m = ~np.isnan(exp_plain)
    assert np.array_equal(exp_plain[m], got_plain[m])
    # kNN rows: in coverage, resolved to a real catalog tile
    knn_rows = result[result["knn_used"]]
    assert len(knn_rows) > 0
    cat_keys = set(grids)
    assert all((r.tile_lat, r.tile_lon) in cat_keys for r in knn_rows.itertuples())

    # payload round-trip: captions equal, decoded pixels identical
    assert (result["caption"] == src["caption"]).all()
    rng = np.random.default_rng(0)
    for i in rng.choice(len(src), 50, replace=False):
        a = fixtures.decode_image(
            bytes(result["bytes"][i]), int(result["w"][i]), int(result["h"][i]), result["fmt"][i]
        )
        b = fixtures.decode_image(
            bytes(src["bytes"][i]), int(src["w"][i]), int(src["h"][i]), src["fmt"][i]
        )
        assert np.array_equal(a, b)  # PSNR = inf >= 40 dB

    # 5. lineage metrics cover every partition
    manifests = job.completed_buckets()
    assert len(manifests) == 6
    assert sum(m["rows"] for m in manifests.values()) == 1500
