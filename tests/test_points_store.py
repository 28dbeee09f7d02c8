"""Partition pruning on the cell-partitioned points store: a bbox query must
touch only the matching partition directories."""

import numpy as np
import pandas as pd

from htg_spark import fixtures
from htg_spark.engine import ElevationEngine
from htg_spark.points_store import read_points, write_points


def test_partition_pruning(spark, tmp_path):
    rng = np.random.default_rng(11)
    n = 3000
    lat = 35.0 + rng.random(n) * 4.0  # tiles 35..38
    lon = 138.0 + rng.random(n) * 4.0  # tiles 138..141
    pdf = pd.DataFrame(
        {"image_id": [f"p{i}" for i in range(n)], "lat": lat, "lon": lon}
    )
    path = str(tmp_path / "pts")
    write_points(spark.createDataFrame(pdf), path)

    full = read_points(spark, path)
    assert full.count() == n
    # distinct partition dirs = 16 cells
    assert len({f.split("p_cell=")[1].split("/")[0] for f in full.inputFiles()}) == 16

    one = read_points(spark, path, bbox=(35.2, 138.2, 35.8, 138.8))
    # pruning is applied at planning: the scan must carry a p_cell
    # PartitionFilter (inputFiles() reflects the pre-pushdown file index)
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        one.explain(True)
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "p_cell" in plan.split("PartitionFilters", 1)[1][:200]
    got = one.toPandas()
    expect = pdf[(pdf.lat >= 35) & (pdf.lat < 36) & (pdf.lon >= 138) & (pdf.lon < 139)]
    assert len(got) == len(expect)

    # pruned read feeds the join unchanged
    eng = ElevationEngine(spark, grids=fixtures.default_catalog_grids())
    out = eng.elevation_join(one, mode="nearest")
    assert out.count() == len(expect)


def test_write_from_phash(spark, tmp_path):
    imgs = fixtures.make_images_pdf(200)
    path = str(tmp_path / "imgs")
    write_points(spark.createDataFrame(imgs), path)
    back = read_points(spark, path)
    assert back.count() == 200
    assert "p_cell" in back.columns and "lat" in back.columns
