"""Golden world-locations smoke set (FIXTURES.md §3; reference harness
scripts/compare_elevations.py:36-47): the 10 named coordinates run against
synthetic gradient tiles, expected values computed by the NumPy oracle —
semantic smoke that the Spark path agrees with the oracle everywhere on the
globe (both hemispheres, both signs of longitude)."""

import numpy as np
import pandas as pd

from htg_spark import fixtures, hgt
from htg_spark.engine import ElevationEngine

GOLDEN = [
    ("mount_fuji", 35.3606, 138.7274),
    ("death_valley", 36.2308, -116.7677),
    ("denver", 39.7392, -104.9903),
    ("tokyo", 35.6762, 139.6503),
    ("cape_town", -33.9249, 18.4241),
    ("amazon_basin", -3.1190, -60.0217),
    ("swiss_alps", 46.5197, 7.5597),
    ("la_paz", -16.5000, -68.1500),
    ("grand_canyon", 36.0544, -112.1401),
    ("lhasa", 29.6500, 91.1000),
]


def test_golden_points_against_oracle(spark):
    grid = fixtures.tile_gradient()
    keys = {(int(np.floor(lat)), int(np.floor(lon))) for _n, lat, lon in GOLDEN}
    grids = {k: grid for k in keys}
    eng = ElevationEngine(spark, grids=grids)

    pdf = pd.DataFrame(GOLDEN, columns=["image_id", "lat", "lon"])
    for mode in ("nearest", "floor", "bilinear"):
        out = (
            eng.elevation_join(spark.createDataFrame(pdf), mode=mode)
            .orderBy("image_id")
            .toPandas()
        )
        srt = pdf.sort_values("image_id").reset_index(drop=True)
        coords = list(zip(srt["lat"], srt["lon"]))
        expect = hgt.get_elevations_batch(coords, grids, default=np.nan, mode="bilinear") \
            if mode == "bilinear" else None
        got = out["elevation"].to_numpy(dtype="float64", na_value=np.nan)
        if mode == "bilinear":
            assert np.array_equal(expect, got)  # bitwise
        else:
            exp = hgt.get_elevations_batch(coords, grids, default=-1, mode=mode)
            assert np.array_equal(exp.astype(float), got)
        assert out["tile_found"].all() and out["in_coverage"].all()
        # api facade agrees point-by-point
        for name, lat, lon in GOLDEN:
            if mode == "nearest":
                assert eng.get_elevation(lat, lon) == int(
                    out.set_index("image_id").loc[name, "elevation"]
                )
