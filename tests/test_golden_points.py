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


# --- mercator warp -------------------------------------------------------------


def test_warp_pixel_grid_reference(spark):
    """The warp sample grid's tile decomposition and inverse-mercator
    centers must match a pure-Python recompute; the grid covers every
    (zx, zy) exactly tile_px^2 times."""
    import math

    from htg_spark import driver_queries as dq

    zx_lo, zx_hi, zy_lo, zy_hi = dq._warp_tile_ranges()
    tp = dq.WARP_TILE_PX
    n = 1 << dq.WARP_ZOOM
    grid = dq.warp_pixel_grid(spark)
    rows = grid.collect()
    ncols, nrows = zx_hi - zx_lo + 1, zy_hi - zy_lo + 1
    assert len(rows) == ncols * nrows * tp * tp
    from collections import Counter

    per_tile = Counter((r["zx"], r["zy"]) for r in rows)
    assert set(per_tile) == {
        (x, y) for x in range(zx_lo, zx_hi + 1) for y in range(zy_lo, zy_hi + 1)
    }
    assert set(per_tile.values()) == {tp * tp}
    # spot-check pixel centers bit-for-bit against the documented formula
    by_id = {r["pixel_id"]: r for r in rows}
    for pid in (0, 1, tp, tp * tp, 1234, len(rows) - 1):
        r = by_id[pid]
        tile_idx, within = divmod(pid, tp * tp)
        i, j = within % tp, within // tp
        zx = zx_lo + tile_idx % ncols
        zy = zy_lo + tile_idx // ncols
        assert (r["zx"], r["zy"]) == (zx, zy)
        lon = ((float(zx) + (float(i) + 0.5) / float(tp)) / float(n)) * 360.0 - 180.0
        my = (float(zy) + (float(j) + 0.5) / float(tp)) / float(n)
        aa = 3.141592653589793 * (1.0 - 2.0 * my)
        lat = math.atan((math.exp(aa) - math.exp(0.0 - aa)) / 2.0) * 57.29577951308232
        assert r["lon"] == lon and r["lat"] == lat, pid
    # the grid brackets the catalog: some pixels inside, some outside
    lats = [r["lat"] for r in rows]
    assert min(lats) < 35.0 < 37.0 < max(lats)


def test_mercator_warp_rollup_shape(spark):
    from htg_spark import driver_queries as dq

    out = dq.q_mercator_warp(spark, "/root/testdata/sf0.001").collect()
    zx_lo, zx_hi, zy_lo, zy_hi = dq._warp_tile_ranges()
    assert len(out) == (zx_hi - zx_lo + 1) * (zy_hi - zy_lo + 1)
    assert all(r["n_px"] == dq.WARP_TILE_PX ** 2 for r in out)
    # mosaic edge: some tiles fully invalid; interior tiles nearly full
    # (the gradient fixture plants ~1/97 void cells, so never exactly full)
    n_valid = sorted(r["n_valid"] for r in out)
    assert n_valid[0] == 0 and n_valid[-1] >= dq.WARP_TILE_PX ** 2 * 96 // 98
    for r in out:
        if r["n_valid"] == 0:
            assert r["sum_elev"] is None and r["min_elev"] is None
        else:
            assert 0 <= r["min_elev"] <= r["max_elev"] < 4000
