"""Continent router (S5, download.rs:553-581) and HTG_PRELOAD grammar
(P4, htg-service/src/main.rs:165-204) parity tests."""

import pandas as pd

from htg_spark.operators.geo_misc import (
    continent_col,
    coords_to_continent,
    parse_preload_bounds,
)

CASES = [
    (39.7392, -104.9903, "North_America"),  # Denver
    (-16.5, -68.15, "South_America"),  # La Paz
    (-33.87, 151.21, "Australia"),  # Sydney
    (-1.29, 36.82, "Africa"),  # Nairobi
    (35.68, 139.65, "Eurasia"),  # Tokyo
    (51.5, -0.13, "Eurasia"),  # London (lon >= -15 -> Eurasia)
    (10.0, -60.0, "South_America"),  # overlap resolved by priority order
    (0.0, -150.0, None),  # mid-Pacific
    (-75.0, 0.0, None),  # Antarctica
]


def test_coords_to_continent_python():
    for lat, lon, want in CASES:
        assert coords_to_continent(lat, lon) == want, (lat, lon)


def test_continent_column_matches_python(spark):
    pdf = pd.DataFrame([(i, c[0], c[1]) for i, c in enumerate(CASES)], columns=["i", "lat", "lon"])
    df = spark.createDataFrame(pdf)
    got = (
        df.select("i", continent_col(df.lat, df.lon).alias("c"))
        .orderBy("i")
        .toPandas()["c"]
        .tolist()
    )
    want = [c[2] for c in CASES]
    assert [g if pd.notna(g) else None for g in got] == want


def test_parse_preload_bounds():
    assert parse_preload_bounds("true") is None
    assert parse_preload_bounds("ALL") is None
    assert parse_preload_bounds(" 1 ") is None
    assert parse_preload_bounds("35,138,36,139") == [(35.0, 138.0, 36.0, 139.0)]
    assert parse_preload_bounds("35,138,36,139; -10,-20,0,0") == [
        (35.0, 138.0, 36.0, 139.0),
        (-10.0, -20.0, 0.0, 0.0),
    ]
    # malformed chunks dropped; fully-unparseable -> None (preload all)
    assert parse_preload_bounds("35,138,36,139;bogus") == [(35.0, 138.0, 36.0, 139.0)]
    assert parse_preload_bounds("bogus") is None


def test_knn_points_join_exact_and_zero_shuffle(spark):
    """Top-k nearest POIs: brute-force NumPy agreement on ranks and
    distances, deterministic poi_id tie-break for an equidistant point,
    and a zero-Exchange map-only plan."""
    import io
    import re
    from contextlib import redirect_stdout

    import numpy as np

    from htg_spark.operators.geo_misc import knn_points_join

    pois = [(0, 0.0, 0.0), (1, 0.0, 10.0), (2, 10.0, 0.0), (3, 10.0, 10.0)]
    # (5,5) ties ALL FOUR pois at d2=50 -> ranks must follow poi_id order
    pts_rows = [("a", 1.0, 2.0), ("b", 9.0, 9.5), ("tie", 5.0, 5.0)]
    pts = spark.createDataFrame(
        pd.DataFrame(pts_rows, columns=["image_id", "lat", "lon"])
    )
    out = (
        knn_points_join(pts, pois, k=3)
        .orderBy("image_id", "rank")
        .toPandas()
    )
    P = np.array([[plat, plon] for _, plat, plon in pois])
    for iid, lat, lon in pts_rows:
        d2 = (lat - P[:, 0]) ** 2 + (lon - P[:, 1]) ** 2
        order = np.lexsort((np.arange(len(pois)), d2))[:3]
        got = out[out.image_id == iid]
        assert got["poi_id"].tolist() == [pois[j][0] for j in order]
        assert got["d2"].tolist() == [float(d2[j]) for j in order]
        assert got["rank"].tolist() == [1, 2, 3]
    assert out[out.image_id == "tie"]["poi_id"].tolist() == [0, 1, 2]

    buf = io.StringIO()
    with redirect_stdout(buf):
        knn_points_join(pts, pois, k=3).explain("formatted")
    plan = buf.getvalue()
    assert len(re.findall(r"\(\d+\) Exchange\b", plan)) == 0
    assert "Join" not in plan
