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
