"""CSV (S6) and GeoJSON (S7) enrichment pipelines — sink fill semantics
ported from the reference CLI tests (FIXTURES.md §4-5)."""

import json

import pandas as pd
import pytest

from htg_spark import fixtures
from htg_spark.csv_pipeline import enrich_csv_df, enrich_csv_file
from htg_spark.engine import ElevationEngine
from htg_spark.geojson_pipeline import enrich_geojson, enrich_geojson_file

MID_LAT = 35 + (1.0 - 600.5 / 1200.0)  # row_pos 600.5 on a (35, x) tile
MID_LON_INTERP = 139 + 600.5 / 1200.0  # col_pos 600.5 on the T-interp tile


@pytest.fixture(scope="module")
def engine(spark):
    return ElevationEngine(spark, grids=fixtures.default_catalog_grids())


def test_csv_enrich_semantics(spark, engine):
    pdf = pd.DataFrame(
        {
            "id": ["a", "b", "c", "d"],
            "lat": ["35.5", "50.0", "70.0", "33.3448"],
            "lon": ["138.5", "50.0", "0.0", "-96.1592"],
        }
    )
    df = spark.createDataFrame(pdf)
    out = enrich_csv_df(engine, df).orderBy("id").toPandas()
    # nearest: 500; missing tile -> "void"; out-of-coverage -> "void"; 190
    assert list(out["elevation"]) == ["500", "void", "void", "190"]
    assert list(out.columns) == ["id", "lat", "lon", "elevation"]

    out_i = enrich_csv_df(engine, df, interpolate=True).orderBy("id").toPandas()
    assert out_i.loc[0, "elevation"] == "500.00"  # {:.2} formatting (batch.rs:118)
    assert out_i.loc[1, "elevation"] == "void"


def test_csv_alternate_columns(spark, engine):
    pdf = pd.DataFrame(
        {"id": ["x"], "latitude": ["35.5"], "longitude": ["138.5"], "lat": ["junk"]}
    )
    df = spark.createDataFrame(pdf)
    out = enrich_csv_df(engine, df, lat_col="latitude", lon_col="longitude").toPandas()
    assert out.loc[0, "elevation"] == "500"
    assert out.loc[0, "lat"] == "junk"  # unrelated original column untouched


def test_csv_file_roundtrip(spark, engine, tmp_path):
    src = tmp_path / "pts.csv"
    pd.DataFrame({"id": [1, 2], "lat": [35.5, 50.0], "lon": [138.5, 50.0]}).to_csv(
        src, index=False
    )
    out_dir = enrich_csv_file(engine, spark, str(src))
    assert out_dir.endswith("pts_elevation.csv")
    back = spark.read.option("header", True).csv(out_dir).orderBy("id").toPandas()
    assert list(back["elevation"]) == ["500", "void"]


GEOMS = {
    "Point": {"type": "Point", "coordinates": [138.5, 35.5]},
    "MultiPoint": {"type": "MultiPoint", "coordinates": [[138.5, 35.5], [50.0, 50.0]]},
    "LineString": {
        "type": "LineString",
        "coordinates": [[138.5, 35.5], [138.5, 36.5], [138.1, 35.1]],
    },
    "MultiLineString": {
        "type": "MultiLineString",
        "coordinates": [[[138.5, 35.5], [138.6, 35.6]], [[50.0, 50.0], [50.1, 50.1]]],
    },
    "Polygon": {
        "type": "Polygon",
        "coordinates": [
            [[138.5, 35.5], [138.6, 35.5], [138.6, 35.6], [138.5, 35.5]]
        ],
    },
    "MultiPolygon": {
        "type": "MultiPolygon",
        "coordinates": [
            [[[138.5, 35.5], [138.6, 35.5], [138.5, 35.5]]],
            [[[50.0, 50.0], [50.1, 50.0], [50.0, 50.0]]],
        ],
    },
    "GeometryCollection": {
        "type": "GeometryCollection",
        "geometries": [
            {"type": "Point", "coordinates": [138.5, 35.5]},
            {"type": "LineString", "coordinates": [[50.0, 50.0], [138.5, 36.5]]},
        ],
    },
}


@pytest.mark.parametrize("gtype", sorted(GEOMS))
def test_geojson_all_geometry_types(spark, engine, gtype):
    out = enrich_geojson(engine, spark, GEOMS[gtype])
    assert out["type"] == gtype
    # every position now has a Z
    from htg_spark.geojson_pipeline import _walk_positions

    zs = [pos[2] for pos in _walk_positions(out)]
    assert all(isinstance(z, int) for z in zs)
    if gtype == "Point":
        assert zs == [500]
    if gtype == "MultiPoint":
        assert zs == [500, 0]  # missing tile -> 0 (geojson.rs:166)


def test_geojson_existing_z_overwritten(spark, engine):
    doc = {"type": "Point", "coordinates": [138.5, 35.5, 9999.0]}
    out = enrich_geojson(engine, spark, doc)
    assert out["coordinates"] == [138.5, 35.5, 500]  # batch.rs:225-229


def test_geojson_feature_collection_file(spark, engine, tmp_path):
    doc = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "properties": {"name": "fuji-ish"},
                "geometry": {"type": "Point", "coordinates": [138.5, 35.5]},
            },
            {
                "type": "Feature",
                "properties": None,
                "geometry": {"type": "Point", "coordinates": [50.0, 50.0]},
            },
        ],
    }
    src = tmp_path / "in.geojson"
    src.write_text(json.dumps(doc))
    out_path = enrich_geojson_file(engine, spark, str(src), interpolate=True)
    assert out_path.endswith("in_elevation.geojson")
    out = json.loads(open(out_path).read())
    assert out["type"] == "FeatureCollection"
    f0, f1 = out["features"]
    assert f0["properties"] == {"name": "fuji-ish"}
    assert f0["geometry"]["coordinates"][2] == 500.0
    assert f1["geometry"]["coordinates"][2] == 0.0  # default fill


def test_batch_dispatch(spark, engine, tmp_path):
    import pandas as pd
    import pytest as _pt

    from htg_spark.batch_dispatch import batch_enrich_file

    src = tmp_path / "d.csv"
    pd.DataFrame({"id": [1], "lat": [35.5], "lon": [138.5]}).to_csv(src, index=False)
    out = batch_enrich_file(engine, spark, str(src))
    assert out.endswith("d_elevation.csv")
    with _pt.raises(ValueError, match="unsupported file extension"):
        batch_enrich_file(engine, spark, str(tmp_path / "x.txt"))
