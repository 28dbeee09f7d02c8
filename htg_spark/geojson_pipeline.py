"""GeoJSON enrichment pipeline — the `htg batch input.geojson` analog (S7).

Reference semantics (htg/src/geojson.rs:75-195; htg-cli batch.rs:143-300):
- input: Geometry / Feature / FeatureCollection
- every position of every geometry gains a Z coordinate: [lon, lat] ->
  [lon, lat, z]; an existing Z is OVERWRITTEN (batch.rs:225-229)
- missing data / void / out-of-coverage -> z = 0 / 0.0 (geojson.rs:166,
  batch.rs:221-223)
- coordinates are GeoJSON order: [lon, lat(, z)] (geojson.rs:156-169)
- geometry types: Point, MultiPoint, LineString, MultiLineString, Polygon,
  MultiPolygon, GeometryCollection (recursive) (geojson.rs:75-125)

Distributed design: one feature = one row carrying its geometry as a JSON
string; positions are exploded to point rows in an Arrow UDF (depth-first
order index), joined through the engine, then re-nested per feature by
walking the same depth-first order. Both walks share `_walk_positions`, so
explode/rebuild can never disagree on ordering.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .engine import ElevationEngine

GEOM_TYPES = {
    "Point",
    "MultiPoint",
    "LineString",
    "MultiLineString",
    "Polygon",
    "MultiPolygon",
    "GeometryCollection",
}


def _walk_positions(geom: dict):
    """Yield position lists ([lon, lat] or [lon, lat, z]) of a geometry in
    depth-first document order — the same recursion as geojson.rs:131-154."""
    t = geom.get("type")
    if t == "Point":
        yield geom["coordinates"]
    elif t in ("MultiPoint", "LineString"):
        yield from geom["coordinates"]
    elif t in ("MultiLineString", "Polygon"):
        for ring in geom["coordinates"]:
            yield from ring
    elif t == "MultiPolygon":
        for poly in geom["coordinates"]:
            for ring in poly:
                yield from ring
    elif t == "GeometryCollection":
        for g in geom.get("geometries", []):
            yield from _walk_positions(g)
    else:
        raise ValueError(f"unsupported geometry type: {t!r}")


def _set_z(geom: dict, zs: list) -> dict:
    """Return a copy of geom with the i-th DFS position's Z set to zs[i]
    (existing Z overwritten — batch.rs:225-229)."""
    out = json.loads(json.dumps(geom))
    for i, pos in enumerate(_walk_positions(out)):
        del pos[2:]
        pos.append(zs[i])
    return out


def features_to_df(spark: SparkSession, doc: dict) -> DataFrame:
    """Normalize Geometry / Feature / FeatureCollection into one row per
    feature: (feature_id, properties_json, geometry_json)."""
    t = doc.get("type")
    if t == "FeatureCollection":
        feats = doc["features"]
    elif t == "Feature":
        feats = [doc]
    elif t in GEOM_TYPES:
        feats = [{"type": "Feature", "properties": None, "geometry": doc}]
    else:
        raise ValueError(f"unsupported GeoJSON root type: {t!r}")
    rows = [
        (i, json.dumps(f.get("properties")), json.dumps(f["geometry"]))
        for i, f in enumerate(feats)
    ]
    return spark.createDataFrame(
        rows, "feature_id long, properties_json string, geometry_json string"
    )


def explode_positions(features: DataFrame) -> DataFrame:
    """(feature_id, geometry_json) -> point rows (feature_id, pos_idx, lat, lon)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fid, idx, lats, lons = [], [], [], []
            for f, gj in zip(pdf["feature_id"], pdf["geometry_json"]):
                for i, pos in enumerate(_walk_positions(json.loads(gj))):
                    fid.append(f)
                    idx.append(i)
                    lons.append(float(pos[0]))
                    lats.append(float(pos[1]))
            yield pd.DataFrame(
                {"feature_id": fid, "pos_idx": idx, "lat": lats, "lon": lons}
            )

    return features.select("feature_id", "geometry_json").mapInPandas(
        gen, schema="feature_id long, pos_idx long, lat double, lon double"
    )


def rebuild_features(features: DataFrame, enriched_points: DataFrame, interpolate: bool) -> DataFrame:
    """Re-nest Z-enriched positions into geometry JSON per feature."""
    zs = enriched_points.select(
        "feature_id",
        "pos_idx",
        F.coalesce(
            F.col("elevation").cast("double"), F.lit(0.0)
        ).alias("z"),  # missing -> 0 (geojson.rs:166)
    )
    grouped = zs.groupBy("feature_id").agg(
        F.sort_array(F.collect_list(F.struct("pos_idx", "z"))).alias("zs")
    )
    joined = features.join(grouped, "feature_id", "left")

    out_schema = T.StructType(
        [
            T.StructField("feature_id", T.LongType()),
            T.StructField("properties_json", T.StringType()),
            T.StructField("geometry_json", T.StringType()),
        ]
    )

    def rebuild(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            geoms = []
            for gj, z_structs in zip(pdf["geometry_json"], pdf["zs"]):
                geom = json.loads(gj)
                zlist = [s["z"] for s in (z_structs if z_structs is not None else [])]
                if not interpolate:
                    zlist = [int(z) for z in zlist]
                geoms.append(json.dumps(_set_z(geom, zlist), separators=(",", ":")))
            out = pdf[["feature_id", "properties_json"]].copy()
            out["geometry_json"] = geoms
            yield out

    return joined.mapInPandas(rebuild, schema=out_schema)


def enrich_geojson(
    engine: ElevationEngine, spark: SparkSession, doc: dict, interpolate: bool = False
) -> dict:
    """Full pipeline on a parsed GeoJSON document; returns the enriched doc
    with the same root shape as the input."""
    feats = features_to_df(spark, doc)
    pts = explode_positions(feats)
    joined = engine.elevation_join(
        pts, mode="bilinear" if interpolate else "nearest", strategy="broadcast"
    )
    rebuilt = rebuild_features(feats, joined, interpolate).orderBy("feature_id").collect()

    out_feats = []
    for r in rebuilt:
        out_feats.append(
            {
                "type": "Feature",
                "properties": json.loads(r.properties_json),
                "geometry": json.loads(r.geometry_json),
            }
        )
    t = doc.get("type")
    if t == "FeatureCollection":
        return {"type": "FeatureCollection", "features": out_feats}
    if t == "Feature":
        return out_feats[0]
    return out_feats[0]["geometry"]


def enrich_geojson_file(
    engine: ElevationEngine,
    spark: SparkSession,
    path: str,
    out_path: str | None = None,
    interpolate: bool = False,
) -> str:
    import os

    if out_path is None:
        stem, _ext = os.path.splitext(path)
        out_path = f"{stem}_elevation.geojson"
    with open(path) as f:
        doc = json.load(f)
    out = enrich_geojson(engine, spark, doc, interpolate)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=2)  # pretty-print like batch.rs:188-191
    return out_path
