"""File-extension dispatch for batch enrichment — the `htg batch <file>`
entry point (P5, htg-cli/src/commands/batch.rs:36-49): `.csv` -> CSV
pipeline, `.geojson`/`.json` -> GeoJSON pipeline, anything else errors."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from .csv_pipeline import enrich_csv_file
from .engine import ElevationEngine
from .geojson_pipeline import enrich_geojson_file


def batch_enrich_file(
    engine: ElevationEngine,
    spark: SparkSession,
    path: str,
    out_path: str | None = None,
    interpolate: bool = False,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> str:
    """Dispatch on extension exactly like the CLI; returns the output path."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".csv":
        return enrich_csv_file(
            engine, spark, path, out_path, lat_col=lat_col, lon_col=lon_col, interpolate=interpolate
        )
    if ext in (".geojson", ".json"):
        return enrich_geojson_file(engine, spark, path, out_path, interpolate=interpolate)
    raise ValueError(
        f"unsupported file extension {ext!r}: expected .csv, .geojson or .json "
        "(batch.rs:36-49)"
    )
