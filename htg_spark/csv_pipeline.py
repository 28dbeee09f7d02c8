"""CSV enrichment pipeline — the `htg batch input.csv` analog (S6).

Reference semantics (htg-cli/src/commands/batch.rs:52-141):
- header row; lat/lon columns located BY NAME (defaults 'lat'/'lon',
  overridable — main.rs:64-70, header lookup batch.rs:64-72)
- every row gets an appended `elevation` column
- missing/void/out-of-coverage -> the literal string "void" (batch.rs:119,126)
- interpolated values formatted {:.2} (batch.rs:118) — Rust {:.2} rounds
  half-to-even, which matches Python formatting but NOT Java's
  String.format, so the formatting runs in an Arrow UDF, not format_string
- output file defaults to {stem}_elevation.csv (batch.rs:88-91)

Unlike the CLI (which loops per row and leans on the LRU cache,
batch.rs:101-134), this is the full distributed join — the per-row loop is
exactly what the north rule forbids.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .engine import ElevationEngine


def _fmt_udf(interpolated: bool):
    @F.pandas_udf(T.StringType())
    def fmt(e: pd.Series) -> pd.Series:
        import numpy as np

        mask = e.isna().to_numpy()
        if interpolated:
            # np.char.mod('%.2f', ·) == Python '%.2f' formatting per value
            # (PyOS_double_to_string: correctly-rounded, half-even) — the
            # exact Rust {:.2} semantic, without a per-row Python lambda
            vals = np.char.mod("%.2f", e.fillna(0.0).to_numpy(dtype="float64"))
        else:
            vals = e.fillna(0).to_numpy(dtype="int64").astype("U")
        return pd.Series(np.where(mask, "void", vals), index=e.index)

    return fmt


def enrich_csv_df(
    engine: ElevationEngine,
    df: DataFrame,
    lat_col: str = "lat",
    lon_col: str = "lon",
    interpolate: bool = False,
) -> DataFrame:
    """Append the reference-formatted `elevation` string column."""
    if lat_col not in df.columns or lon_col not in df.columns:
        raise ValueError(f"columns {lat_col!r}/{lon_col!r} not found in {df.columns}")
    src_cols = list(df.columns)
    # stash any original columns that collide with the engine's lat/lon names
    stash = {c: f"__src_{c}" for c in ("lat", "lon") if c in src_cols}
    work = df
    for orig, tmp in stash.items():
        work = work.withColumnRenamed(orig, tmp)
    eff = lambda c: stash.get(c, c)
    work = work.withColumn("lat", F.col(eff(lat_col)).cast("double")).withColumn(
        "lon", F.col(eff(lon_col)).cast("double")
    )
    joined = engine.elevation_join(
        work, mode="bilinear" if interpolate else "nearest", strategy="broadcast"
    )
    fmt = _fmt_udf(interpolate)
    out = joined.withColumn("elevation", fmt(F.col("elevation")))
    out = out.drop("lat", "lon")
    for orig, tmp in stash.items():
        out = out.withColumnRenamed(tmp, orig)
    return out.select(*src_cols, "elevation")


def enrich_csv_file(
    engine: ElevationEngine,
    spark: SparkSession,
    path: str,
    out_path: str | None = None,
    lat_col: str = "lat",
    lon_col: str = "lon",
    interpolate: bool = False,
) -> str:
    """read.csv -> elevation join -> write.csv; returns the output dir."""
    if out_path is None:
        stem, _ext = os.path.splitext(path)
        out_path = f"{stem}_elevation.csv"
    df = spark.read.option("header", True).csv(path)
    out = enrich_csv_df(engine, df, lat_col, lon_col, interpolate)
    out.write.mode("overwrite").option("header", True).csv(out_path)
    return out_path
