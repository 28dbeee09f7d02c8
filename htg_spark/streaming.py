"""Structured Streaming ingest of the points table (optional extension —
SURVEY.md §2.7: the reference has no streaming surface; parity does not
require it, but a 100TB ingest pipeline does).

The broadcast elevation join is a stateless map-only transformation
(mapInArrow over a broadcast tile catalog — no shuffle, no state), so it
composes with any streaming source/sink unchanged: readStream -> derive
points -> elevation_join(strategy='broadcast') -> writeStream. Watermarks /
windowed aggregation can be layered on the enriched stream by the caller
(elevation columns are ordinary columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .engine import ElevationEngine


def stream_elevation_join(
    engine: ElevationEngine, stream: DataFrame, mode: str = "nearest", **kw
) -> DataFrame:
    """Apply the broadcast elevation join to a streaming DataFrame.

    Only the broadcast strategy is stateless and therefore streaming-safe;
    cogroup would need a stream-static join rewrite.
    """
    if not stream.isStreaming:
        raise ValueError("stream_elevation_join expects a streaming DataFrame")
    return engine.elevation_join(stream, mode=mode, strategy="broadcast", **kw)


def tile_hit_counts(enriched_stream: DataFrame, window: str = "1 minute") -> DataFrame:
    """Example stateful layer: per-tile hit counts over processing-time
    windows on the enriched stream (cache-stats analog, service.rs:41-63)."""
    return (
        enriched_stream.withColumn("ts", F.current_timestamp())
        .withWatermark("ts", "0 seconds")
        .groupBy(F.window("ts", window), "tile_lat", "tile_lon")
        .agg(F.count("*").alias("hits"))
    )
