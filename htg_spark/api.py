"""HTTP response-shape facade (S8) — the htg-service handler layer ported
to plain ``(status, body)`` tuples over :class:`ElevationEngine`.

The reference serves three routes (htg-service/src/handlers.rs); an HTTP
server is not a Spark concern (SURVEY.md §2.1 S8), but the STATUS/BODY
contract is behavior a migrating user depends on, so it is reproduced and
tested against the reference's own integration suite
(htg-service/tests/api_tests.rs:1-331):

- ``GET /elevation``  -> :func:`elevation_response`
    400 missing param / out-of-bounds (error.rs:18 message shape),
    404 missing tile or void (handlers.rs:152, 191, 209-213),
    200 ``{elevation:int, lat, lon}``; with ``interpolate=true`` a float
    elevation plus ``interpolated: true`` (handlers.rs:120-143).
- ``POST /elevation`` (GeoJSON) -> :func:`geojson_response`
    400 invalid geometry / out-of-bounds position (handlers.rs:252-260);
    200 enriched geometry where missing/void positions get z=0
    (geojson.rs:166 ``unwrap_or(0)``).
- ``GET /health`` / ``GET /stats`` -> :func:`health_response` /
  :func:`stats_response` (api_tests.rs:95-130).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from . import __version__, hgt
from .engine import ElevationEngine
from .geojson_pipeline import GEOM_TYPES, _walk_positions, enrich_geojson


def _out_of_bounds_body(lat, lon) -> dict:
    # error.rs:18 message shape
    return {
        "error": f"Coordinates out of bounds: lat={lat}, lon={lon} "
        "(valid: lat ±60°, lon ±180°)"
    }


def elevation_response(
    engine: ElevationEngine,
    lat: float | None = None,
    lon: float | None = None,
    interpolate: bool = False,
) -> tuple[int, dict]:
    """GET /elevation analog: (status, json-body)."""
    if lat is None or lon is None:
        return 400, {"error": "missing required query parameter: lat and lon"}
    try:
        value = (
            engine.get_elevation_interpolated(lat, lon)
            if interpolate
            else engine.get_elevation(lat, lon)
        )
    except ValueError:
        return 400, _out_of_bounds_body(lat, lon)
    if value is None:
        # missing tile AND void sample both surface as 404 (handlers.rs:152)
        return 404, {
            "error": f"No elevation data available for lat={lat}, lon={lon}"
        }
    body = {"elevation": value, "lat": lat, "lon": lon}
    if interpolate:
        body["interpolated"] = True
    return 200, body


def geojson_response(
    engine: ElevationEngine,
    spark: SparkSession,
    geometry: dict,
    interpolate: bool = False,
) -> tuple[int, dict]:
    """POST /elevation analog: enrich a GeoJSON Geometry with Z values.

    Out-of-bounds positions propagate as 400 (the service's
    add_elevations_to_geometry `?` on OutOfBounds); in-bounds positions with
    missing tiles or voids get z=0 (geojson.rs:166)."""
    if not isinstance(geometry, dict) or geometry.get("type") not in GEOM_TYPES:
        return 400, {"error": f"invalid GeoJSON geometry: {geometry!r:.80}"}
    try:
        for pos in _walk_positions(geometry):
            lon, lat = float(pos[0]), float(pos[1])
            if not bool(hgt.is_valid_srtm_coord(lat, lon)):
                return 400, _out_of_bounds_body(lat, lon)
    except (ValueError, TypeError, KeyError, IndexError) as e:
        return 400, {"error": f"invalid GeoJSON geometry: {e}"}
    out = enrich_geojson(engine, spark, geometry, interpolate=interpolate)
    return 200, out


def health_response() -> tuple[int, dict]:
    """GET /health analog (api_tests.rs:95-104)."""
    return 200, {"status": "healthy", "version": __version__}


def stats_response(engine: ElevationEngine) -> tuple[int, dict]:
    """GET /stats analog (api_tests.rs:107-130)."""
    s = engine.cache_stats()
    return 200, {
        "cache_hits": s["hit_count"],
        "cache_misses": s["miss_count"],
        "cache_entries": s["entry_count"],
        "hit_rate": s["hit_rate"],
    }
