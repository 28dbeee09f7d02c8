"""Spatial cell encoding — JVM-side Column expressions (no Python UDFs).

The coarse cell is the reference's tile key, `(floor(lat), floor(lon))`
(`htg/src/service.rs:493`); finer H3/S2-style levels subdivide each 1-degree
cell into 4^level row-major subcells derived from the fractional parts (the
sandbox has no `h3` package — this integer encoding is our level scheme, and
it is closed-form so a SQL oracle can reproduce it exactly).

All expressions here are pure `pyspark.sql.functions` compositions: they stay
inside whole-stage codegen and push down to the scan where possible.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# full-globe phash geotag encoding — MUST match fixtures.phash_to_lat_lon
_U_SCALE = 4294967296.0  # 2^32
_V_SCALE = 2147483648.0  # 2^31


def lat_from_phash(phash: Column) -> Column:
    """lat = -90 + ((phash & 0xFFFFFFFF) / 2^32) * 180 — exact bit extraction
    (integer ops, then IEEE double math identical across Spark/NumPy/DuckDB)."""
    u = phash.bitwiseAND(F.lit(4294967295)).cast("double")
    return F.lit(-90.0) + (u / F.lit(_U_SCALE)) * F.lit(180.0)


def lon_from_phash(phash: Column) -> Column:
    """lon = -180 + (((phash >> 32) & 0x7FFFFFFF) / 2^31) * 360."""
    v = F.shiftright(phash, 32).bitwiseAND(F.lit(2147483647)).cast("double")
    return F.lit(-180.0) + (v / F.lit(_V_SCALE)) * F.lit(360.0)


def tile_lat(lat: Column) -> Column:
    """floor, not trunc — negative coords round down (service.rs:493)."""
    return F.floor(lat).cast("int")


def tile_lon(lon: Column) -> Column:
    return F.floor(lon).cast("int")


def in_coverage(lat: Column, lon: Column) -> Column:
    """Inclusive SRTM coverage predicate (filename.rs:146-148)."""
    return lat.between(-60.0, 60.0) & lon.between(-180.0, 180.0)


def tile_filename(t_lat: Column, t_lon: Column) -> Column:
    """{N|S}{lat:02}{E|W}{lon:03}.hgt (filename.rs:38-49)."""
    return F.format_string(
        "%s%02d%s%03d.hgt",
        F.when(t_lat >= 0, "N").otherwise("S"),
        F.abs(t_lat),
        F.when(t_lon >= 0, "E").otherwise("W"),
        F.abs(t_lon),
    )


def filename_to_key(name: Column):
    """Parse '{N|S}dd{E|W}ddd(.hgt)' (case-insensitive, path stripped) back to
    (tile_lat, tile_lon); NULL on malformed input (filename.rs:95-132)."""
    # split on ONE literal backslash: the JVM regex engine must see the
    # two-char pattern \\ (Python r"\\"); r"\\\\" would match only *pairs*
    # of backslashes, leaving Windows-style paths unstripped
    base = F.element_at(F.split(F.element_at(F.split(name, "/"), -1), r"\\"), -1)
    m = F.regexp_extract(base, r"^([NSns])(\d{2})([EWew])(\d{3})(\.hgt)?$", 0)
    ok = m != ""
    lat_sign = F.when(F.upper(F.substring(base, 1, 1)) == "N", 1).otherwise(-1)
    lon_sign = F.when(F.upper(F.substring(base, 4, 1)) == "E", 1).otherwise(-1)
    t_lat = F.when(ok, lat_sign * F.substring(base, 2, 2).cast("int")).cast("int")
    t_lon = F.when(ok, lon_sign * F.substring(base, 5, 3).cast("int")).cast("int")
    return t_lat, t_lon


def cell_id(t_lat: Column, t_lon: Column) -> Column:
    """Level-0 global cell id: (tile_lat+90)*360 + (tile_lon+180), in [0, 64800)."""
    return ((t_lat.cast("long") + 90) * 360 + (t_lon.cast("long") + 180)).cast("long")


def cell_id_at_level(lat: Column, lon: Column, level: int) -> Column:
    """H3/S2-style finer cell: each degree cell splits into 2^level x 2^level
    row-major subcells from the fractional parts. Level 0 == tile key cell."""
    if level == 0:
        return cell_id(tile_lat(lat), tile_lon(lon))
    k = 1 << level
    sub_r = F.floor((lat - F.floor(lat)) * k).cast("long")
    sub_c = F.floor((lon - F.floor(lon)) * k).cast("long")
    return cell_id(tile_lat(lat), tile_lon(lon)) * (k * k) + sub_r * k + sub_c


# --- geohash: the interoperable base-32 cell string (Niemeyer encoding) ----
#
# Standard geohash = bit-interleaved (lon first) quantization of lat/lon,
# 5 bits per output char. The successive-halving definition is equivalent to
# computing the quantized cell indices in one shot — floor((lon+180)/360 *
# 2^lon_bits) — and interleaving their bits, which keeps everything in exact
# integer ops after ONE IEEE-identical double multiply+floor per axis, so a
# SQL engine reproduces the string bit-for-bit (spatial_queries generates the
# DuckDB mirror from these same loops).

GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_axis_bits(precision: int) -> tuple[int, int, int]:
    """(total_bits, lon_bits, lat_bits) — lon gets the extra bit on odd
    totals because interleaving starts with longitude."""
    bits = 5 * precision
    return bits, (bits + 1) // 2, bits // 2


def geohash_lon_idx(lon: Column, precision: int = 6) -> Column:
    """Quantized longitude cell in [0, 2^lon_bits): floor((lon+180)/360 * 2^b),
    clamped so the lon=180 edge lands in the last cell."""
    _, lon_bits, _ = geohash_axis_bits(precision)
    raw = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(1 << lon_bits)))
    return F.greatest(F.least(raw.cast("long"), F.lit((1 << lon_bits) - 1)), F.lit(0))


def geohash_lat_idx(lat: Column, precision: int = 6) -> Column:
    _, _, lat_bits = geohash_axis_bits(precision)
    raw = F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(1 << lat_bits)))
    return F.greatest(F.least(raw.cast("long"), F.lit((1 << lat_bits) - 1)), F.lit(0))


def geohash_interleave(lon_idx: Column, lat_idx: Column, precision: int = 6) -> Column:
    """Interleave the axis-index bits MSB-first, longitude on even positions
    — a static sum of (shift, mask, scale) integer terms, pure codegen.
    Pass MATERIALIZED idx columns (a prior select), not inline expressions."""
    bits, lon_bits, lat_bits = geohash_axis_bits(precision)
    out = None
    for t in range(bits):
        if t % 2 == 0:
            src, sbit = lon_idx, lon_bits - 1 - t // 2
        else:
            src, sbit = lat_idx, lat_bits - 1 - t // 2
        term = F.shiftright(src, sbit).bitwiseAND(F.lit(1)) * F.lit(1 << (bits - 1 - t))
        out = term if out is None else out + term
    return out


def geohash_chars(code: Column, precision: int = 6) -> Column:
    """5-bit groups of the interleaved code, MSB group first, through the
    base-32 alphabet. Pass a MATERIALIZED code column."""
    alphabet = F.array(*[F.lit(c) for c in GEOHASH32])
    parts = [
        F.element_at(
            alphabet,
            (F.shiftright(code, 5 * (precision - 1 - c)).bitwiseAND(F.lit(31)) + 1).cast(
                "int"
            ),
        )
        for c in range(precision)
    ]
    return F.concat(*parts)


def bbox_overlaps_tile(
    t_lat: Column, t_lon: Column, min_lat: float, min_lon: float, max_lat: float, max_lon: float
) -> Column:
    """Strict-inequality overlap vs the half-open tile extent
    [tile_lat, tile_lat+1) x [tile_lon, tile_lon+1) (service.rs:102-110)."""
    return (
        (F.lit(min_lat) < (t_lat + 1).cast("double"))
        & (F.lit(max_lat) > t_lat.cast("double"))
        & (F.lit(min_lon) < (t_lon + 1).cast("double"))
        & (F.lit(max_lon) > t_lon.cast("double"))
    )
