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


# --- Web-mercator slippy tiles (z/x/y + Bing quadkey) ---------------------
#
# The interoperable raster-serving grid (OSM/Bing/MapLibre): zoom z splits
# the mercator square into 2^z x 2^z tiles. Every per-point op is a pure
# projection (zero shuffle); the only transcendentals are sin + ln, whose
# <=1-ulp cross-engine differences can flip the floor() only when the
# mercator image of a latitude lands within ~2^-52 (relative) of a tile
# boundary — vanishingly unlikely for any finite fixture and EXPOSED, not
# hidden, by the full-value oracle. All exported columns are integers or
# strings built from them; no raw double ever reaches an output.

WEB_MERCATOR_MAX_LAT = 85.05112878  # atan(sinh(pi)) in degrees — the square cut
_PI = 3.141592653589793  # double nearest pi; inlined VERBATIM in SQL mirrors
_4PI = 12.566370614359172  # double(4*pi) precomputed so both engines share it


def mercator_tile_x(lon: Column, zoom: int) -> Column:
    """Slippy x: floor((lon+180)/360 * 2^z), clamped so lon=180 stays in the
    last column. Same shape as geohash_lon_idx at 2^zoom cells."""
    raw = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(1 << zoom)))
    return F.greatest(F.least(raw.cast("long"), F.lit((1 << zoom) - 1)), F.lit(0))


def mercator_tile_y(lat: Column, zoom: int) -> Column:
    """Slippy y via the Gudermannian inverse written with sin + ln only:
    merc = 0.5 - ln((1+s)/(1-s)) / (4*pi),  s = sin(lat_c * pi / 180)
    with lat clamped to +/-85.05112878 first (the mercator square cut).
    The op order here is mirrored TOKEN-FOR-TOKEN by the SQL oracle."""
    lat_c = F.greatest(
        F.least(lat, F.lit(WEB_MERCATOR_MAX_LAT)), F.lit(-WEB_MERCATOR_MAX_LAT)
    )
    s = F.sin(lat_c * F.lit(_PI) / F.lit(180.0))
    merc = F.lit(0.5) - F.log((F.lit(1.0) + s) / (F.lit(1.0) - s)) / F.lit(_4PI)
    raw = F.floor(merc * F.lit(float(1 << zoom)))
    return F.greatest(F.least(raw.cast("long"), F.lit((1 << zoom) - 1)), F.lit(0))


def mercator_sql_idx(zoom: int, lon_col: str = "lon", lat_col: str = "lat") -> tuple[str, str]:
    """DuckDB mirror of (mercator_tile_x, mercator_tile_y) — generated from
    the same constants so the two renderings cannot drift."""
    n = float(1 << zoom)
    hi = (1 << zoom) - 1
    x = (
        f"greatest(least(CAST(floor(({lon_col} + 180.0) / 360.0 * {n!r}) AS BIGINT), "
        f"{hi}), 0)"
    )
    lat_c = f"greatest(least({lat_col}, {WEB_MERCATOR_MAX_LAT!r}), {-WEB_MERCATOR_MAX_LAT!r})"
    s = f"sin({lat_c} * {_PI!r} / 180.0)"
    merc = f"(0.5 - ln((1.0 + {s}) / (1.0 - {s})) / {_4PI!r})"
    y = f"greatest(least(CAST(floor({merc} * {n!r}) AS BIGINT), {hi}), 0)"
    return x, y


def quadkey(x_idx: Column, y_idx: Column, zoom: int) -> Column:
    """Bing quadkey: base-4 digit per level, MSB-first —
    digit_i = bit_i(x) + 2*bit_i(y), i = zoom-1 .. 0. Quadkeys NEST: the
    parent tile's quadkey is the length-(z-1) prefix, which is what makes
    the string a multi-resolution partition / range-pruning key at scale.
    Pass MATERIALIZED idx columns (a prior select), not inline expressions."""
    digits = F.array(*[F.lit(c) for c in "0123"])
    parts = [
        F.element_at(
            digits,
            (
                F.shiftright(x_idx, i).bitwiseAND(F.lit(1))
                + F.shiftright(y_idx, i).bitwiseAND(F.lit(1)) * F.lit(2)
                + F.lit(1)
            ).cast("int"),
        )
        for i in range(zoom - 1, -1, -1)
    ]
    return F.concat(*parts)


def quadkey_sql(zoom: int, x_col: str = "zx", y_col: str = "zy") -> str:
    """DuckDB mirror of quadkey() — same loop, second rendering target."""
    parts = [
        f"substr('0123', CAST((({x_col} >> {i}) & 1) + (({y_col} >> {i}) & 1) * 2 "
        f"+ 1 AS INT), 1)"
        for i in range(zoom - 1, -1, -1)
    ]
    return " || ".join(parts)


def mercator_fractional(lon: Column, lat: Column, zoom: int) -> tuple[Column, Column]:
    """The CONTINUOUS mercator coordinates (fx, fy) in [0, 2^z): tile index
    is floor(f), sub-tile pixel position is the fractional part. Factored
    out so tile keys and pixel rasterization share one expression — and one
    SQL rendering (mercator_fractional_sql)."""
    fx = (lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(1 << zoom))
    lat_c = F.greatest(
        F.least(lat, F.lit(WEB_MERCATOR_MAX_LAT)), F.lit(-WEB_MERCATOR_MAX_LAT)
    )
    s = F.sin(lat_c * F.lit(_PI) / F.lit(180.0))
    merc = F.lit(0.5) - F.log((F.lit(1.0) + s) / (F.lit(1.0) - s)) / F.lit(_4PI)
    fy = merc * F.lit(float(1 << zoom))
    return fx, fy


def mercator_fractional_sql(zoom: int, lon_col: str = "lon", lat_col: str = "lat") -> tuple[str, str]:
    """DuckDB mirror of mercator_fractional — same constants, same op order."""
    n = float(1 << zoom)
    fx = f"(({lon_col} + 180.0) / 360.0 * {n!r})"
    lat_c = f"greatest(least({lat_col}, {WEB_MERCATOR_MAX_LAT!r}), {-WEB_MERCATOR_MAX_LAT!r})"
    s = f"sin({lat_c} * {_PI!r} / 180.0)"
    fy = f"((0.5 - ln((1.0 + {s}) / (1.0 - {s})) / {_4PI!r}) * {n!r})"
    return fx, fy


def tile_pixel(f: Column, tile_idx: Column, tile_px: int) -> Column:
    """Sub-tile pixel index from a continuous mercator coordinate and its
    (already clamped) tile index: floor(f * tile_px) - tile_idx * tile_px,
    clamped into [0, tile_px) so the clamped edge tiles keep their points
    on the last pixel row/column."""
    raw = F.floor(f * F.lit(float(tile_px))).cast("long") - tile_idx * F.lit(tile_px)
    return F.greatest(F.least(raw, F.lit(tile_px - 1)), F.lit(0))


def tile_pixel_sql(f_sql: str, idx_sql: str, tile_px: int) -> str:
    """DuckDB mirror of tile_pixel."""
    return (
        f"greatest(least(CAST(floor({f_sql} * {float(tile_px)!r}) AS BIGINT) "
        f"- {idx_sql} * {tile_px}, {tile_px - 1}), 0)"
    )
