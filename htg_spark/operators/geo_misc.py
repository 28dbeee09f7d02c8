"""Small geo operators completing the SURVEY.md §2 inventory: the continent
router (S5) and the HTG_PRELOAD bounds grammar (P4)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# priority-ordered bbox rules (htg/src/download.rs:553-581); inclusive bounds
_CONTINENT_RULES = [
    ("North_America", 15.0, 60.0, -170.0, -50.0),
    ("South_America", -60.0, 15.0, -90.0, -30.0),
    ("Australia", -50.0, -10.0, 110.0, 180.0),
    ("Africa", -35.0, 35.0, -20.0, 55.0),
    ("Eurasia", 0.0, 60.0, -15.0, 180.0),
]


def coords_to_continent(lat: float, lon: float):
    """Pure-Python mirror (download.rs:553-581). None for oceans/Antarctica."""
    for name, lat0, lat1, lon0, lon1 in _CONTINENT_RULES:
        if lat0 <= lat <= lat1 and lon0 <= lon <= lon1:
            return name
    return None


def continent_col(lat: Column, lon: Column) -> Column:
    """Column expression with the same priority-ordered CASE chain."""
    expr = F.lit(None).cast("string")
    for name, lat0, lat1, lon0, lon1 in reversed(_CONTINENT_RULES):
        expr = F.when(lat.between(lat0, lat1) & lon.between(lon0, lon1), name).otherwise(expr)
    return expr


def parse_preload_bounds(value: str):
    """HTG_PRELOAD grammar (htg-service/src/main.rs:165-204):
    'true'/'all'/'1' -> None (all tiles); ';'-separated
    'min_lat,min_lon,max_lat,max_lon' quadruples -> list of boxes;
    unparseable -> None (fall back to all, with the reference's semantics)."""
    trimmed = value.strip()
    if trimmed.lower() in ("true", "all", "1"):
        return None
    boxes = []
    for part in trimmed.split(";"):
        nums = []
        for s in part.split(","):
            try:
                nums.append(float(s.strip()))
            except ValueError:
                pass
        if len(nums) == 4:
            boxes.append((nums[0], nums[1], nums[2], nums[3]))
    return boxes or None
