"""Property-based kernel tests (hypothesis): invariants that must hold for
ANY coordinate, including adversarial boundary values — complements the
fixed-expectation parity tests."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from htg_spark import fixtures, hgt

GRID = fixtures.tile_gradient()  # closed form: (row+col) % 4000, no voids
N = GRID.shape[0]

lat_st = st.floats(min_value=-59.999999, max_value=59.999999, allow_nan=False)
lon_st = st.floats(min_value=-179.999999, max_value=179.999999, allow_nan=False)
frac_st = st.floats(min_value=0.0, max_value=0.9999999999, allow_nan=False)


@settings(max_examples=300, deadline=None)
@given(lat=lat_st, lon=lon_st)
def test_nearest_matches_closed_form(lat, lon):
    """The kernel's (row, col) selection must satisfy the closed form:
    elevation == (row + col) % 4000 for the rounded indices."""
    v = int(hgt.lookup_nearest(GRID, lat, lon))
    row_pos, col_pos = hgt.grid_position(lat, lon, N)
    r = int(hgt.round_half_away_nonneg(np.asarray(row_pos)))
    c = int(hgt.round_half_away_nonneg(np.asarray(col_pos)))
    assert v == (min(r, N - 1) + min(c, N - 1)) % 4000


@settings(max_examples=300, deadline=None)
@given(lat=lat_st, lon=lon_st)
def test_bilinear_within_corner_envelope(lat, lon):
    """Bilinear output must lie within [min, max] of the 4 corner values."""
    val, void = hgt.lookup_bilinear(GRID, lat, lon)
    assert not void
    row_pos, col_pos = hgt.grid_position(lat, lon, N)
    r0, c0 = int(np.floor(row_pos)), int(np.floor(col_pos))
    r1, c1 = min(r0 + 1, N - 1), min(c0 + 1, N - 1)
    corners = [int(GRID[r, c]) for r in (r0, r1) for c in (c0, c1)]
    assert min(corners) - 1e-9 <= float(val) <= max(corners) + 1e-9


@settings(max_examples=300, deadline=None)
@given(lat=lat_st, lon=lon_st)
def test_floor_vs_round_at_most_one_cell(lat, lon):
    """floor- and round-selected cells differ by at most one step per axis."""
    row_pos, col_pos = hgt.grid_position(lat, lon, N)
    rr = int(hgt.round_half_away_nonneg(np.asarray(row_pos)))
    rf = int(np.floor(row_pos))
    assert rr - rf in (0, 1)
    cr = int(hgt.round_half_away_nonneg(np.asarray(col_pos)))
    cf = int(np.floor(col_pos))
    assert cr - cf in (0, 1)


@settings(max_examples=300, deadline=None)
@given(lat=lat_st, lon=lon_st)
def test_tile_key_bounds_fraction(lat, lon):
    """lat - floor(lat) lands in [0, 1] — mathematically [0, 1), but IEEE
    rounding can produce exactly 1.0 (e.g. lat = -2.2e-308: floor = -1,
    -2.2e-308 + 1.0 rounds to 1.0). The reference computes the identical
    float expression and its bounds check is inclusive (tile.rs:192
    `(0.0..=1.0).contains`), so 1.0 is in-contract."""
    tl, tn = hgt.tile_key(lat, lon)
    assert tl <= lat and tn <= lon
    fr = lat - np.floor(lat)
    assert 0.0 <= fr <= 1.0


def test_denormal_negative_lat_matches_reference_semantics():
    """frac == 1.0 edge (found by hypothesis): row_pos = (1-1)*(n-1) = 0 ->
    north edge of the southern tile — exactly what Rust f64 math yields."""
    lat = -2.2250738585072014e-308
    tl, _ = hgt.tile_key(lat, 0.5)
    assert int(tl) == -1
    g = fixtures.tile_corners()
    # row 0, col 600 on the corners tile -> 0 (only (0,0) is 1000)
    assert int(hgt.lookup_nearest(g, lat, 0.5)) == 0
    row_pos, _ = hgt.grid_position(lat, 0.5, 1201)
    assert float(row_pos) == 0.0


@settings(max_examples=200, deadline=None)
@given(t_lat=st.integers(min_value=-60, max_value=60), t_lon=st.integers(min_value=-180, max_value=180))
def test_filename_roundtrip_property(t_lat, t_lon):
    name = hgt.coords_to_filename(t_lat, t_lon)
    assert hgt.filename_to_lat_lon(name) == (t_lat, t_lon)
    assert hgt.filename_to_lat_lon(name.lower()) == (t_lat, t_lon)
    assert hgt.filename_to_lat_lon("/a/b/" + name) == (t_lat, t_lon)


@settings(max_examples=100, deadline=None)
@given(
    lat=st.floats(min_value=-89.9, max_value=89.9, allow_nan=False),
    lon=st.floats(min_value=-179.9, max_value=179.9, allow_nan=False),
)
def test_phash_roundtrip_property(lat, lon):
    """Geotag quantization error stays under one grid quantum."""
    p = fixtures.lat_lon_to_phash(lat, lon)
    lat2, lon2 = fixtures.phash_to_lat_lon(p)
    assert abs(float(lat2) - lat) <= 180.0 / 2**32 + 1e-12
    assert abs(float(lon2) - lon) <= 360.0 / 2**31 + 1e-12
