"""Kernel parity tests — every assertion ported from the reference's own
unit tests (htg/src/tile.rs, filename.rs, service.rs; see FIXTURES.md §6)."""

import numpy as np
import pytest

from htg_spark import fixtures, hgt


# --- codec (tile.rs:373-395) ----------------------------------------------------


def test_size_detection():
    assert hgt.samples_for_size(hgt.SRTM3_SIZE) == 1201
    assert hgt.samples_for_size(hgt.SRTM1_SIZE) == 3601
    with pytest.raises(ValueError):
        hgt.samples_for_size(123)


def test_codec_roundtrip_and_endianness():
    g = fixtures.tile_corners()
    data = hgt.encode_tile(g)
    assert len(data) == hgt.SRTM3_SIZE
    # big-endian check: 1000 = 0x03E8 -> first two bytes 0x03 0xE8
    assert data[0] == 0x03 and data[1] == 0xE8
    g2 = hgt.decode_tile(data)
    assert np.array_equal(np.asarray(g2), g)


# --- nearest lookup on T-corners (tile.rs:397-422) --------------------------------


def test_corners_lookup():
    g = fixtures.tile_corners()
    # tile at (35,138): NW corner = (36.0-eps side) row 0 col 0
    # center (35.5, 138.5) -> row 600 col 600 = 500 (service.rs:985-987)
    assert hgt.lookup_nearest(g, 35.5, 138.5) == 500
    # NW corner: lat_frac ~1 -> row 0; lon_frac 0 -> col 0 = 1000
    assert hgt.lookup_nearest(g, 35.9999999, 138.0) == 1000
    # SE corner: lat_frac 0 -> row 1200; lon_frac ~1 -> col 1200 = 100
    assert hgt.lookup_nearest(g, 35.0, 138.9999999) == 100


# --- floor vs round discriminator (tile.rs:554-613) -------------------------------


def test_floor_vs_round():
    g = fixtures.tile_round()
    lat, lon = 33.3448, -96.1592
    # col_pos = 0.8408 * 1200 = 1008.96 -> round 1009 (=190), floor 1008 (=191)
    assert hgt.lookup_nearest(g, lat, lon, rounding="nearest") == 190
    assert hgt.lookup_nearest(g, lat, lon, rounding="floor") == 191


def test_round_half_away_matches_rust():
    x = np.array([0.0, 0.4999999999999999, 0.5, 1.5, 2.5, 1008.96, 600.5])
    expect = np.array([0.0, 0.0, 1.0, 2.0, 3.0, 1009.0, 601.0])
    assert np.array_equal(hgt.round_half_away_nonneg(x), expect)


# --- bilinear interpolation (tile.rs:432-517) --------------------------------------


def _latlon_for_pos(row_pos, col_pos, base_lat=35, base_lon=139, n=1201):
    lat = base_lat + (1.0 - row_pos / (n - 1))
    lon = base_lon + col_pos / (n - 1)
    return lat, lon


def test_bilinear_exact_grid_point():
    g = fixtures.tile_interp()
    lat, lon = _latlon_for_pos(600.0, 600.0)
    v, void = hgt.lookup_bilinear(g, lat, lon)
    assert not void
    assert abs(float(v) - 100.0) <= 1.0  # tile.rs:459-475


def test_bilinear_midpoint():
    g = fixtures.tile_interp()
    lat, lon = _latlon_for_pos(600.5, 600.5)
    v, void = hgt.lookup_bilinear(g, lat, lon)
    assert not void
    assert abs(float(v) - 250.0) <= 5.0  # tile.rs:478-497


def test_bilinear_horizontal():
    g = fixtures.tile_interp()
    lat, lon = _latlon_for_pos(600.0, 600.5)
    v, void = hgt.lookup_bilinear(g, lat, lon)
    assert not void
    assert abs(float(v) - 150.0) <= 10.0  # tile.rs:499-517


def test_bilinear_void_corner():
    g = fixtures.tile_void()
    lat, lon = _latlon_for_pos(600.5, 600.5)
    v, void = hgt.lookup_bilinear(g, lat, lon)
    assert void and np.isnan(v)  # tile.rs:545-552


def test_bilinear_edge_clamp():
    # last row interpolates with itself (tile.rs:257-258): lat=35.0 exactly
    # gives row_pos=1200.0, row1 = min(1201, 1200) = 1200 — no out-of-bounds.
    g = fixtures.tile_corners()
    v, void = hgt.lookup_bilinear(g, 35.0, 138.0)
    assert not void and float(v) == 0.0
    # near the SE corner: row 1200, col_pos in [1199,1200) interpolates
    # between g[1200,1199]=0 and g[1200,1200]=100
    lon = 138.0 + 1199.5 / 1200.0
    v, void = hgt.lookup_bilinear(g, 35.0, lon)
    assert not void and abs(float(v) - 50.0) <= 1.0


# --- filename round-trips (filename.rs:150-274) ------------------------------------


def test_coords_to_filename():
    assert hgt.coords_to_filename(35, 138) == "N35E138.hgt"
    assert hgt.coords_to_filename(-13, -78) == "S13W078.hgt"
    assert hgt.coords_to_filename(0, -1) == "N00W001.hgt"


def test_lat_lon_to_filename_negative_floor():
    assert hgt.lat_lon_to_filename(35.5, 138.7) == "N35E138.hgt"
    assert hgt.lat_lon_to_filename(-12.3, -77.1) == "S13W078.hgt"
    assert hgt.lat_lon_to_filename(0.5, -0.5) == "N00W001.hgt"


def test_filename_to_lat_lon():
    assert hgt.filename_to_lat_lon("N35E138.hgt") == (35, 138)
    assert hgt.filename_to_lat_lon("S12W077.hgt") == (-12, -77)
    assert hgt.filename_to_lat_lon("/path/to/N00E000.hgt") == (0, 0)
    assert hgt.filename_to_lat_lon("n35e138") == (35, 138)  # case-insensitive
    assert hgt.filename_to_lat_lon("invalid") is None
    assert hgt.filename_to_lat_lon("X35E138.hgt") is None
    assert hgt.filename_to_lat_lon("N35X138.hgt") is None
    assert hgt.filename_to_lat_lon("N3AE138.hgt") is None


def test_coverage_predicate():
    assert hgt.is_valid_srtm_coord(60.0, 180.0)
    assert hgt.is_valid_srtm_coord(-60.0, -180.0)
    assert not hgt.is_valid_srtm_coord(60.0001, 0.0)
    assert not hgt.is_valid_srtm_coord(0.0, 180.0001)


# --- tile key (service.rs:493; filename.rs:172-180) ---------------------------------


def test_tile_key_floor_not_trunc():
    klat, klon = hgt.tile_key([-12.3, 35.5, 0.5], [-77.1, 138.7, -0.5])
    assert list(klat) == [-13, 35, 0]
    assert list(klon) == [-78, 138, -1]


# --- batch semantics (service.rs:1044-1095) ------------------------------------------


def test_batch_defaults_missing_void_ooc():
    tiles = {(35, 138): fixtures.tile_center(500)}
    coords = [(35.5, 138.5), (50.0, 50.0), (35.1, 138.1), (70.0, 0.0)]
    out = hgt.get_elevations_batch(coords, tiles, default=-1, mode="nearest")
    # [500 (center), -1 (missing tile), 0 (in-tile zero), -1 (out of coverage)]
    assert list(out) == [500, -1, 0, -1]  # service.rs:1078-1095


def test_batch_void_center_to_default():
    tiles = {(35, 138): fixtures.tile_center(hgt.VOID_VALUE)}
    out = hgt.get_elevations_batch([(35.5, 138.5)], tiles, default=0)
    assert list(out) == [0]  # service.rs:1064-1075


def test_batch_bilinear_void_default():
    tiles = {(35, 139): fixtures.tile_void()}
    lat, lon = _latlon_for_pos(600.5, 600.5)
    out = hgt.get_elevations_batch([(lat, lon)], tiles, default=0.0, mode="bilinear")
    assert list(out) == [0.0]


def test_batch_multi_tile_order_preserved():
    tiles = fixtures.default_catalog_grids()
    coords = [(36.5, 138.5), (35.5, 138.5), (33.3448, -96.1592), (36.5, 138.5)]
    out = hgt.get_elevations_batch(coords, tiles, default=-1)
    assert list(out) == [1000, 500, 190, 1000]


# --- gradient closed form (benches/elevation.rs:10-24) --------------------------------


def test_gradient_tile_matches_closed_form():
    g = fixtures.tile_gradient()
    rng = np.random.default_rng(0)
    rows = rng.integers(0, 1201, 50)
    cols = rng.integers(0, 1201, 50)
    assert np.array_equal(g[rows, cols], ((rows + cols) % 4000).astype(np.int16))


# --- image payload codecs --------------------------------------------------------------


@pytest.mark.parametrize("fmt", ["raw", "ppm", "rawz"])
def test_image_codec_roundtrip(fmt):
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, (9, 5, 3)).astype(np.uint8)
    data = fixtures.encode_image(px, fmt)
    out = fixtures.decode_image(data, 5, 9, fmt)
    assert np.array_equal(out, px)  # lossless => PSNR = inf >= 40 dB


def test_phash_geotag_roundtrip():
    # non-boundary points: round-trip within one quantum, tile key preserved
    lat = np.array([35.5, 50.25, 75.9, -33.9249, 0.1])
    lon = np.array([138.5, 50.5, 10.3, 18.4241, -0.5])
    p = fixtures.lat_lon_to_phash(lat, lon)
    lat2, lon2 = fixtures.phash_to_lat_lon(p)
    assert np.allclose(lat2, lat, atol=1e-6)
    assert np.allclose(lon2, lon, atol=1e-6)
    assert np.array_equal(np.floor(lat2), np.floor(lat))
    assert np.array_equal(np.floor(lon2), np.floor(lon))
    # full-globe encoding reaches out-of-coverage and missing-tile regions
    assert not fixtures.phash_to_lat_lon(fixtures.lat_lon_to_phash(75.5, 10.5))[0] < 60


def test_bench_tile_pattern():
    # T-bench: elev = base + (row+col) % 1000 (benchmarks/create_test_tiles.py:43-50)
    g = fixtures.tile_bench(150)
    assert g[0, 0] == 150 and g[1, 0] == 151 and g[500, 500] == 150
    assert g.dtype == np.int16 and g.shape == (1201, 1201)


def test_batch_floor_mode():
    tiles = {(33, -97): fixtures.tile_round()}
    out_r = hgt.get_elevations_batch([(33.3448, -96.1592)], tiles, default=-1, mode="nearest")
    out_f = hgt.get_elevations_batch([(33.3448, -96.1592)], tiles, default=-1, mode="floor")
    assert list(out_r) == [190] and list(out_f) == [191]


def test_zip_tile_bytes_roundtrip():
    import io
    import zipfile

    data = hgt.encode_tile(fixtures.tile_center(7))
    z = fixtures.zip_tile_bytes("N35E138.hgt", data)
    with zipfile.ZipFile(io.BytesIO(z)) as zf:
        assert zf.namelist() == ["N35E138.hgt"]
        assert zf.read("N35E138.hgt") == data
