"""Download-pipeline shape tests (S4/K5) against a file:// mirror —
URL templating, component split, linear-backoff retry, zip/gzip
decompression, skip-if-exists, and the full fetch -> catalog -> engine
round-trip. Reference: htg/src/download.rs:334-441, 584-610."""

import gzip
import io
import os
import zipfile

import numpy as np
import pandas as pd
import pytest

from htg_spark import download, fixtures, hgt
from htg_spark.engine import ElevationEngine


def _zip_bytes(name: str, payload: bytes) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr(name, payload)
    return buf.getvalue()


@pytest.fixture(scope="module")
def mirror(tmp_path_factory):
    """file:// mirror laid out like the SRTM3 source: SRTM3/{continent}/..."""
    root = tmp_path_factory.mktemp("mirror")
    grids = fixtures.default_catalog_grids()
    for (tl, tn), grid in grids.items():
        name = hgt.coords_to_filename(tl, tn)
        cont = "Eurasia"  # all fixture tiles are in Eurasia's box
        d = root / "SRTM3" / cont
        d.mkdir(parents=True, exist_ok=True)
        (d / f"{name}.zip").write_bytes(_zip_bytes(name, hgt.encode_tile(grid)))
    return root


def test_split_filename_components():
    assert download.split_filename_components("N35E138") == ("N", "35", "E", "138")
    assert download.split_filename_components("S12W077") == ("S", "12", "W", "077")
    with pytest.raises(ValueError):
        download.split_filename_components("N35E13")  # download.rs:586-591


def test_compression_from_url():
    """download.rs:660-670 cases, case-insensitive."""
    assert download.compression_from_url("file.hgt") == "none"
    assert download.compression_from_url("file.hgt.gz") == "gzip"
    assert download.compression_from_url("file.hgt.zip") == "zip"
    assert download.compression_from_url("FILE.HGT.GZ") == "gzip"
    assert download.compression_from_url("FILE.HGT.ZIP") == "zip"
    assert download.compression_from_url("https://example.com/srtm/N35E138.hgt.zip") == "zip"


def test_source_preset_urls():
    """download.rs:784-838: SRTM1 flat (works for Antarctica); SRTM3 uses
    continent subdirectories and ERRORS on unmappable coordinates."""
    assert (
        download.build_url(download.ARDUPILOT_SRTM1, "N35E138")
        == "https://terrain.ardupilot.org/SRTM1/N35E138.hgt.zip"
    )
    assert (
        download.build_url(download.ARDUPILOT_SRTM1, "S70E000")
        == "https://terrain.ardupilot.org/SRTM1/S70E000.hgt.zip"
    )
    assert (
        download.build_url(download.ARDUPILOT_SRTM3, "S34E151", strict_continent=True)
        == "https://terrain.ardupilot.org/SRTM3/Australia/S34E151.hgt.zip"
    )
    assert (
        download.build_url(download.ARDUPILOT_SRTM3, "S34E018", strict_continent=True)
        == "https://terrain.ardupilot.org/SRTM3/Africa/S34E018.hgt.zip"
    )
    assert (
        download.build_url(download.ARDUPILOT_SRTM3, "S04W061", strict_continent=True)
        == "https://terrain.ardupilot.org/SRTM3/South_America/S04W061.hgt.zip"
    )
    with pytest.raises(ValueError, match="continent"):
        download.build_url(download.ARDUPILOT_SRTM3, "S70E000", strict_continent=True)
    # Custom template with {continent}: unmappable -> "" (unwrap_or), no error
    assert (
        download.build_url("https://example.com/{continent}/{filename}.hgt.zip", "N36W117")
        == "https://example.com/North_America/N36W117.hgt.zip"
    )


def test_build_url_template_expansion():
    t = "https://x/SRTM3/{continent}/{filename}.hgt.zip"
    assert (
        download.build_url(t, "N35E138.hgt")
        == "https://x/SRTM3/Eurasia/N35E138.hgt.zip"
    )
    t2 = "https://x/{lat_prefix}{lat}/{lon_prefix}{lon}"
    assert download.build_url(t2, "S12W077") == "https://x/S12/W077"
    with pytest.raises(ValueError):
        download.build_url("", "N35E138")  # download.rs:415-420


def test_retry_linear_backoff_then_success(tmp_path):
    """Attempts 1-2 fail, 3 succeeds; delays before retries are backoff*1,
    backoff*2 (download.rs:355-360)."""
    grid = fixtures.tile_center(500)
    payload = _zip_bytes("N35E138.hgt", hgt.encode_tile(grid))
    delays = []

    def flaky(url, attempt):
        if attempt < 2:
            raise OSError(f"synthetic failure on attempt {attempt}")
        return payload

    row = download.fetch_one(
        35, 138, "mock://{filename}.hgt.zip", str(tmp_path), opener=flaky,
        backoff_s=0.25, sleeper=delays.append,
    )  # compression auto-detected from the .zip URL
    assert row["ok"] and row["attempts"] == 3
    assert delays == [0.25, 0.5]  # linear, not exponential
    assert hgt.decode_tile((tmp_path / "N35E138.hgt").read_bytes())[600, 600] == 500


def test_retry_exhaustion_is_a_row_not_an_exception(tmp_path):
    def always_fail(url, attempt):
        raise OSError("404")

    row = download.fetch_one(
        35, 138, "mock://{filename}", str(tmp_path), opener=always_fail,
        max_retries=2, sleeper=lambda s: None,
    )
    assert not row["ok"] and row["attempts"] == 3 and "404" in row["error"]
    assert not os.path.exists(tmp_path / "N35E138.hgt")


def test_gzip_and_size_validation(tmp_path):
    grid = fixtures.tile_center(7)
    gz = gzip.compress(hgt.encode_tile(grid))
    row = download.fetch_one(
        35, 138, "mock://{filename}", str(tmp_path),
        compression="gzip", opener=lambda u, a: gz, sleeper=lambda s: None,
    )
    assert row["ok"] and row["nbytes"] == 1201 * 1201 * 2
    # corrupt size -> retries exhaust, no file written
    row2 = download.fetch_one(
        36, 138, "mock://{filename}", str(tmp_path), compression="none",
        opener=lambda u, a: b"tooshort", max_retries=1, sleeper=lambda s: None,
    )
    assert not row2["ok"]


def test_checksum_validation(tmp_path):
    """Integrity hook: a right-sized WRONG tile (size validation passes)
    must fail on checksum; the correct tile with the matching md5 passes;
    tiles absent from the manifest are not checked."""
    import hashlib

    good = hgt.encode_tile(fixtures.tile_center(500))
    wrong = hgt.encode_tile(fixtures.tile_center(501))  # same size!
    sums = {(35, 138): hashlib.md5(good).hexdigest()}

    row = download.fetch_one(
        35, 138, "mock://{filename}", str(tmp_path), compression="none",
        opener=lambda u, a: wrong, max_retries=1, sleeper=lambda s: None,
        checksums=sums,
    )
    assert not row["ok"] and "checksum mismatch" in row["error"]
    assert not os.path.exists(tmp_path / "N35E138.hgt")

    row2 = download.fetch_one(
        35, 138, "mock://{filename}", str(tmp_path), compression="none",
        opener=lambda u, a: good, checksums=sums, sleeper=lambda s: None,
    )
    assert row2["ok"]
    # unmanifested tile: no checksum enforced
    row3 = download.fetch_one(
        36, 138, "mock://{filename}", str(tmp_path), compression="none",
        opener=lambda u, a: wrong, checksums=sums, sleeper=lambda s: None,
    )
    assert row3["ok"]


def test_skip_if_exists(tmp_path):
    (tmp_path / "N35E138.hgt").write_bytes(b"\x00" * 8)
    row = download.fetch_one(
        35, 138, "mock://{filename}", str(tmp_path),
        opener=lambda u, a: (_ for _ in ()).throw(OSError("must not fetch")),
    )
    assert row["ok"] and row["skipped"] and row["attempts"] == 0


def test_skip_revalidates_against_checksum(tmp_path):
    """A leftover file that fails its manifest checksum must NOT be skipped:
    the corrupt copy is re-downloaded and atomically replaced. A leftover
    that MATCHES its checksum still short-circuits with zero fetches."""
    import hashlib

    good = hgt.encode_tile(fixtures.tile_center(500))
    sums = {(35, 138): hashlib.md5(good).hexdigest()}
    dest = tmp_path / "N35E138.hgt"
    dest.write_bytes(good[:100] + b"\x00" * (len(good) - 100))  # corrupt leftover

    row = download.fetch_one(
        35, 138, "mock://{filename}", str(tmp_path), compression="none",
        opener=lambda u, a: good, checksums=sums, sleeper=lambda s: None,
    )
    assert row["ok"] and not row["skipped"] and row["attempts"] == 1
    assert dest.read_bytes() == good  # corrupt copy replaced

    row2 = download.fetch_one(
        35, 138, "mock://{filename}", str(tmp_path), compression="none",
        opener=lambda u, a: (_ for _ in ()).throw(OSError("must not fetch")),
        checksums=sums,
    )
    assert row2["ok"] and row2["skipped"] and row2["attempts"] == 0


def test_strict_continent_through_fetch(tmp_path):
    """SRTM3's unmappable-continent contract must be reachable from the
    fetch entry points: zero attempts, no retries on a malformed URL."""
    calls = {"n": 0}

    def opener(url, attempt):
        calls["n"] += 1
        raise OSError("should not be called")

    row = download.fetch_one(
        -70, 0, download.ARDUPILOT_SRTM3, str(tmp_path),
        opener=opener, strict_continent=True, sleeper=lambda s: None,
    )
    assert not row["ok"] and row["attempts"] == 0 and "continent" in row["error"]
    assert calls["n"] == 0  # failed fast, never fetched


def test_distributed_fetch_roundtrip(spark, mirror, tmp_path):
    """The full ingest: keys DF -> mapInPandas fetch over the file:// mirror
    -> catalog_from_dir over the downloaded files -> engine lookup parity."""
    from htg_spark import catalog as cat_mod

    dest = tmp_path / "tiles"
    keys = spark.createDataFrame(
        pd.DataFrame({"tile_lat": [35, 35, 36, 40], "tile_lon": [138, 139, 138, 138]})
    )
    template = f"file://{mirror}/SRTM3/{{continent}}/{{filename}}.hgt.zip"
    manifest = download.fetch_tiles(
        keys, template, str(dest), compression="zip", max_retries=1, backoff_s=0.01
    ).toPandas().set_index(["tile_lat", "tile_lon"])
    assert bool(manifest.loc[(35, 138), "ok"])
    assert bool(manifest.loc[(36, 138), "ok"])
    assert not bool(manifest.loc[(40, 138), "ok"])  # not in mirror -> row, not abort
    assert int(manifest.loc[(40, 138), "attempts"]) == 2

    eng = ElevationEngine(spark, tile_dir=str(dest))
    assert eng.get_elevation(35.5, 138.5) == fixtures.default_catalog_grids()[(35, 138)][600, 600]
