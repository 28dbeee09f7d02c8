"""Tile download pipeline (S4 + K5) — the reference's downloader
re-expressed as a distributed fetch over a tile-key DataFrame.

The sandbox is offline, so the network source is exercised against a
``file://`` mirror; everything else is the real shape of
``htg/src/download.rs``:

- URL templating with ``{filename} {lat_prefix} {lat} {lon_prefix} {lon}
  {continent}`` placeholders (download.rs:414-441, Custom source) and the
  continent subdirectory layout of the SRTM3 source (download.rs:389-406)
- filename component split (K5, download.rs:584-610)
- retry with LINEAR backoff: sleep ``backoff * attempt`` before attempt N
  (download.rs:355-360: ``500ms * attempt``)
- zip / gzip decompression of the payload (download.rs:466-530), size
  validation via the HGT resolution table
- skip-if-already-downloaded (download.rs:346-348)

Distribution shape: the key DataFrame is fetched with ``mapInPandas`` —
each executor pulls its partition's tiles and writes them locally (the
classic foreachPartition ingest), returning a per-tile manifest row
instead of a side effect only, so the result is joinable/auditable. At
scale the keys are ``repartition(n)``-ed to bound per-task fan-out.
"""

from __future__ import annotations

import gzip
import os
import time
import urllib.request
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from . import hgt
from .operators.geo_misc import coords_to_continent


# known source presets (download.rs:383-406)
ARDUPILOT_SRTM1 = "https://terrain.ardupilot.org/SRTM1/{filename}.hgt.zip"
ARDUPILOT_SRTM3 = "https://terrain.ardupilot.org/SRTM3/{continent}/{filename}.hgt.zip"


def compression_from_url(url: str) -> str:
    """Auto-detect payload compression from the URL (download.rs:660-694):
    .gz -> gzip, .zip -> zip, else none; case-insensitive."""
    low = url.lower()
    if low.endswith(".gz"):
        return "gzip"
    if low.endswith(".zip"):
        return "zip"
    return "none"


def split_filename_components(base_name: str) -> tuple[str, str, str, str]:
    """K5: 'N35E138' -> ('N', '35', 'E', '138') (download.rs:584-599).
    Raises ValueError on malformed input (the reference's DownloadFailed)."""
    if len(base_name) != 7:
        raise ValueError(f"invalid filename format: {base_name!r}")
    return base_name[0:1], base_name[1:3], base_name[3:4], base_name[4:7]


def _coord_from_components(prefix: str, value: str) -> float:
    """download.rs:602-610: N/E positive, S/W negative, unparseable -> 0."""
    try:
        v = float(value)
    except ValueError:
        v = 0.0
    return -v if prefix in ("S", "W") else v


def build_url(url_template: str, filename: str, strict_continent: bool = False) -> str:
    """Expand the Custom-source URL template (download.rs:414-441).

    strict_continent=True reproduces the SRTM3 preset's contract
    (download.rs:393-400): an unmappable coordinate is an ERROR, not an
    empty path segment (the Custom source's `unwrap_or("")`)."""
    if not url_template:
        raise ValueError("no download URL template configured")
    base = filename[: -len(".hgt")] if filename.endswith(".hgt") else filename
    lat_p, lat_s, lon_p, lon_s = split_filename_components(base)
    continent = ""
    if "{continent}" in url_template:
        lat = _coord_from_components(lat_p, lat_s)
        lon = _coord_from_components(lon_p, lon_s)
        cont = coords_to_continent(lat, lon)
        if cont is None and strict_continent:
            raise ValueError(
                f"coordinates ({lat}, {lon}) do not map to a known continent"
            )
        continent = cont or ""
    return (
        url_template.replace("{filename}", base)
        .replace("{lat_prefix}", lat_p)
        .replace("{lat}", lat_s)
        .replace("{lon_prefix}", lon_p)
        .replace("{lon}", lon_s)
        .replace("{continent}", continent)
    )


def _default_opener(url: str, attempt: int) -> bytes:
    with urllib.request.urlopen(url) as r:  # noqa: S310 — file:// mirror in-sandbox
        return r.read()


def decompress(raw: bytes, compression: str) -> bytes:
    """download.rs:466-530: zip -> first .hgt entry; gzip -> stream; none."""
    if compression == "zip":
        return hgt.extract_hgt_from_zip(raw)
    if compression == "gzip":
        return gzip.decompress(raw)
    if compression == "none":
        return raw
    raise ValueError(f"unknown compression {compression!r}")


def fetch_one(
    tile_lat: int,
    tile_lon: int,
    url_template: str,
    dest_dir: str,
    compression: str = "auto",
    max_retries: int = 3,
    backoff_s: float = 0.5,
    opener=None,
    sleeper=time.sleep,
    strict_continent: bool = False,
    checksums: dict | None = None,
) -> dict:
    """Fetch one tile with the reference's retry loop (download.rs:334-373).

    Returns a manifest dict; never raises (failures are rows, not job
    aborts — at 14k tiles a handful of 404s must not kill the ingest).
    strict_continent makes an unmappable {continent} a zero-attempt failed
    row (the SRTM3 contract) instead of retrying a malformed URL.
    checksums: optional {(tile_lat, tile_lon): md5-hex} of the DECOMPRESSED
    payload (the object-store-manifest integrity pattern); a mismatch
    retries (could be a truncated transfer) and ends as a failed row —
    size validation alone cannot catch a right-sized wrong tile."""
    opener = opener or _default_opener
    filename = hgt.coords_to_filename(int(tile_lat), int(tile_lon))
    dest_path = os.path.join(dest_dir, filename)
    row = {
        "tile_lat": int(tile_lat),
        "tile_lon": int(tile_lon),
        "filename": filename,
        "url": "",
        "ok": False,
        "skipped": False,
        "attempts": 0,
        "nbytes": 0,
        "error": None,
    }
    if os.path.exists(dest_path):  # download.rs:346-348
        # skip-if-already-downloaded must not bypass the integrity check:
        # when the manifest carries a checksum for this tile, hash the
        # existing file before trusting it — a corrupt/truncated leftover
        # from a prior run would otherwise be trusted forever. Mismatch ->
        # fall through and re-download. Without a manifest entry the skip
        # is unconditional (the reference's behavior).
        existing_ok = True
        if checksums is not None and checksums.get((int(tile_lat), int(tile_lon))):
            import hashlib

            try:
                with open(dest_path, "rb") as f:
                    got = hashlib.md5(f.read()).hexdigest()
                existing_ok = got == checksums[(int(tile_lat), int(tile_lon))]
            except OSError:
                existing_ok = False
        if existing_ok:
            row.update(ok=True, skipped=True, nbytes=os.path.getsize(dest_path))
            return row
    try:
        url = build_url(url_template, filename, strict_continent=strict_continent)
    except ValueError as e:
        row["error"] = str(e)
        return row
    row["url"] = url
    if compression == "auto":  # download.rs:673-694 auto-detect
        compression = compression_from_url(url)
    os.makedirs(dest_dir, exist_ok=True)
    last_err = None
    for attempt in range(max_retries + 1):
        if attempt > 0:
            sleeper(backoff_s * attempt)  # LINEAR backoff (download.rs:357-359)
        row["attempts"] = attempt + 1
        try:
            raw = opener(url, attempt)
            data = decompress(raw, compression)
            hgt.samples_for_size(len(data))  # size validation
            if checksums is not None:
                import hashlib

                want = checksums.get((int(tile_lat), int(tile_lon)))
                got = hashlib.md5(data).hexdigest()
                if want is not None and got != want:
                    raise ValueError(
                        f"checksum mismatch for {filename}: got {got}, want {want}"
                    )
            # unique temp name: concurrent tasks may fetch the same key
            # (duplicate input rows / speculative execution) — a shared
            # ".part" would race; atomic replace means last writer wins
            tmp = f"{dest_path}.part.{os.getpid()}.{id(data)}"
            with open(tmp, "wb") as f:
                f.write(data)
            os.replace(tmp, dest_path)  # atomic publish
            row.update(ok=True, nbytes=len(data))
            return row
        except Exception as e:  # noqa: BLE001 — every failure kind retries
            last_err = e
    row["error"] = str(last_err)
    return row


MANIFEST_SCHEMA = (
    "tile_lat int, tile_lon int, filename string, url string, ok boolean, "
    "skipped boolean, attempts int, nbytes bigint, error string"
)


def fetch_tiles(
    keys: DataFrame,
    url_template: str,
    dest_dir: str,
    compression: str = "auto",
    max_retries: int = 3,
    backoff_s: float = 0.5,
    opener=None,
    strict_continent: bool = False,
    checksums: dict | None = None,
) -> DataFrame:
    """Distributed tile fetch: (tile_lat, tile_lon) keys -> per-tile
    manifest DataFrame, files written under dest_dir by the executors.
    checksums (optional, broadcast-sized: 32 hex chars per tile) enables
    per-tile integrity verification against a source manifest."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                fetch_one(
                    tl, tn, url_template, dest_dir,
                    compression=compression, max_retries=max_retries,
                    backoff_s=backoff_s, opener=opener,
                    strict_continent=strict_continent, checksums=checksums,
                )
                for tl, tn in zip(pdf["tile_lat"], pdf["tile_lon"])
            ]
            yield pd.DataFrame(rows)

    return keys.select("tile_lat", "tile_lon").mapInPandas(run, schema=MANIFEST_SCHEMA)
