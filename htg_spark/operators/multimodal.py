"""Multimodal column operators: images, audio, and video as opaque binary
columns with typed metadata.

Real, tested plumbing: schemas, Arrow batch shapes, partition behavior,
vectorized decode of the sandbox-supported codecs (images: raw / P6 PPM /
zlib-compressed raw; audio: pcm16 / pcm16z; video: rawv concatenated
frames — all losslessly decodable with stdlib+NumPy). External codecs
(JPEG/PNG via Pillow, wav/mp3 via libsndfile, mp4 via ffmpeg) are NOT
available in this container: those decode branches raise
NotImplementedError behind clearly-marked stubs, as mandated — swap
`_decode_external` / `_decode_audio_external` / `_decode_video_external`
for real decoders on a cluster with the libs installed and everything
downstream (schema, batching, feature math, frame fan-out) is already
exercised by tests.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .. import fixtures

SANDBOX_CODECS = ("raw", "ppm", "rawz")


def _decode_external(data: bytes, fmt: str) -> np.ndarray:
    """STUB: jpeg/png/webp decode needs Pillow/cv2, absent in this sandbox."""
    raise NotImplementedError(
        f"codec {fmt!r} requires an external image library not present in the "
        "sandbox; install Pillow and replace _decode_external"
    )


def decode_pixels(data: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    if fmt in SANDBOX_CODECS:
        return fixtures.decode_image(data, w, h, fmt)
    return _decode_external(data, fmt)


def _decode_stacks(pdf: pd.DataFrame):
    """Yield (positions, stack) per uniform-(w, h, fmt) subgroup of an Arrow
    batch: `positions` are 0-based row positions into `pdf` and `stack` is
    the (n, h, w, 3) uint8 pixel block for those rows.

    Fixed-shape codecs (raw / rawz) decode as ONE np.frombuffer over the
    concatenated buffers — no per-row array construction (the per-row
    itertuples loop was the multimodal hot-path cost flagged in review;
    rawz still pays one zlib.decompress call per row, which is the codec,
    not the plumbing). PPM keeps a per-row parse (its header is per-image)
    but still batches into one stack. Per-row size validation is preserved
    exactly (decode_pixels raises the same errors)."""
    import zlib

    pdf = pdf.reset_index(drop=True)
    groups = pdf.groupby(["w", "h", "fmt"], sort=False).indices
    # pandas groupby drops rows whose key contains a null — those positions
    # would otherwise fall through every consumer's output buffer as
    # UNINITIALIZED memory (np.empty). Refuse them explicitly: a null
    # (w, h, fmt) is a malformed image row, not a decodable subgroup.
    n_grouped = sum(len(p) for p in groups.values())
    if n_grouped != len(pdf):
        bad = pdf[pdf[["w", "h", "fmt"]].isna().any(axis=1)]["image_id"].tolist()
        raise ValueError(
            f"images with null w/h/fmt cannot be decoded: {bad[:5]}"
            + ("..." if len(bad) > 5 else "")
        )
    for (w, h, fmt), pos in groups.items():
        w, h = int(w), int(h)
        blobs = pdf["bytes"].to_numpy()[pos]
        if fmt in ("raw", "rawz"):
            bufs = (
                [zlib.decompress(bytes(b)) for b in blobs]
                if fmt == "rawz"
                else [bytes(b) for b in blobs]
            )
            for b in bufs:
                if len(b) != w * h * 3:
                    raise ValueError(f"payload size {len(b)} != {w}*{h}*3")
            stack = np.frombuffer(b"".join(bufs), dtype=np.uint8).reshape(
                len(pos), h, w, 3
            )
        else:
            stack = np.stack(
                [decode_pixels(bytes(b), w, h, fmt) for b in blobs]
            )
        yield pos, stack


def image_stats(images: DataFrame) -> DataFrame:
    """Per-image channel statistics, decoded vectorized in Arrow batches:
    (image_id, mean_r, mean_g, mean_b, std_all).

    Channel means reduce the uint8 stack directly with a float64
    accumulator — integer-valued sums are exact in float64, so the values
    are bit-identical to a per-image astype(float64).mean(). The std pass
    does materialize float64, so it runs in bounded row chunks."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            mean_r = np.empty(n)
            mean_g = np.empty(n)
            mean_b = np.empty(n)
            std_all = np.empty(n)
            for pos, stack in _decode_stacks(pdf):
                mean_r[pos] = stack[:, :, :, 0].mean(axis=(1, 2), dtype=np.float64)
                mean_g[pos] = stack[:, :, :, 1].mean(axis=(1, 2), dtype=np.float64)
                mean_b[pos] = stack[:, :, :, 2].mean(axis=(1, 2), dtype=np.float64)
                for s in range(0, len(pos), 1024):
                    blk = stack[s : s + 1024].astype(np.float64)
                    std_all[pos[s : s + 1024]] = blk.reshape(blk.shape[0], -1).std(
                        axis=1
                    )
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"],
                    "mean_r": mean_r,
                    "mean_g": mean_g,
                    "mean_b": mean_b,
                    "std_all": std_all,
                }
            )

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        run, schema="image_id string, mean_r double, mean_g double, mean_b double, std_all double"
    )


def image_quality(images: DataFrame, edge_thresh: int = 64) -> DataFrame:
    """Exact-integer image quality metrics for curation filtering — the
    blur/exposure gates a web-scale image pipeline applies before training
    (keep sharp, well-exposed images; drop flat or clipped ones):

    - gray = r + g + b per pixel (0..765): integer luma, no float weights,
      so every downstream metric is exact and cross-engine bit-stable;
    - lap_ss: sum of squared 4-neighbor Laplacians (4g - up - down - left
      - right) over INTERIOR gray pixels — the variance-of-Laplacian focus
      measure with the division dropped (monotone-equivalent per size, and
      exact);
    - edge_count: interior pixels with \\|laplacian\\| >= edge_thresh;
    - n_clip_lo / n_clip_hi: channel samples == 0 / == 255 (under/over-
      exposure clipping);
    - dyn_range: max(gray) - min(gray) (contrast span).

    Images narrower than 3 px in either axis have no interior: lap_ss =
    edge_count = 0. Decode is the shared vectorized _decode_stacks path
    (one np.frombuffer per fixed-shape subgroup); all reductions run on
    the whole stack, never per row. Scale shape: embarrassingly parallel
    map over the image corpus, zero shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            lap_ss = np.zeros(n, dtype=np.int64)
            edge_count = np.zeros(n, dtype=np.int64)
            clip_lo = np.empty(n, dtype=np.int64)
            clip_hi = np.empty(n, dtype=np.int64)
            dyn = np.empty(n, dtype=np.int64)
            for pos, stack in _decode_stacks(pdf):
                g = stack.sum(axis=3, dtype=np.int64)  # (n, h, w) in 0..765
                clip_lo[pos] = (stack == 0).sum(axis=(1, 2, 3))
                clip_hi[pos] = (stack == 255).sum(axis=(1, 2, 3))
                dyn[pos] = g.max(axis=(1, 2)) - g.min(axis=(1, 2))
                if g.shape[1] >= 3 and g.shape[2] >= 3:
                    lap = (
                        4 * g[:, 1:-1, 1:-1]
                        - g[:, :-2, 1:-1]
                        - g[:, 2:, 1:-1]
                        - g[:, 1:-1, :-2]
                        - g[:, 1:-1, 2:]
                    )
                    lap_ss[pos] = (lap * lap).sum(axis=(1, 2))
                    edge_count[pos] = (np.abs(lap) >= edge_thresh).sum(axis=(1, 2))
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"],
                    "lap_ss": lap_ss,
                    "edge_count": edge_count,
                    "n_clip_lo": clip_lo,
                    "n_clip_hi": clip_hi,
                    "dyn_range": dyn,
                }
            )

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        run,
        schema="image_id string, lap_ss long, edge_count long, "
        "n_clip_lo long, n_clip_hi long, dyn_range long",
    )


def image_histogram(images: DataFrame, bins: int = 8) -> DataFrame:
    """Per-channel color histogram in long form — one row per
    (image_id, channel, bin) INCLUDING empty bins, so downstream
    histogram-distance joins see aligned vectors without a fill step:
    (image_id, channel 0..2, bin 0..bins-1, cnt).

    All-integer (bin = pixel >> log2(256/bins)), so the DuckDB oracle
    recomputes every count exactly. The decode stack reduces with ONE
    np.bincount per uniform-shape subgroup (row/channel/bin composed into
    a single index) — no per-image loop; the 3*bins-per-image fan-out is
    map-only, the shape that survives 100 TB (histograms are then tiny
    relative to payloads). bins must be a power of two <= 256."""
    if bins < 2 or bins > 256 or (bins & (bins - 1)) != 0:
        raise ValueError(f"bins must be a power of two in [2, 256], got {bins}")
    shift = 8 - (bins.bit_length() - 1)
    per_img = 3 * bins

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            counts = np.zeros((n, 3, bins), dtype=np.int64)
            for pos, stack in _decode_stacks(pdf):
                m = len(pos)
                # compose (subgroup row, channel, bin) into one flat index:
                # row*3*bins + channel*bins + bin — one bincount per stack
                idx = (
                    np.arange(m, dtype=np.int64)[:, None, None, None] * per_img
                    + np.arange(3, dtype=np.int64)[None, None, None, :] * bins
                    + (stack >> shift).astype(np.int64)
                )
                counts[pos] = np.bincount(
                    idx.ravel(), minlength=m * per_img
                ).reshape(m, 3, bins)
            ids = pdf["image_id"].to_numpy()
            yield pd.DataFrame(
                {
                    "image_id": np.repeat(ids, per_img),
                    "channel": np.tile(np.repeat(np.arange(3, dtype=np.int32), bins), n),
                    "bin": np.tile(np.arange(bins, dtype=np.int32), 3 * n),
                    "cnt": counts.ravel(),
                }
            )

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        run, schema="image_id string, channel int, bin int, cnt long"
    )


def resize_images(images: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize to (out_w, out_h); output re-encoded 'raw'.
    (image_id, bytes, w, h, fmt) with the same schema as the input table.
    The gather indices are shared per uniform-shape subgroup, so the whole
    group resizes in one fancy-index over the stacked block.

    Output assembly is Arrow-native (mapInArrow): the binary column is ONE
    BinaryArray built zero-copy over the stacked (n, out_h, out_w, 3)
    uint8 block with arithmetic offsets — no per-row tobytes() loop, no
    n Python bytes objects (the per-row assembly was the flagged residual
    cost after the decode side was batched)."""
    import pyarrow as pa

    row_nbytes = out_h * out_w * 3

    def run(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        schema = pa.schema(
            [
                ("image_id", pa.string()),
                ("bytes", pa.binary()),
                ("w", pa.int32()),
                ("h", pa.int32()),
                ("fmt", pa.string()),
            ]
        )
        # pa.binary() carries int32 offsets: a chunk's total payload must
        # stay under 2^31 or the arithmetic offsets would silently wrap
        # (from_buffers does NOT validate). Input batches can be huge
        # (maxBytesPerBatch is pinned to Int.MaxValue in session.py), so
        # emit one RecordBatch per <=1 GiB row-chunk of the stacked block.
        chunk_rows = max(1, (1 << 30) // row_nbytes)
        for rb in batches:
            pdf = rb.to_pandas()
            n = len(pdf)
            out = np.empty((n, out_h, out_w, 3), dtype=np.uint8)
            for pos, stack in _decode_stacks(pdf):
                h, w = stack.shape[1], stack.shape[2]
                ri = (np.arange(out_h) * h // out_h).astype(np.int64)
                ci = (np.arange(out_w) * w // out_w).astype(np.int64)
                out[pos] = stack[:, ri][:, :, ci]
            ids = rb.column(rb.schema.get_field_index("image_id")).cast(pa.string())
            for s in range(0, max(n, 1), chunk_rows):
                blk = out[s : s + chunk_rows]
                m = blk.shape[0]
                offsets = np.arange(m + 1, dtype=np.int32) * row_nbytes
                blob_arr = pa.Array.from_buffers(
                    pa.binary(), m,
                    [None, pa.py_buffer(offsets), pa.py_buffer(np.ascontiguousarray(blk))],
                )
                yield pa.RecordBatch.from_arrays(
                    [
                        ids.slice(s, m),
                        blob_arr,
                        pa.array(np.full(m, out_w, dtype=np.int32)),
                        pa.array(np.full(m, out_h, dtype=np.int32)),
                        pa.array(["raw"] * m, type=pa.string()),
                    ],
                    schema=schema,
                )

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInArrow(
        run, schema="image_id string, bytes binary, w int, h int, fmt string"
    )


def chip_images(images: DataFrame, chip: int = 4) -> DataFrame:
    """Split every image into non-overlapping ``chip x chip`` patches — the
    standard vision-training patcher (ViT-style fixed-size chips): one
    output row per full patch, partial edge chips dropped (floor(h/chip) x
    floor(w/chip) per image, the usual crop-to-multiple convention).

    Output: (image_id, chip_row, chip_col, w, h, fmt='raw', bytes) — the
    same payload schema as the input table, so chips compose with every
    other image operator — plus exact per-channel int64 sums so a
    closed-form SQL oracle can value-check the split arithmetic without
    shipping payloads.

    The split is one reshape+transpose per uniform-shape subgroup over the
    stacked block (no per-image Python); output assembly is Arrow-native:
    ONE BinaryArray over the contiguous chip block with arithmetic offsets
    (the resize_images pattern). Scale shape: map-only, zero shuffles;
    output rows = input rows x chips-per-image, bounded per Arrow batch by
    the <=1 GiB chunking below.
    """
    import pyarrow as pa

    if chip < 1:
        raise ValueError("chip must be >= 1")
    row_nbytes = chip * chip * 3

    out_schema = (
        "image_id string, chip_row int, chip_col int, w int, h int, "
        "fmt string, bytes binary, sum_r bigint, sum_g bigint, sum_b bigint"
    )

    def run(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        schema = pa.schema(
            [
                ("image_id", pa.string()),
                ("chip_row", pa.int32()),
                ("chip_col", pa.int32()),
                ("w", pa.int32()),
                ("h", pa.int32()),
                ("fmt", pa.string()),
                ("bytes", pa.binary()),
                ("sum_r", pa.int64()),
                ("sum_g", pa.int64()),
                ("sum_b", pa.int64()),
            ]
        )
        # binary offsets are int32: emit one RecordBatch per <=1 GiB chunk
        # of chip payload (see CLAUDE.md / resize_images)
        chunk_rows = max(1, (1 << 30) // row_nbytes)
        for rb in batches:
            pdf = rb.to_pandas()
            for pos, stack in _decode_stacks(pdf):
                n, h, w = stack.shape[0], stack.shape[1], stack.shape[2]
                nr, nc = h // chip, w // chip
                if nr == 0 or nc == 0:
                    continue  # image smaller than one chip: nothing to emit
                crop = stack[:, : nr * chip, : nc * chip, :]
                # (n, nr, chip, nc, chip, 3) -> (n, nr, nc, chip, chip, 3)
                chips = crop.reshape(n, nr, chip, nc, chip, 3).transpose(
                    0, 1, 3, 2, 4, 5
                )
                m_total = n * nr * nc
                block = np.ascontiguousarray(chips.reshape(m_total, chip, chip, 3))
                sums = block.sum(axis=(1, 2), dtype=np.int64)  # (m_total, 3)
                ids = np.repeat(pdf["image_id"].to_numpy()[pos], nr * nc)
                rows_idx = np.tile(np.repeat(np.arange(nr, dtype=np.int32), nc), n)
                cols_idx = np.tile(np.arange(nc, dtype=np.int32), n * nr)
                for s in range(0, m_total, chunk_rows):
                    blk = block[s : s + chunk_rows]
                    m = blk.shape[0]
                    offsets = np.arange(m + 1, dtype=np.int32) * row_nbytes
                    blob_arr = pa.Array.from_buffers(
                        pa.binary(), m,
                        [None, pa.py_buffer(offsets),
                         pa.py_buffer(np.ascontiguousarray(blk))],
                    )
                    yield pa.RecordBatch.from_arrays(
                        [
                            pa.array(ids[s : s + m], type=pa.string()),
                            pa.array(rows_idx[s : s + m]),
                            pa.array(cols_idx[s : s + m]),
                            pa.array(np.full(m, chip, dtype=np.int32)),
                            pa.array(np.full(m, chip, dtype=np.int32)),
                            pa.array(["raw"] * m, type=pa.string()),
                            blob_arr,
                            pa.array(sums[s : s + m, 0]),
                            pa.array(sums[s : s + m, 1]),
                            pa.array(sums[s : s + m, 2]),
                        ],
                        schema=schema,
                    )

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInArrow(
        run, schema=out_schema
    )


def augment_images(images: DataFrame) -> DataFrame:
    """Deterministic training-time augmentation: per-row saturating
    brightness shift + optional horizontal flip — the reproducible
    (seeded-elsewhere) augmentation stage of a vision data pipeline.

    Input carries the parameters as columns so the op stays generic:
    (image_id, bytes, w, h, fmt, aug_delta int, aug_flip boolean);
    pixels' = clip(p + aug_delta, 0, 255), columns reversed when
    aug_flip. Output keeps the payload schema (fmt='raw', same dims) and
    adds exact per-channel int64 sums of the AUGMENTED pixels so a
    closed-form SQL oracle can value-check the saturation arithmetic
    without shipping payloads (a horizontal flip permutes pixels within
    rows, so channel sums are flip-invariant — the flip itself is
    pytest-checked byte-for-byte).

    Same scale shape as resize/chips: decode + augment vectorized per
    uniform-shape subgroup, Arrow-native output assembly (ONE BinaryArray
    per <=1 GiB chunk), map-only, zero shuffles."""
    import pyarrow as pa

    out_schema = (
        "image_id string, bytes binary, w int, h int, fmt string, "
        "aug_delta int, aug_flip boolean, sum_r bigint, sum_g bigint, "
        "sum_b bigint"
    )

    def run(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        schema = pa.schema(
            [
                ("image_id", pa.string()),
                ("bytes", pa.binary()),
                ("w", pa.int32()),
                ("h", pa.int32()),
                ("fmt", pa.string()),
                ("aug_delta", pa.int32()),
                ("aug_flip", pa.bool_()),
                ("sum_r", pa.int64()),
                ("sum_g", pa.int64()),
                ("sum_b", pa.int64()),
            ]
        )
        for rb in batches:
            pdf = rb.to_pandas()
            deltas = pdf["aug_delta"].to_numpy(dtype=np.int64)
            flips = pdf["aug_flip"].to_numpy(dtype=bool)
            ids_all = pdf["image_id"].to_numpy()
            # one output batch per uniform-shape subgroup: fixed row_nbytes
            # gives arithmetic int32 offsets over the contiguous augmented
            # block (the resize_images pattern), chunked <=1 GiB
            for pos, stack in _decode_stacks(pdf):
                d = deltas[pos][:, None, None, None]
                aug = np.clip(stack.astype(np.int64) + d, 0, 255).astype(np.uint8)
                f = flips[pos]
                aug[f] = aug[f][:, :, ::-1, :]
                sums = aug.sum(axis=(1, 2), dtype=np.int64)
                h, w = stack.shape[1], stack.shape[2]
                row_nbytes = h * w * 3
                chunk_rows = max(1, (1 << 30) // row_nbytes)
                for s in range(0, len(pos), chunk_rows):
                    blk = aug[s : s + chunk_rows]
                    m = blk.shape[0]
                    offsets = np.arange(m + 1, dtype=np.int32) * row_nbytes
                    blob_arr = pa.Array.from_buffers(
                        pa.binary(), m,
                        [None, pa.py_buffer(offsets),
                         pa.py_buffer(np.ascontiguousarray(blk))],
                    )
                    sl = pos[s : s + m]
                    yield pa.RecordBatch.from_arrays(
                        [
                            pa.array(ids_all[sl], type=pa.string()),
                            blob_arr,
                            pa.array(np.full(m, w, dtype=np.int32)),
                            pa.array(np.full(m, h, dtype=np.int32)),
                            pa.array(["raw"] * m, type=pa.string()),
                            pa.array(deltas[sl].astype(np.int32)),
                            pa.array(flips[sl]),
                            pa.array(sums[s : s + m, 0]),
                            pa.array(sums[s : s + m, 1]),
                            pa.array(sums[s : s + m, 2]),
                        ],
                        schema=schema,
                    )

    return images.select(
        "image_id", "bytes", "w", "h", "fmt", "aug_delta", "aug_flip"
    ).mapInArrow(run, schema=out_schema)


def image_embedding(images: DataFrame, dim: int = 64) -> DataFrame:
    """Deterministic pixel-derived embedding (downsampled grayscale grid,
    L2-normalized) — the feature-extraction plumbing for the ANN operators;
    swap the body for a real model on a cluster with one. Grayscale +
    subsample + normalize run per uniform-shape subgroup on the stacked
    block (the 3-element channel mean is exact in float64 either way)."""
    import pyarrow as pa

    side = int(np.sqrt(dim))
    assert side * side == dim

    def run(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        schema = pa.schema(
            [("image_id", pa.string()), ("embedding", pa.list_(pa.float32()))]
        )
        # list offsets are int32 ELEMENT counts: chunk so m * dim < 2^31
        # (same silent-wrap hazard as the binary offsets in resize_images)
        chunk_rows = max(1, ((1 << 31) - 1) // dim)
        for rb in batches:
            pdf = rb.to_pandas()
            n = len(pdf)
            vecs = np.empty((n, dim), dtype=np.float32)
            for pos, stack in _decode_stacks(pdf):
                h, w = stack.shape[1], stack.shape[2]
                gray = stack.mean(axis=3, dtype=np.float64)
                ri = (np.arange(side) * h // side).astype(np.int64)
                ci = (np.arange(side) * w // side).astype(np.int64)
                v = gray[:, ri][:, :, ci].reshape(len(pos), dim)
                norms = np.linalg.norm(v, axis=1)
                v = np.where(norms[:, None] > 0, v / np.where(norms == 0, 1.0, norms)[:, None], v)
                vecs[pos] = v.astype(np.float32)
            ids = rb.column(rb.schema.get_field_index("image_id")).cast(pa.string())
            for s in range(0, max(n, 1), chunk_rows):
                blk = vecs[s : s + chunk_rows]
                m = blk.shape[0]
                # ONE ListArray over the stacked (m, dim) float32 block —
                # zero-copy values buffer, arithmetic offsets; no per-row
                # tolist() (m * dim Python floats) in the assembly
                offsets = pa.array(np.arange(m + 1, dtype=np.int32) * dim)
                emb_arr = pa.ListArray.from_arrays(
                    offsets, pa.array(np.ascontiguousarray(blk).reshape(-1))
                )
                yield pa.RecordBatch.from_arrays([ids.slice(s, m), emb_arr], schema=schema)

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInArrow(
        run, schema="image_id string, embedding array<float>"
    )


AHASH_GRID = 8  # 8x8 sample lattice -> 64 cells, 63 packed bits


def ahash_reference(px: np.ndarray) -> int:
    """Scalar reference for one (h, w, 3) uint8 image — the bit-parity
    contract image_ahash must match (and the oracle SQL recomputes):

    - sample an 8x8 lattice by NEAREST index: row (i*h)//8, col (j*w)//8
      (exact integer math — no resampling filter to disagree over)
    - gray = r+g+b per sample (0..765, exact int)
    - bit(i, j) = 1 iff gray*64 >= total (total = sum of all 64 sampled
      grays — the mean threshold cleared of division)
    - pack cells idx = i*8+j for idx < 63 at bit position idx; cell 63 is
      dropped so the signature stays non-negative in a signed 64-bit long
      and bit_count(xor(..)) agrees across engines (same 63-bit contract
      as the phash column)."""
    h, w = px.shape[0], px.shape[1]
    g = AHASH_GRID
    rs = (np.arange(g, dtype=np.int64) * h) // g
    cs = (np.arange(g, dtype=np.int64) * w) // g
    gray = px[rs][:, cs].sum(axis=-1, dtype=np.int64)  # (8, 8)
    total = int(gray.sum())
    bits = (gray.reshape(-1) * g * g >= total).astype(np.int64)[:63]
    return int((bits << np.arange(63, dtype=np.int64)).sum())


def image_ahash(images: DataFrame) -> DataFrame:
    """Average-hash (aHash) perceptual signature per image, computed from
    the REAL pixel bytes — the content-derived twin of the carried phash
    column, feeding the same Manku block-banding near-dup engine.

    Semantics: `ahash_reference` (nearest-sampled 8x8 lattice, r+g+b
    gray, division-free mean threshold gray*64 >= total, 63 packed bits).
    Every step is exact integer arithmetic, so the DuckDB oracle rebuilds
    the signature bit-for-bit from the fixture's pixel closed form.

    Scale shape: decode + hash vectorized per uniform-(w, h, fmt)
    subgroup (one frombuffer + one fancy-index gather per subgroup);
    map-only mapInPandas, zero shuffles, output is 16 bytes/row."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        g = AHASH_GRID
        weights = np.zeros(g * g, dtype=np.int64)
        weights[:63] = np.int64(1) << np.arange(63, dtype=np.int64)
        for pdf in batches:
            n = len(pdf)
            out = np.empty(n, dtype=np.int64)
            for pos, stack in _decode_stacks(pdf):
                h, w = stack.shape[1], stack.shape[2]
                rs = (np.arange(g, dtype=np.int64) * h) // g
                cs = (np.arange(g, dtype=np.int64) * w) // g
                gray = stack[:, rs][:, :, cs].sum(axis=-1, dtype=np.int64)
                total = gray.sum(axis=(1, 2))  # (m,)
                bits = gray.reshape(len(pos), g * g) * (g * g) >= total[:, None]
                out[pos] = (bits * weights).sum(axis=1)
            yield pd.DataFrame({"image_id": pdf["image_id"], "ahash": out})

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        run, schema="image_id string, ahash bigint"
    )


SANDBOX_AUDIO_CODECS = ("pcm16", "pcm16z")
SANDBOX_VIDEO_CODECS = ("rawv",)


def _decode_audio_external(data: bytes, fmt: str) -> np.ndarray:
    """STUB: wav/mp3/flac decode needs libsndfile/ffmpeg, absent here."""
    raise NotImplementedError(
        f"codec {fmt!r} requires an external audio library not present in "
        "the sandbox; install soundfile/ffmpeg and replace "
        "_decode_audio_external"
    )


def decode_audio(data: bytes, n_samples: int, fmt: str) -> np.ndarray:
    """Mono int16 samples. Sandbox codecs: 'pcm16' = little-endian int16,
    'pcm16z' = zlib-compressed pcm16. Anything else is the external stub."""
    import zlib

    if fmt not in SANDBOX_AUDIO_CODECS:
        return _decode_audio_external(data, fmt)
    raw = zlib.decompress(data) if fmt == "pcm16z" else data
    if len(raw) != n_samples * 2:
        raise ValueError(f"payload size {len(raw)} != {n_samples}*2")
    return np.frombuffer(raw, dtype="<i2")


def audio_features(audio: DataFrame) -> DataFrame:
    """Per-clip audio features over an opaque binary column with typed
    metadata (audio_id, bytes, sr, n_samples, fmt) — the audio leg of the
    multimodal pipeline, real Spark plumbing with only the external-codec
    decode stubbed:

    - n_samples, peak = max(|s|), sum_sq = sum(s^2) — exact int64
      (|s| <= 2^15 so sum_sq overflows only past 2^33 samples/clip)
    - duration_us = n_samples * 1_000_000 // sr — exact integer
    - zero_crossings = #{k >= 1 : s[k-1] * s[k] < 0} — exact integer
    - rms = sqrt(sum_sq / n) in exactly that op order (one correctly-
      rounded divide + sqrt), so every engine agrees bit-for-bit

    Map-only mapInPandas; decode batches per (n_samples, fmt) subgroup
    with one frombuffer over the concatenated buffers (pcm16z pays one
    zlib call per row — the codec, not the plumbing)."""
    import zlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.reset_index(drop=True)
            n = len(pdf)
            out_n = np.empty(n, dtype=np.int64)
            out_dur = np.empty(n, dtype=np.int64)
            out_peak = np.empty(n, dtype=np.int64)
            out_ssq = np.empty(n, dtype=np.int64)
            out_zc = np.empty(n, dtype=np.int64)
            out_rms = np.empty(n, dtype=np.float64)
            groups = pdf.groupby(["n_samples", "fmt"], sort=False).indices
            if sum(len(p) for p in groups.values()) != n:
                bad = pdf[pdf[["n_samples", "fmt"]].isna().any(axis=1)][
                    "audio_id"
                ].tolist()
                raise ValueError(f"audio rows with null n_samples/fmt: {bad[:5]}")
            for (ns, fmt), pos in groups.items():
                ns = int(ns)
                blobs = pdf["bytes"].to_numpy()[pos]
                if fmt not in SANDBOX_AUDIO_CODECS:
                    _decode_audio_external(bytes(blobs[0]), str(fmt))
                bufs = (
                    [zlib.decompress(bytes(b)) for b in blobs]
                    if fmt == "pcm16z"
                    else [bytes(b) for b in blobs]
                )
                for b in bufs:
                    if len(b) != ns * 2:
                        raise ValueError(f"payload size {len(b)} != {ns}*2")
                stack = (
                    np.frombuffer(b"".join(bufs), dtype="<i2")
                    .reshape(len(pos), ns)
                    .astype(np.int64)
                )
                srs = pdf["sr"].to_numpy(dtype=np.int64)[pos]
                ssq = (stack * stack).sum(axis=1)
                out_n[pos] = ns
                out_dur[pos] = ns * 1_000_000 // srs
                out_peak[pos] = np.abs(stack).max(axis=1) if ns else 0
                out_ssq[pos] = ssq
                out_zc[pos] = (
                    (stack[:, :-1] * stack[:, 1:] < 0).sum(axis=1) if ns > 1 else 0
                )
                out_rms[pos] = np.sqrt(ssq.astype(np.float64) / float(ns))
            yield pd.DataFrame(
                {
                    "audio_id": pdf["audio_id"],
                    "n_samples": out_n,
                    "duration_us": out_dur,
                    "peak": out_peak,
                    "sum_sq": out_ssq,
                    "zero_crossings": out_zc,
                    "rms": out_rms,
                }
            )

    return audio.select("audio_id", "bytes", "sr", "n_samples", "fmt").mapInPandas(
        run,
        schema=(
            "audio_id string, n_samples bigint, duration_us bigint, "
            "peak bigint, sum_sq bigint, zero_crossings bigint, rms double"
        ),
    )


def _decode_video_external(data: bytes, fmt: str) -> np.ndarray:
    """STUB: mp4/webm decode needs ffmpeg/cv2, absent in this sandbox."""
    raise NotImplementedError(
        f"codec {fmt!r} requires an external video library not present in "
        "the sandbox; install ffmpeg and replace _decode_video_external"
    )


def video_frame_sample(video: DataFrame, every_n: int = 30) -> DataFrame:
    """Sample every ``every_n``-th frame of each clip as an input_hint-
    shaped IMAGE row — the video leg of the multimodal pipeline, composing
    directly with every image operator downstream (stats, resize, chips,
    augment, embedding).

    Input: (video_id, bytes, w, h, n_frames, fmt). Sandbox codec 'rawv' =
    n_frames raw RGB frames concatenated; anything else hits the clearly-
    marked external stub. Output: (image_id = video_id || '_f' || idx,
    frame_idx, bytes, w, h, fmt='raw') plus exact per-channel int64 sums
    so a closed-form SQL oracle can value-check the frame slicing.

    Decode + slice vectorized per uniform-(w, h, n_frames) subgroup (one
    frombuffer over the concatenated clips, one strided frame gather);
    Arrow-native output assembly with arithmetic offsets, <=1 GiB chunks;
    map-only, zero shuffles — frame fan-out never crosses an Exchange."""
    import pyarrow as pa

    if every_n < 1:
        raise ValueError("every_n must be >= 1")

    out_schema = (
        "image_id string, frame_idx int, bytes binary, w int, h int, "
        "fmt string, sum_r bigint, sum_g bigint, sum_b bigint"
    )

    def run(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        schema = pa.schema(
            [
                ("image_id", pa.string()),
                ("frame_idx", pa.int32()),
                ("bytes", pa.binary()),
                ("w", pa.int32()),
                ("h", pa.int32()),
                ("fmt", pa.string()),
                ("sum_r", pa.int64()),
                ("sum_g", pa.int64()),
                ("sum_b", pa.int64()),
            ]
        )
        for rb in batches:
            pdf = rb.to_pandas().reset_index(drop=True)
            groups = pdf.groupby(["w", "h", "n_frames", "fmt"], sort=False).indices
            if sum(len(p) for p in groups.values()) != len(pdf):
                bad = pdf[pdf[["w", "h", "n_frames", "fmt"]].isna().any(axis=1)][
                    "video_id"
                ].tolist()
                raise ValueError(f"video rows with null metadata: {bad[:5]}")
            for (w, h, nf, fmt), pos in groups.items():
                w, h, nf = int(w), int(h), int(nf)
                blobs = pdf["bytes"].to_numpy()[pos]
                if fmt not in SANDBOX_VIDEO_CODECS:
                    _decode_video_external(bytes(blobs[0]), str(fmt))
                frame_nbytes = h * w * 3
                bufs = [bytes(b) for b in blobs]
                for b in bufs:
                    if len(b) != nf * frame_nbytes:
                        raise ValueError(
                            f"payload size {len(b)} != {nf}*{frame_nbytes}"
                        )
                clips = np.frombuffer(b"".join(bufs), dtype=np.uint8).reshape(
                    len(pos), nf, h, w, 3
                )
                sel = np.arange(0, nf, every_n, dtype=np.int64)
                frames = clips[:, sel]  # (n, k, h, w, 3)
                k = sel.size
                m_total = len(pos) * k
                block = np.ascontiguousarray(
                    frames.reshape(m_total, h, w, 3)
                )
                sums = block.sum(axis=(1, 2), dtype=np.int64)
                vids = pdf["video_id"].to_numpy()[pos]
                idxs = np.tile(sel.astype(np.int32), len(pos))
                ids = np.char.add(
                    np.char.add(np.repeat(vids, k).astype(str), "_f"),
                    idxs.astype(str),
                )
                chunk_rows = max(1, (1 << 30) // frame_nbytes)
                for s in range(0, m_total, chunk_rows):
                    blk = block[s : s + chunk_rows]
                    m = blk.shape[0]
                    offsets = np.arange(m + 1, dtype=np.int32) * frame_nbytes
                    blob_arr = pa.Array.from_buffers(
                        pa.binary(), m,
                        [None, pa.py_buffer(offsets),
                         pa.py_buffer(np.ascontiguousarray(blk))],
                    )
                    yield pa.RecordBatch.from_arrays(
                        [
                            pa.array(ids[s : s + m], type=pa.string()),
                            pa.array(idxs[s : s + m]),
                            blob_arr,
                            pa.array(np.full(m, w, dtype=np.int32)),
                            pa.array(np.full(m, h, dtype=np.int32)),
                            pa.array(["raw"] * m, type=pa.string()),
                            pa.array(sums[s : s + m, 0]),
                            pa.array(sums[s : s + m, 1]),
                            pa.array(sums[s : s + m, 2]),
                        ],
                        schema=schema,
                    )

    return video.select(
        "video_id", "bytes", "w", "h", "n_frames", "fmt"
    ).mapInArrow(run, schema=out_schema)


FP_WINDOWS = 64  # energy windows per clip -> 63 delta-sign bits


def audio_fingerprint_reference(s: np.ndarray) -> int:
    """Scalar reference for one int16 sample array — the bit-parity
    contract audio_fingerprint must match (and the oracle SQL rebuilds):

    - sample k belongs to window j = (k * 64) // n  (exact integer map;
      window sizes differ by at most one — both engines share the formula)
    - E_j = sum of s^2 over window j (exact int64)
    - bit_j = 1 iff E_{j+1} > E_j, packed at position j for j < 63

    Sign-of-energy-delta is the classic acoustic-fingerprint shape
    (Haitsma-Kalker): invariant under any monotone per-sample gain, so
    re-leveled copies of a clip land within a small hamming distance."""
    n = int(s.size)
    if n < FP_WINDOWS:
        raise ValueError(f"clip too short for fingerprint: {n} < {FP_WINDOWS}")
    k = np.arange(n, dtype=np.int64)
    w = (k * FP_WINDOWS) // n
    e = np.zeros(FP_WINDOWS, dtype=np.int64)
    np.add.at(e, w, s.astype(np.int64) ** 2)
    bits = (e[1:] > e[:-1]).astype(np.int64)
    return int((bits << np.arange(63, dtype=np.int64)).sum())


def audio_fingerprint(audio: DataFrame) -> DataFrame:
    """63-bit energy-delta fingerprint per clip, computed from the REAL
    payload bytes (pcm16/pcm16z) — the audio twin of image_ahash, feeding
    the same Manku banding near-dup engine. Semantics:
    ``audio_fingerprint_reference`` (all-integer, so the DuckDB oracle
    rebuilds every signature bit-for-bit from the sample closed form).

    Scale shape: decode + window-scatter vectorized per (n_samples, fmt)
    subgroup (one frombuffer + one bincount-style scatter over the
    stacked block); map-only mapInPandas, zero shuffles, 16 bytes/row
    out."""
    import zlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        weights = np.int64(1) << np.arange(63, dtype=np.int64)
        for pdf in batches:
            pdf = pdf.reset_index(drop=True)
            n_rows = len(pdf)
            out = np.empty(n_rows, dtype=np.int64)
            groups = pdf.groupby(["n_samples", "fmt"], sort=False).indices
            if sum(len(p) for p in groups.values()) != n_rows:
                bad = pdf[pdf[["n_samples", "fmt"]].isna().any(axis=1)][
                    "audio_id"
                ].tolist()
                raise ValueError(f"audio rows with null n_samples/fmt: {bad[:5]}")
            for (ns, fmt), pos in groups.items():
                ns = int(ns)
                if ns < FP_WINDOWS:
                    raise ValueError(
                        f"clip too short for fingerprint: {ns} < {FP_WINDOWS}"
                    )
                blobs = pdf["bytes"].to_numpy()[pos]
                if fmt not in SANDBOX_AUDIO_CODECS:
                    _decode_audio_external(bytes(blobs[0]), str(fmt))
                bufs = (
                    [zlib.decompress(bytes(b)) for b in blobs]
                    if fmt == "pcm16z"
                    else [bytes(b) for b in blobs]
                )
                for b in bufs:
                    if len(b) != ns * 2:
                        raise ValueError(f"payload size {len(b)} != {ns}*2")
                stack = (
                    np.frombuffer(b"".join(bufs), dtype="<i2")
                    .reshape(len(pos), ns)
                    .astype(np.int64)
                )
                w = (np.arange(ns, dtype=np.int64) * FP_WINDOWS) // ns
                # one scatter-add per subgroup: segment boundaries are the
                # same for every clip of this length
                starts = np.flatnonzero(np.r_[True, w[1:] != w[:-1]])
                bounds = np.r_[starts, ns]
                sq = stack * stack
                e = np.empty((len(pos), FP_WINDOWS), dtype=np.int64)
                for j in range(FP_WINDOWS):
                    e[:, j] = sq[:, bounds[j] : bounds[j + 1]].sum(axis=1)
                bits = e[:, 1:] > e[:, :-1]
                out[pos] = (bits * weights).sum(axis=1)
            yield pd.DataFrame({"audio_id": pdf["audio_id"], "fp": out})

    return audio.select("audio_id", "bytes", "n_samples", "fmt").mapInPandas(
        run, schema="audio_id string, fp bigint"
    )


def audio_gain(audio: DataFrame, num: int, den: int) -> DataFrame:
    """Integer re-leveling: every sample becomes (s * num) // den (floor
    division, matching DuckDB's `//` and NumPy's `//` exactly) — the
    deterministic 'volume-changed copy' of the audio augment stage.
    Requires num < den so int16 can never clip; output payloads are
    re-encoded with the SAME codec column (pcm16 stays raw, pcm16z stays
    zlib), so the result is a first-class audio row for every downstream
    operator. Map-only, vectorized per (n_samples, fmt) subgroup."""
    import zlib

    if not (0 < num < den):
        raise ValueError("audio_gain requires 0 < num < den (no clipping)")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.reset_index(drop=True)
            payloads = [b"" for _ in range(len(pdf))]
            groups = pdf.groupby(["n_samples", "fmt"], sort=False).indices
            if sum(len(p) for p in groups.values()) != len(pdf):
                bad = pdf[pdf[["n_samples", "fmt"]].isna().any(axis=1)][
                    "audio_id"
                ].tolist()
                raise ValueError(f"audio rows with null n_samples/fmt: {bad[:5]}")
            for (ns, fmt), pos in groups.items():
                ns = int(ns)
                blobs = pdf["bytes"].to_numpy()[pos]
                if fmt not in SANDBOX_AUDIO_CODECS:
                    _decode_audio_external(bytes(blobs[0]), str(fmt))
                bufs = (
                    [zlib.decompress(bytes(b)) for b in blobs]
                    if fmt == "pcm16z"
                    else [bytes(b) for b in blobs]
                )
                for b in bufs:
                    if len(b) != ns * 2:
                        raise ValueError(f"payload size {len(b)} != {ns}*2")
                stack = (
                    np.frombuffer(b"".join(bufs), dtype="<i2")
                    .reshape(len(pos), ns)
                    .astype(np.int64)
                )
                scaled = ((stack * num) // den).astype("<i2")
                for i, p in enumerate(pos):
                    raw = scaled[i].tobytes()
                    payloads[p] = (
                        zlib.compress(raw, level=1) if fmt == "pcm16z" else raw
                    )
            out = pdf.copy()
            out["bytes"] = payloads
            yield out

    cols = ["audio_id", "bytes", "sr", "n_samples", "fmt"]
    return audio.select(*cols).mapInPandas(
        run,
        schema="audio_id string, bytes binary, sr int, n_samples int, fmt string",
    )
