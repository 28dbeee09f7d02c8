"""Multimodal operator plumbing tests — real decode for sandbox codecs,
clearly-stubbed external codecs, schema/batch-shape checks."""

import numpy as np
import pytest

from htg_spark import fixtures
from htg_spark.operators import multimodal


@pytest.fixture(scope="module")
def images(spark):
    return spark.createDataFrame(fixtures.make_images_pdf(48)).repartition(4)


def test_image_stats(spark, images):
    out = multimodal.image_stats(images).toPandas()
    assert len(out) == 48
    assert set(out.columns) == {"image_id", "mean_r", "mean_g", "mean_b", "std_all"}
    # verify one row against direct NumPy decode
    src = fixtures.make_images_pdf(48)
    r = src[src.image_id == "img_00000003"].iloc[0]
    px = fixtures.decode_image(bytes(r["bytes"]), int(r["w"]), int(r["h"]), r["fmt"])
    got = out[out.image_id == "img_00000003"].iloc[0]
    assert got["mean_r"] == px[:, :, 0].astype(np.float64).mean()


def test_resize(spark, images):
    out = multimodal.resize_images(images, 8, 8).toPandas()
    assert (out["w"] == 8).all() and (out["h"] == 8).all() and (out["fmt"] == "raw").all()
    assert all(len(b) == 8 * 8 * 3 for b in out["bytes"])


def test_image_embedding_normalized(spark, images):
    out = multimodal.image_embedding(images, dim=64).toPandas()
    assert len(out) == 48
    for v in out["embedding"]:
        a = np.asarray(v, dtype=np.float64)
        assert a.shape == (64,)
        assert abs(np.linalg.norm(a) - 1.0) < 1e-5


def test_external_codec_stub_raises():
    with pytest.raises(NotImplementedError, match="external image library"):
        multimodal.decode_pixels(b"\xff\xd8\xff", 4, 4, "jpeg")


def test_audio_video_stubs():
    with pytest.raises(NotImplementedError):
        multimodal.audio_features(None)
    with pytest.raises(NotImplementedError):
        multimodal.video_frame_sample(None)
