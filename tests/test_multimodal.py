"""Multimodal plumbing tests: Arrow-batched feature extraction and frame
sampling over binary media columns (codec stubbed, Spark path real)."""

from __future__ import annotations

import hashlib

import pytest

from kafka_connect_ftp_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    Codec,
    FakeCodec,
    image_features,
    media_meta,
    sample_frames,
)


@pytest.fixture
def media(spark):
    rows = [
        (1, "image", "image/jpeg", b"\xff\xd8fake-jpeg-bytes"),
        (2, "image", "image/png", b"\x89PNGfake-png-bytes-longer"),
        (3, "video", "video/mp4", bytes(range(200))),
        (4, "audio", "audio/wav", b"RIFFfake"),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_media_meta_pure_columns(media):
    rows = {r.media_id: r for r in media_meta(media).collect()}
    assert rows[1].n_bytes == len(b"\xff\xd8fake-jpeg-bytes")
    assert rows[3].sha256 == hashlib.sha256(bytes(range(200))).hexdigest()
    assert set(rows) == {1, 2, 3, 4}


def test_image_features_only_images(media):
    rows = {r.media_id: r for r in image_features(media).collect()}
    assert set(rows) == {1, 2}
    fake = FakeCodec()
    w, h = fake.image_dims(b"\xff\xd8fake-jpeg-bytes")
    assert (rows[1].width, rows[1].height) == (w, h)
    assert rows[1].phash == hashlib.md5(b"\xff\xd8fake-jpeg-bytes").hexdigest()[:16]


def test_frame_sampling_one_to_n(media):
    rows = sample_frames(media, every_n=2).collect()
    assert {r.media_id for r in rows} == {3}
    frames = sorted((r.frame_no, bytes(r.frame)) for r in rows)
    src = bytes(range(200))
    assert frames == [(i, src[j : j + 16]) for i, j in enumerate(range(0, 200, 32))]


def test_real_codec_interface_raises(media):
    with pytest.raises(Exception, match="not available|NotImplemented"):
        image_features(media, codec=Codec()).collect()
