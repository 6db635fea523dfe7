"""Multimodal plumbing tests: Arrow-batched feature extraction and frame
sampling over binary media columns (codec stubbed, Spark path real)."""

from __future__ import annotations

import hashlib

import pytest

from kafka_connect_ftp_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    Codec,
    FakeCodec,
    HeaderCodec,
    image_features,
    media_meta,
    sample_frames,
)


def make_png(width: int, height: int) -> bytes:
    """A real PNG signature + IHDR chunk (header parsing needs no IDAT)."""
    import struct
    import zlib

    ihdr = struct.pack(">II", width, height) + b"\x08\x02\x00\x00\x00"
    chunk = struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
    chunk += struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
    return b"\x89PNG\r\n\x1a\n" + chunk


def make_jpeg(width: int, height: int) -> bytes:
    """A real JPEG byte stream: SOI, APP0 (JFIF), DQT stub, SOF0."""
    import struct

    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(64)
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 11)
        + b"\x08"
        + struct.pack(">HH", height, width)
        + b"\x01\x01\x11\x00"
    )
    return b"\xff\xd8" + app0 + dqt + sof0


def make_gif(width: int, height: int) -> bytes:
    import struct

    return b"GIF89a" + struct.pack("<HH", width, height) + b"\x00\x00\x00"


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


def test_codec_failures_quarantined_per_row(media):
    # the base Codec raises on every image — rows survive with null dims
    # and the error recorded, never failing the job (a 100 TB scan must
    # not abort on one bad blob)
    rows = image_features(media, codec=Codec()).collect()
    assert rows, "image rows must still come through"
    for r in rows:
        assert r.width is None and r.height is None
        assert "NotImplementedError" in r.decode_error
        assert r.phash is not None  # byte-level features still extracted


def test_null_content_row_quarantined_not_fatal(spark):
    # content is nullable (metadata-only rows): the byte-level feature
    # columns must null out per row instead of escaping the quarantine
    # and aborting the task
    good = make_png(4, 4)
    rows = [(1, "image", "image/png", bytearray(good)), (2, "image", "image/png", None)]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: r for r in image_features(df, codec=HeaderCodec()).collect()}
    assert (got[1].width, got[1].height) == (4, 4)
    assert got[2].n_bytes is None and got[2].phash is None
    assert got[2].width is None


def test_corrupt_image_isolated_next_to_good_one(spark):
    good = make_png(8, 6)
    rows = [
        (1, "image", "image/png", bytearray(good)),
        (2, "image", "image/png", bytearray(good[:20])),  # truncated IHDR
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: r for r in image_features(df, codec=HeaderCodec()).collect()}
    assert (got[1].width, got[1].height, got[1].decode_error) == (8, 6, None)
    assert got[2].width is None and "ValueError" in got[2].decode_error


def test_header_codec_parses_real_formats():
    codec = HeaderCodec()
    assert codec.image_dims(make_png(640, 480)) == (640, 480)
    assert codec.image_dims(make_jpeg(1920, 1080)) == (1920, 1080)
    assert codec.image_dims(make_gif(13, 37)) == (13, 37)
    with pytest.raises(ValueError, match="unsupported"):
        codec.image_dims(b"not an image at all")
    with pytest.raises(ValueError, match="no SOF"):
        codec.image_dims(b"\xff\xd8\xff\xd9")  # SOI+EOI, no frame header


def test_image_features_with_header_codec(spark):
    rows_in = [
        (10, "image", "image/png", make_png(320, 200)),
        (11, "image", "image/jpeg", make_jpeg(800, 600)),
        (12, "video", "video/mp4", bytes(16)),
    ]
    media = spark.createDataFrame(rows_in, MEDIA_SCHEMA)
    rows = {r.media_id: r for r in image_features(media, codec=HeaderCodec()).collect()}
    assert set(rows) == {10, 11}
    assert (rows[10].width, rows[10].height) == (320, 200)
    assert (rows[11].width, rows[11].height) == (800, 600)


def test_resize_deterministic_and_quarantined(spark, media):
    from kafka_connect_ftp_spark.operators.multimodal import resize_images

    out = {r.media_id: r for r in resize_images(media, 224, 224).collect()}
    # only image rows, each resized deterministically
    assert set(out) == {1, 2}
    again = {r.media_id: r for r in resize_images(media, 224, 224).collect()}
    for mid in out:
        assert out[mid].resized == again[mid].resized  # byte-stable
        assert out[mid].width == 224 and out[mid].height == 224
        assert out[mid].resize_error is None
        assert bytes(out[mid].resized)[:8] == b"FAKEIMG1"
    # different targets give different bytes
    other = {r.media_id: r for r in resize_images(media, 64, 64).collect()}
    assert bytes(other[1].resized) != bytes(out[1].resized)


def test_resize_null_content_and_failures_per_row(spark):
    from kafka_connect_ftp_spark.operators.multimodal import Codec, resize_images

    class ExplodingCodec(Codec):
        def resize(self, content, width, height):
            if content == b"bad":
                raise ValueError("boom")
            return b"ok"

    rows = [(1, "image", None, b"good"), (2, "image", None, b"bad"), (3, "image", None, None)]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r.media_id: r for r in resize_images(df, 8, 8, ExplodingCodec()).collect()}
    assert bytes(out[1].resized) == b"ok" and out[1].resize_error is None
    assert out[2].resized is None and "boom" in out[2].resize_error
    assert out[3].resized is None and out[3].resize_error == "null content"


def test_resize_rejects_bad_dims(spark, media):
    from kafka_connect_ftp_spark.operators.multimodal import resize_images

    with pytest.raises(ValueError, match="target dims"):
        resize_images(media, 0, 224)
