"""Oracle-checked slice of the multimodal surface: the codec-free binary
metadata path (bytes → length/digests) over documents' UTF-8 bodies as
stand-in blobs, plus the RESIZE PLUMBING: ``resize_images`` runs its
real Arrow-batched mapInPandas path with the deterministic ``FakeCodec``
whose output stamp (magic + big-endian target dims + sha256-prefix of
the source) the oracle re-derives byte-for-byte in SQL — so the batch
shape, schema and quarantine wiring sit inside the hash gate even
though a real pixel codec is not in this container. The remaining
codec-dependent operators (image_features dims, sample_frames) have no
SQL equivalent and are covered by pytest (tests/test_multimodal.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_ftp_spark.plans import register
from kafka_connect_ftp_spark.session import load_tables

_RS_W = _RS_H = 224  # 0x000000E0 big-endian
_MAGIC_HEX = "46414B45494D4731"  # 'FAKEIMG1'


@register(
    "multimodal_binary_meta",
    f"""
    SELECT doc_id AS media_id,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           md5(text) AS md5, sha256(text) AS sha256,
           '{_MAGIC_HEX}' || '000000E0' || '000000E0'
             || upper(substr(sha256(text), 1, 32)) AS resize_hex
    FROM documents ORDER BY media_id
    """,
    doc="Binary-column metadata (octet length + md5/sha256 digests — the "
    "typed-metadata half of the multimodal design, no Python in the path) "
    "plus the hex of the real resize_images output at 224x224: the "
    "FakeCodec stamp is deterministic, so the Arrow-batched resize "
    "plumbing is value-checked against a SQL re-derivation.",
)
def multimodal_binary_meta(spark, sf_dir):
    from kafka_connect_ftp_spark.operators.multimodal import media_meta, resize_images

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.col("text").cast("binary").alias("content"),
    )
    resized = resize_images(media, _RS_W, _RS_H).select(
        "media_id", F.hex("resized").alias("resize_hex")
    )
    return (
        media_meta(media)
        .select("media_id", "n_bytes", "md5", "sha256")
        .join(resized, "media_id")
        .orderBy("media_id")
    )
