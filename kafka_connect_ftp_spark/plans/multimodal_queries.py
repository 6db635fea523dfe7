"""Oracle-checked slice of the multimodal surface: the codec-free binary
metadata path (bytes → length/digests) over documents' UTF-8 bodies as
stand-in blobs, plus the RESIZE PLUMBING: ``resize_images`` runs its
real Arrow-batched mapInPandas path with the deterministic ``FakeCodec``
whose output stamp (magic + big-endian target dims + sha256-prefix of
the source) the oracle re-derives byte-for-byte in SQL — so the batch
shape, schema and quarantine wiring sit inside the hash gate even
though a real pixel codec is not in this container. Round 6: TWO target
sizes (the stamp must actually vary with the requested dims, not just
echo one constant) and an injected NULL-content row so the per-row
quarantine column (``resize_error``) is value-checked in the hash too.
The remaining codec-dependent operators (image_features dims,
sample_frames) have no SQL equivalent and are covered by pytest
(tests/test_multimodal.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_ftp_spark.plans import register
from kafka_connect_ftp_spark.session import load_tables

_RS_W = _RS_H = 224  # 0x000000E0 big-endian
_RS2_W, _RS2_H = 64, 48  # 0x00000040 / 0x00000030 big-endian
_MAGIC_HEX = "46414B45494D4731"  # 'FAKEIMG1'


@register(
    "multimodal_binary_meta",
    f"""
    WITH media AS (
      SELECT doc_id, text FROM documents
      UNION ALL SELECT CAST(-1 AS BIGINT), NULL  -- corrupt blob: quarantined, never a task failure
    )
    SELECT doc_id AS media_id,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           md5(text) AS md5, sha256(text) AS sha256,
           CASE WHEN text IS NULL THEN NULL ELSE
             '{_MAGIC_HEX}' || '000000E0' || '000000E0'
               || upper(substr(sha256(text), 1, 32)) END AS resize_hex,
           CASE WHEN text IS NULL THEN NULL ELSE
             '{_MAGIC_HEX}' || '00000040' || '00000030'
               || upper(substr(sha256(text), 1, 32)) END AS resize2_hex,
           CASE WHEN text IS NULL THEN 'null content' END AS resize_error
    FROM media ORDER BY media_id
    """,
    doc="Binary-column metadata (octet length + md5/sha256 digests — the "
    "typed-metadata half of the multimodal design, no Python in the path) "
    "plus the hex of the real resize_images output at TWO targets "
    "(224x224 and 64x48 — the FakeCodec stamp embeds the requested dims, "
    "so both resolutions are value-checked against a SQL re-derivation) "
    "and the quarantine column for an injected NULL-content row.",
)
def multimodal_binary_meta(spark, sf_dir):
    from kafka_connect_ftp_spark.operators.multimodal import media_meta, resize_images

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.col("text").cast("binary").alias("content"),
    ).unionByName(
        spark.range(1).select(
            F.lit(-1).cast("long").alias("media_id"),
            F.lit("image").alias("kind"),
            F.lit(None).cast("binary").alias("content"),
        )
    )
    resized = resize_images(media, _RS_W, _RS_H).select(
        "media_id", F.hex("resized").alias("resize_hex"), "resize_error"
    )
    resized2 = resize_images(media, _RS2_W, _RS2_H).select(
        "media_id", F.hex("resized").alias("resize2_hex")
    )
    return (
        media_meta(media)
        .select("media_id", "n_bytes", "md5", "sha256")
        .join(resized, "media_id")
        .join(resized2, "media_id")
        .select(
            "media_id", "n_bytes", "md5", "sha256",
            "resize_hex", "resize2_hex", "resize_error",
        )
        .orderBy("media_id")
    )
