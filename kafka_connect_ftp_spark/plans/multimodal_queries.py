"""Oracle-checked slice of the multimodal surface: the codec-free binary
metadata path (bytes → length/digests) over documents' UTF-8 bodies as
stand-in blobs. The codec-dependent operators (image_features,
sample_frames) have no SQL equivalent and are covered by pytest instead
(tests/test_multimodal.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_ftp_spark.plans import register
from kafka_connect_ftp_spark.session import load_tables


@register(
    "multimodal_binary_meta",
    """
    SELECT doc_id AS media_id,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           md5(text) AS md5, sha256(text) AS sha256
    FROM documents ORDER BY media_id
    """,
    doc="Binary-column metadata (octet length + md5/sha256 digests) — the "
    "typed-metadata half of the multimodal design, no Python in the path.",
)
def multimodal_binary_meta(spark, sf_dir):
    from kafka_connect_ftp_spark.operators.multimodal import media_meta

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text").alias("kind"),
        F.col("text").cast("binary").alias("content"),
    )
    return media_meta(media).select("media_id", "n_bytes", "md5", "sha256").orderBy("media_id")
