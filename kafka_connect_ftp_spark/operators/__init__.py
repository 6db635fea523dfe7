"""Reusable operator APIs beyond the named query plans."""

from kafka_connect_ftp_spark.operators import multimodal  # noqa: F401
