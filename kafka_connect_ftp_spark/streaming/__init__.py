"""Structured Streaming layer: the reference's poll loop as streaming
queries (SURVEY.md §2.8), plus streaming variants of the analytics ops."""

from kafka_connect_ftp_spark.streaming.backoff import ExponentialBackOff  # noqa: F401
from kafka_connect_ftp_spark.streaming.ingest_stream import StreamingIngest  # noqa: F401
