"""HTTP(S) manifest fetch source: the HTTP analog of the FTP ingestion
core (``sources/ftp.py``) for pulling remote file sets — the access
path of real crawl corpora (Common Crawl publishes WARC archives as
HTTPS objects listed in path manifests).

``HttpManifestSource`` takes a MANIFEST — a list of URLs, or a frame
with a ``url`` column (e.g. the parsed ``warc.paths`` file of a crawl)
— and fetches the bodies on executors:

- the driver never downloads anything (it only distributes URL strings);
- manifest rows hash-partition on their full key (url, or url+offset+
  length in Range mode — so many windows of ONE archive still spread)
  across ``fetch_partitions`` tasks, each making sequential GETs over
  its own ``urllib`` opener — parallelism is the partition count, the
  FTP source's connection-per-partition shape;
- per-URL failures follow the quarantine convention: after ``retries``
  attempts (``streaming/backoff.py``'s ExponentialBackOff, the
  reference's reconnect policy) the row flows with ``fetch_error`` set
  and NULL content — one dead URL never kills a 10k-file pull.
  Permanent 4xx statuses (all but 408/429) short-circuit the retry loop
  and land in the ``status`` column so 404 is distinguishable from a
  timeout;
- optional ``Range`` support fetches byte windows (``offset_col`` /
  ``length_col``), which is exactly how a columnar-index crawl read
  pulls ONE record out of a 1 GB archive object.

Testability: ``opener`` injects the URL-opening callable; tests use an
in-memory fake (the fake-transport convention of test_ftp_source.py —
the sandbox has no network, production uses the default
``urllib.request.urlopen``).
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from kafka_connect_ftp_spark.streaming.backoff import ExponentialBackOff

# 4xx responses are permanent (the server answered; asking again cannot
# change the answer) EXCEPT 408 request-timeout and 429 too-many-requests,
# which are the two retryable client codes
_RETRYABLE_4XX = {408, 429}

_FETCH_SCHEMA = (
    "url string, status int, content binary, length long,"
    " fetched_at double, attempts int, fetch_error string"
)


def _default_opener(url: str, headers: dict[str, str], timeout: float):
    import urllib.request

    req = urllib.request.Request(url, headers=headers)
    with urllib.request.urlopen(req, timeout=timeout) as resp:  # noqa: S310
        return resp.status, resp.read()


class HttpManifestSource:
    """Distributed GET over a URL manifest. See module doc."""

    def __init__(
        self,
        *,
        fetch_partitions: int = 8,
        retries: int = 2,
        backoff_step: float = 0.2,
        backoff_cap: float = 5.0,
        timeout: float = 30.0,
        headers: dict[str, str] | None = None,
        opener: Callable[[str, dict[str, str], float], tuple[int, bytes]] | None = None,
        sleep: Callable[[float], None] = time.sleep,
    ) -> None:
        if fetch_partitions < 1:
            raise ValueError(f"fetch_partitions must be >= 1, got {fetch_partitions}")
        if retries < 0:
            raise ValueError(f"retries must be >= 0, got {retries}")
        self.fetch_partitions = fetch_partitions
        self.retries = retries
        self.backoff_step = backoff_step
        self.backoff_cap = backoff_cap
        self.timeout = timeout
        self.headers = dict(headers or {})
        self.opener = opener or _default_opener
        self.sleep = sleep

    def _manifest_frame(self, spark: SparkSession, manifest) -> DataFrame:
        if isinstance(manifest, DataFrame):
            if "url" not in manifest.columns:
                raise ValueError(f"manifest frame needs a 'url' column, has {manifest.columns}")
            return manifest
        urls = list(manifest)
        if not urls:
            raise ValueError("empty manifest")
        return spark.createDataFrame([(u,) for u in urls], "url string")

    def fetch(
        self,
        spark: SparkSession,
        manifest,
        *,
        offset_col: str | None = None,
        length_col: str | None = None,
    ) -> DataFrame:
        """One row per manifest URL: ``(url, status, content, length,
        fetched_at, attempts, fetch_error)``. With ``offset_col`` /
        ``length_col`` (both or neither), each row GETs only its
        ``Range: bytes=offset..offset+length-1`` window."""
        if (offset_col is None) != (length_col is None):
            raise ValueError("offset_col and length_col must be passed together")
        frame = self._manifest_frame(spark, manifest)
        cols = ["url"] + ([offset_col, length_col] if offset_col else [])
        src = self

        def fetch_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = []
                for row in pdf.itertuples(index=False):
                    url = row.url
                    headers = dict(src.headers)
                    if offset_col is not None:
                        off = int(getattr(row, offset_col))
                        ln = int(getattr(row, length_col))
                        headers["Range"] = f"bytes={off}-{off + ln - 1}"
                    status, body, err, attempts = None, None, None, 0
                    backoff = ExponentialBackOff(src.backoff_step, src.backoff_cap)
                    for attempt in range(src.retries + 1):
                        attempts = attempt + 1
                        try:
                            status, body = src.opener(url, headers, src.timeout)
                            err = None
                            break
                        except Exception as e:  # noqa: BLE001
                            err = f"{type(e).__name__}: {e}"
                            # keep the HTTP status when the error carries
                            # one (urllib HTTPError.code) so downstream
                            # can tell 404 from a network timeout
                            code = getattr(e, "code", None)
                            if isinstance(code, int):
                                status = code
                                if 400 <= code < 500 and code not in _RETRYABLE_4XX:
                                    break  # permanent: retrying a 404 is pure waste
                            if attempt < src.retries:
                                # min(cap, step * 2^i) — the reference's
                                # ExponentialBackOff policy, reused
                                src.sleep(backoff.interval_seconds)
                                backoff.next_failure()
                    out.append(
                        (
                            url,
                            status,
                            body,
                            len(body) if body is not None else None,
                            time.time(),
                            attempts,
                            err,
                        )
                    )
                yield pd.DataFrame(
                    out,
                    columns=[
                        "url", "status", "content", "length",
                        "fetched_at", "attempts", "fetch_error",
                    ],
                )

        # hash on ALL manifest key columns: in Range-window mode many rows
        # share one url (one archive, many record windows) — partitioning
        # on url alone would collapse them onto a single sequential task
        return (
            frame.select(*cols)
            .repartition(self.fetch_partitions, *cols)
            .mapInPandas(fetch_partition, _FETCH_SCHEMA)
        )


def read_warc_manifest(
    spark: SparkSession,
    source: HttpManifestSource,
    manifest,
) -> DataFrame:
    """Fetch WARC archives over HTTP and parse them into the WARC
    records frame (``ingest/warc.py``): the Common Crawl pull shape —
    ``warc.paths`` manifest → distributed GET → record parse →
    ``warc_to_corpus`` → the whole curation pipeline. Failed fetches
    surface as quarantine rows (``decode_error`` = the fetch error)."""
    from kafka_connect_ftp_spark.ingest.warc import _records_for_file, _SCHEMA

    fetched = source.fetch(spark, manifest)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "src_file", "record_id", "warc_type", "target_uri", "warc_date",
            "http_status", "content_type", "payload", "payload_length",
            "decode_error",
        ]
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                # len == 0 counts as quarantine too: a 200 with an empty
                # body (truncated/placeholder object) must surface as a
                # decode_error row, not silently vanish from the output
                if row.fetch_error is not None or row.content is None or len(row.content) == 0:
                    rows.append(
                        (row.url, None, None, None, None, None, None, None, None,
                         row.fetch_error or "empty body")
                    )
                    continue
                rows.extend(_records_for_file(row.url, bytes(row.content)))
            out = pd.DataFrame(rows, columns=cols)
            out["http_status"] = out["http_status"].astype("Int32")
            out["payload_length"] = out["payload_length"].astype("Int64")
            yield out

    return fetched.mapInPandas(parse, _SCHEMA)
