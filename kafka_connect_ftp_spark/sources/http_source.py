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
  pulls ONE record out of a 1 GB archive object;
- ``incremental_fetch`` turns the one-shot pull into the reference's
  poll loop: re-polling a growing manifest fetches only URLs not yet
  successfully fetched, with versioned crash-atomic state, a per-tick
  cap with natural carry-over, and delivery-before-commit ordering.

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
from pyspark.sql import functions as F

from kafka_connect_ftp_spark.hadoop_fs import committed_versions, prune_versions
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
        route: bool = True,
    ) -> DataFrame:
        """One row per manifest URL: ``(url, status, content, length,
        fetched_at, attempts, fetch_error)``. With ``offset_col`` /
        ``length_col`` (both or neither), each row GETs only its
        ``Range: bytes=offset..offset+length-1`` window.

        ``route=False`` skips the hash repartition for a caller that has
        ALREADY spread the manifest across tasks (``incremental_fetch``
        routes once, upstream of its dedup/state join, so the whole tick
        pays one exchange) — results are identical either way, only the
        row-to-task placement differs."""
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
                        # reset per attempt (review 9b): a 503 from
                        # attempt 1 must not survive as the recorded
                        # status of a final attempt that timed out with
                        # no HTTP response at all
                        status = None
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
        out = frame.select(*cols)
        if route:
            out = out.repartition(self.fetch_partitions, *cols)
        return out.mapInPandas(fetch_partition, _FETCH_SCHEMA)


_STATE_SCHEMA = "url string, ok boolean, attempts int, fetched_at double"


def load_fetch_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """Per-URL fetch outcomes from the latest committed state version
    (empty frame before the first tick)."""
    versions = committed_versions(spark, state_dir)
    if not versions:
        return spark.createDataFrame([], _STATE_SCHEMA)
    return spark.read.schema(_STATE_SCHEMA).parquet(f"{state_dir}/v{versions[-1]:06d}")


def incremental_fetch(
    spark: SparkSession,
    source: HttpManifestSource,
    manifest,
    state_dir: str,
    *,
    refetch_failed: bool = True,
    max_urls_per_tick: int | None = None,
    keep_versions: int = 2,
    sink=None,
    epoch: int | None = None,
) -> DataFrame:
    """One poll tick over a GROWING manifest: fetch only URLs the state
    does not already record as successfully fetched — the reference's
    per-file change detection (``requiresFetch``; SURVEY §2 S4/F2)
    applied to the HTTP source, where the only observable metadata is
    the URL itself (crawl manifests like ``warc.paths`` are
    append-only, so "new URL" IS the change signal).

    Semantics mirror ``ingest/pipeline.poll``:

    - ``refetch_failed=True`` retries URLs whose last tick quarantined
      (``ok`` false); ``False`` dead-letters them (state still records
      the failure for audit).
    - ``max_urls_per_tick`` bounds a tick (the reference's poll-size
      limit, L1); unfetched URLs are naturally carried over because
      only fetched outcomes enter the state. Under the cap,
      NEVER-ATTEMPTED URLs take priority over quarantine retries — a
      handful of permanently-failing URLs would otherwise refill every
      capped tick and starve new manifest entries forever.
    - delivery-before-commit: the optional ``sink(frame, epoch)`` runs
      BEFORE the state commit, so a delivery failure leaves state
      untouched and the next tick re-derives the same delta —
      at-least-once (T5, Connect's offsets-after-produce ordering).
      ``epoch`` defaults to the state version being committed, so an
      epoch-keyed sink (idempotent parquet, ``wds.make_wds_sink``)
      gets a FRESH key every tick — a constant would make each tick
      overwrite the previous delivery.
    - state is one row per URL, latest outcome wins, committed as a new
      ``_SUCCESS``-versioned dir (crash-atomic, see hadoop_fs.py) and
      pruned to ``keep_versions``.

    The tick's frame is localCheckpoint-ed once so the sink, the
    returned frame, and the state all see the SAME fetch outcomes
    (bodies spill MEMORY_AND_DISK; size ticks with ``max_urls_per_tick``
    so a tick fits the cluster's storage). Returns the materialized
    fetched frame for this tick (may be empty)."""
    keep_versions = max(2, keep_versions)
    # ONE version listing per tick: state read, next version, and the
    # sink's default epoch all derive from it (prune re-lists for its
    # own safety check)
    versions = committed_versions(spark, state_dir)
    if versions:
        state = spark.read.schema(_STATE_SCHEMA).parquet(f"{state_dir}/v{versions[-1]:06d}")
    else:
        state = spark.createDataFrame([], _STATE_SCHEMA)
    next_v = (versions[-1] if versions else 0) + 1
    # an empty manifest is a normal poll-tick state (crawl not published
    # yet), not the one-shot fetch's usage error. Materialize ONCE
    # (review 9b): the emptiness check would otherwise drain a
    # generator manifest before _manifest_frame consumed it again
    if not isinstance(manifest, DataFrame):
        manifest = list(manifest)
    if not isinstance(manifest, DataFrame) and not manifest:
        man = spark.createDataFrame([], "url string")
    else:
        man = source._manifest_frame(spark, manifest).select("url")
    # route ONCE, upstream (round 13): hash-partitioning the manifest by
    # url into the fetch partition count first lets the dedup aggregate
    # reuse that exchange (same clustering) and lets fetch() skip its own
    # repartition — the uncapped tick derivation pays ONE shuffle where
    # it paid two (dedup at spark.sql.shuffle.partitions + re-route). The
    # capped branch's TakeOrdered collapses partitioning anyway, so it
    # keeps the in-fetch route.
    pre_routed = max_urls_per_tick is None
    if pre_routed:
        man = man.repartition(source.fetch_partitions, "url")
    man = man.dropDuplicates(["url"])
    attempted = state.select("url", "ok")
    cand = man.join(attempted, "url", "left")
    keep_cond = F.col("ok").isNull() if not refetch_failed else (
        F.col("ok").isNull() | ~F.col("ok")
    )
    todo = cand.filter(keep_cond)
    if max_urls_per_tick is not None:
        if max_urls_per_tick < 1:
            raise ValueError(f"max_urls_per_tick must be >= 1, got {max_urls_per_tick}")
        # never-attempted first (ok NULL sorts with the flag below), url
        # tie-break for determinism; orderBy+limit compiles to a bounded
        # TakeOrdered, never a full manifest sort
        todo = todo.orderBy(F.col("ok").isNotNull(), "url").limit(max_urls_per_tick)
    todo = todo.select("url")
    fetched = source.fetch(spark, todo, route=not pre_routed).localCheckpoint()
    if fetched.isEmpty():
        # idle tick (review 9b): nothing new fetched — the state is
        # unchanged, so skip the wholesale rewrite + version flip an
        # idle tick would otherwise pay on every poll (a full state
        # read+write at 10^7 tracked URLs), and skip the sink (an
        # empty epoch append adds nothing). Checking the CHECKPOINTED
        # result is free; a pre-fetch todo.isEmpty() would execute the
        # manifest-state join twice per busy tick.
        return fetched
    if sink is not None:
        sink(fetched, next_v if epoch is None else epoch)
    tick = fetched.select(
        "url", F.col("fetch_error").isNull().alias("ok"), "attempts", "fetched_at"
    )
    # broadcast the TICK side of the anti-join (round 13): the
    # checkpointed tick frame carries no stats, so the planner assumed
    # it huge and sort-merge-joined — shuffling the WHOLE accumulated
    # state (the unbounded side: every URL ever tracked) to anti-join a
    # bounded delta. The tick is the small side by construction: it
    # holds only this poll's newly-fetched URLs (production ticks are
    # capped via max_urls_per_tick); state now streams exchange-free.
    new_state = state.join(F.broadcast(tick), "url", "left_anti").unionByName(tick)
    new_state.write.mode("overwrite").parquet(f"{state_dir}/v{next_v:06d}")
    prune_versions(spark, state_dir, current=next_v, keep=keep_versions)
    return fetched


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
    return parse_warc_fetches(source.fetch(spark, manifest))


def parse_warc_fetches(fetched: DataFrame) -> DataFrame:
    """Parse a fetched-archives frame (``HttpManifestSource.fetch`` /
    ``incremental_fetch`` output) into the WARC records frame — exposed
    separately so incremental poll ticks compose:
    ``parse_warc_fetches(incremental_fetch(...))`` parses ONLY the
    tick's new archives. Map-side, bytes never shuffle; fetch failures
    and empty bodies become quarantine rows."""
    from kafka_connect_ftp_spark.ingest.warc import _records_for_file, _SCHEMA

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
