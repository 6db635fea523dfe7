"""HTTP manifest source (sources/http_source.py): distributed fetch over
a fake opener (the test_ftp_source fake-transport convention), retry
with backoff, quarantine on permanent failure, Range windows, and the
WARC-over-HTTP composition."""

from __future__ import annotations

import gzip

import pytest
from pyspark.sql import functions as F

from kafka_connect_ftp_spark.sources.http_source import (
    HttpManifestSource,
    read_warc_manifest,
)

BODIES = {f"https://host.example/f{i}": f"body-{i}".encode() * (i + 1) for i in range(10)}


def _fake_opener(bodies, fail_counts=None):
    """Picklable-by-cloudpickle closure: serves ``bodies``; URLs in
    ``fail_counts`` raise that many times before succeeding (-1 =
    always). Honors Range headers like a real object store."""
    fail_counts = dict(fail_counts or {})
    seen: dict[str, int] = {}

    def opener(url, headers, timeout):
        n = seen.get(url, 0)
        seen[url] = n + 1
        want_fail = fail_counts.get(url, 0)
        if want_fail == -1 or n < want_fail:
            raise OSError(f"synthetic failure #{n} for {url}")
        body = bodies[url]
        rng = headers.get("Range")
        if rng:
            lo, hi = rng.removeprefix("bytes=").split("-")
            return 206, body[int(lo) : int(hi) + 1]
        return 200, body

    return opener


def test_fetch_manifest_list_happy_path(spark):
    src = HttpManifestSource(fetch_partitions=3, opener=_fake_opener(BODIES))
    rows = {r.url: r for r in src.fetch(spark, list(BODIES)).collect()}
    assert set(rows) == set(BODIES)
    for url, body in BODIES.items():
        r = rows[url]
        assert bytes(r.content) == body and r.length == len(body)
        assert r.status == 200 and r.attempts == 1 and r.fetch_error is None


def test_retry_with_backoff_then_success(spark):
    url = "https://host.example/f3"
    src = HttpManifestSource(
        retries=3, backoff_step=0.01, backoff_cap=0.02,
        opener=_fake_opener(BODIES, fail_counts={url: 2}),
    )
    rows = {r.url: r for r in src.fetch(spark, list(BODIES)).collect()}
    assert rows[url].attempts == 3 and rows[url].fetch_error is None
    assert bytes(rows[url].content) == BODIES[url]
    assert all(r.attempts == 1 for u, r in rows.items() if u != url)


def test_permanent_failure_quarantines_row_not_scan(spark):
    dead = "https://host.example/f5"
    src = HttpManifestSource(
        retries=1, backoff_step=0.01,
        opener=_fake_opener(BODIES, fail_counts={dead: -1}),
    )
    rows = {r.url: r for r in src.fetch(spark, list(BODIES)).collect()}
    assert rows[dead].content is None and rows[dead].attempts == 2
    assert "synthetic failure" in rows[dead].fetch_error
    assert sum(1 for r in rows.values() if r.fetch_error is None) == 9


def test_range_windows_fetch_byte_slices(spark):
    src = HttpManifestSource(opener=_fake_opener(BODIES))
    manifest = spark.createDataFrame(
        [("https://host.example/f4", 5, 7), ("https://host.example/f4", 0, 4)],
        "url string, off long, ln long",
    )
    got = sorted(
        (r.status, bytes(r.content))
        for r in src.fetch(spark, manifest, offset_col="off", length_col="ln").collect()
    )
    body = BODIES["https://host.example/f4"]
    assert got == sorted([(206, body[5:12]), (206, body[0:4])])


def test_warc_over_http_composition(spark):
    from tests.test_warc import _http, _record

    rec = _record("response", _http(b"crawled body"), uri="http://w.example/a", rid="<urn:uuid:w>")
    bodies = {
        "https://data.example/a.warc": rec,
        "https://data.example/b.warc.gz": gzip.compress(rec),
        "https://data.example/dead.warc": b"",
    }
    src = HttpManifestSource(
        retries=0, opener=_fake_opener(bodies, fail_counts={"https://data.example/dead.warc": -1})
    )
    records = read_warc_manifest(spark, src, list(bodies)).collect()
    ok = [r for r in records if r.decode_error is None]
    assert len(ok) == 2 and all(bytes(r.payload) == b"crawled body" for r in ok)
    assert {r.src_file for r in ok} == {
        "https://data.example/a.warc", "https://data.example/b.warc.gz",
    }
    dead = [r for r in records if r.decode_error is not None]
    assert len(dead) == 1 and "synthetic failure" in dead[0].decode_error

    from kafka_connect_ftp_spark.ingest.warc import warc_to_corpus

    docs = warc_to_corpus(
        read_warc_manifest(spark, src, list(bodies))
    ).collect()
    assert {r.text for r in docs} == {"crawled body"}
    assert {r.source for r in docs} == {"w.example"}


def test_validation(spark):
    src = HttpManifestSource(opener=_fake_opener(BODIES))
    with pytest.raises(ValueError, match="empty manifest"):
        src.fetch(spark, [])
    with pytest.raises(ValueError, match="'url' column"):
        src.fetch(spark, spark.createDataFrame([(1,)], "x long"))
    with pytest.raises(ValueError, match="together"):
        src.fetch(spark, list(BODIES), offset_col="off")
    with pytest.raises(ValueError, match="fetch_partitions"):
        HttpManifestSource(fetch_partitions=0)
    with pytest.raises(ValueError, match="retries"):
        HttpManifestSource(retries=-1)


def _http_error_opener(bodies, dead):
    """Raises urllib-style HTTPError (has .code) for URLs in ``dead``."""

    def opener(url, headers, timeout):
        import urllib.error

        if url in dead:
            raise urllib.error.HTTPError(url, dead[url], "synthetic", None, None)
        return 200, bodies[url]

    return opener


def test_permanent_4xx_short_circuits_and_records_status(spark):
    gone = "https://host.example/f2"
    src = HttpManifestSource(
        retries=5, backoff_step=0.01, sleep=lambda _s: None,
        opener=_http_error_opener(BODIES, {gone: 404}),
    )
    rows = {r.url: r for r in src.fetch(spark, list(BODIES)).collect()}
    # a 404 is permanent: ONE attempt, no retry burn, and the HTTP code
    # lands in `status` so downstream can tell it from a timeout
    assert rows[gone].attempts == 1 and rows[gone].status == 404
    assert rows[gone].content is None and "404" in rows[gone].fetch_error


def test_retryable_429_still_retries(spark):
    busy = "https://host.example/f6"
    src = HttpManifestSource(
        retries=2, backoff_step=0.01, sleep=lambda _s: None,
        opener=_http_error_opener(BODIES, {busy: 429}),
    )
    rows = {r.url: r for r in src.fetch(spark, list(BODIES)).collect()}
    assert rows[busy].attempts == 3 and rows[busy].status == 429


def test_empty_200_body_is_quarantined_not_dropped(spark):
    bodies = {"https://data.example/empty.warc": b""}
    src = HttpManifestSource(retries=0, opener=_fake_opener(bodies))
    records = read_warc_manifest(spark, src, list(bodies)).collect()
    # the URL must surface as a decode_error row, not silently vanish
    assert len(records) == 1 and records[0].decode_error == "empty body"
    assert records[0].src_file == "https://data.example/empty.warc"


def test_range_mode_partitions_on_full_key_not_just_url(spark):
    src = HttpManifestSource(fetch_partitions=4, opener=_fake_opener(BODIES))
    body = BODIES["https://host.example/f9"]
    manifest = spark.createDataFrame(
        [("https://host.example/f9", i * 4, 4) for i in range(8)],
        "url string, off long, ln long",
    )
    fetched = src.fetch(spark, manifest, offset_col="off", length_col="ln")
    # plan pin: the exchange hashes on (url, off, ln) — url-only would
    # collapse all windows of one archive onto a single sequential task
    plan = fetched._jdf.queryExecution().optimizedPlan().toString()
    repart = [ln for ln in plan.splitlines() if "RepartitionByExpression" in ln]
    assert repart and "off" in repart[0] and "ln" in repart[0]
    got = sorted(bytes(r.content) for r in fetched.collect())
    assert got == sorted(body[i * 4 : i * 4 + 4] for i in range(8))


# -- incremental manifest polling ---------------------------------------------


def test_incremental_fetch_only_new_urls(spark, tmp_path):
    from kafka_connect_ftp_spark.sources.http_source import incremental_fetch

    state_dir = str(tmp_path / "state")
    src = HttpManifestSource(opener=_fake_opener(BODIES))
    urls = sorted(BODIES)
    t1 = incremental_fetch(spark, src, urls[:4], state_dir)
    assert {r.url for r in t1.collect()} == set(urls[:4])
    # manifest grows: only the three new URLs fetch
    t2 = incremental_fetch(spark, src, urls[:7], state_dir)
    assert {r.url for r in t2.collect()} == set(urls[4:7])
    # nothing new: empty tick
    assert incremental_fetch(spark, src, urls[:7], state_dir).count() == 0


def test_incremental_fetch_failed_url_policy(spark, tmp_path):
    from kafka_connect_ftp_spark.sources.http_source import incremental_fetch

    state_dir = str(tmp_path / "state")
    dead = "https://host.example/f1"
    src = HttpManifestSource(
        retries=0, opener=_fake_opener(BODIES, fail_counts={dead: -1})
    )
    t1 = incremental_fetch(spark, src, sorted(BODIES)[:3], state_dir)
    assert {r.url for r in t1.collect() if r.fetch_error is not None} == {dead}
    # default: the quarantined URL is retried next tick
    t2 = incremental_fetch(spark, src, sorted(BODIES)[:3], state_dir)
    assert {r.url for r in t2.collect()} == {dead}
    # dead-letter policy: skip it
    t3 = incremental_fetch(spark, src, sorted(BODIES)[:3], state_dir, refetch_failed=False)
    assert t3.count() == 0


def test_incremental_fetch_tick_cap_carries_over(spark, tmp_path):
    from kafka_connect_ftp_spark.sources.http_source import incremental_fetch

    state_dir = str(tmp_path / "state")
    src = HttpManifestSource(opener=_fake_opener(BODIES))
    urls = sorted(BODIES)[:5]
    got = set()
    for _ in range(3):
        got |= {r.url for r in incremental_fetch(
            spark, src, urls, state_dir, max_urls_per_tick=2
        ).collect()}
    assert len(got) == 5  # 2 + 2 + 1: the cap never loses a URL
    assert incremental_fetch(spark, src, urls, state_dir, max_urls_per_tick=2).count() == 0


def test_incremental_fetch_delivery_before_commit(spark, tmp_path):
    from kafka_connect_ftp_spark.sources.http_source import incremental_fetch

    state_dir = str(tmp_path / "state")
    src = HttpManifestSource(opener=_fake_opener(BODIES))
    urls = sorted(BODIES)[:2]

    def bad_sink(frame, epoch):
        raise RuntimeError("delivery failed")

    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="delivery failed"):
        incremental_fetch(spark, src, urls, state_dir, sink=bad_sink)
    # state did not advance: the next tick re-delivers the same delta
    delivered = []
    t2 = incremental_fetch(
        spark, src, urls, state_dir, sink=lambda f, e: delivered.append(f.count())
    )
    assert {r.url for r in t2.collect()} == set(urls) and delivered == [2]


def test_incremental_fetch_prunes_state_versions(spark, tmp_path):
    from kafka_connect_ftp_spark.sources.http_source import incremental_fetch

    state_dir = tmp_path / "state"
    src = HttpManifestSource(opener=_fake_opener(BODIES))
    urls = sorted(BODIES)
    for i in range(4):
        incremental_fetch(spark, src, urls[: i + 1], str(state_dir))
    versions = sorted(p.name for p in state_dir.iterdir() if p.name.startswith("v"))
    assert versions == ["v000003", "v000004"]


def test_incremental_tick_composes_with_warc_parse(spark, tmp_path):
    from tests.test_warc import _http, _record
    from kafka_connect_ftp_spark.sources.http_source import (
        incremental_fetch,
        parse_warc_fetches,
    )

    rec_a = _record("response", _http(b"first body"), uri="http://w.example/a")
    rec_b = _record("response", _http(b"second body"), uri="http://w.example/b")
    bodies = {"https://d.example/a.warc": rec_a}
    src = HttpManifestSource(opener=_fake_opener(bodies))
    state = str(tmp_path / "state")
    t1 = parse_warc_fetches(incremental_fetch(spark, src, list(bodies), state))
    assert [bytes(r.payload) for r in t1.collect()] == [b"first body"]
    # the manifest grows: only the NEW archive is fetched and parsed
    grown = dict(bodies, **{"https://d.example/b.warc": rec_b})
    src2 = HttpManifestSource(opener=_fake_opener(grown))
    t2 = parse_warc_fetches(incremental_fetch(spark, src2, list(grown), state))
    rows = t2.collect()
    assert [bytes(r.payload) for r in rows] == [b"second body"]
    assert rows[0].src_file == "https://d.example/b.warc"


def test_incremental_fetch_matches_pure_python_model(spark, tmp_path):
    """Model-based check: random manifest growth + failure schedules.
    The pure-Python model tracks which URLs SHOULD be fetched per tick
    (never fetched OR failed-last-outcome when refetching); the operator
    must deliver exactly that set every tick."""
    import random

    from kafka_connect_ftp_spark.sources.http_source import incremental_fetch

    rng = random.Random(42)
    urls = [f"https://h.example/u{i}" for i in range(12)]
    for trial in range(3):
        state_dir = str(tmp_path / f"state{trial}")
        model_ok: set[str] = set()
        manifest_n = rng.randint(1, 4)
        for tick in range(4):
            manifest = urls[:manifest_n]
            failing = {u for u in manifest if rng.random() < 0.3}
            refetch = rng.random() < 0.5
            bodies = {u: f"body {u}".encode() for u in manifest}
            src = HttpManifestSource(
                retries=0,
                opener=_fake_opener(bodies, fail_counts={u: -1 for u in failing}),
            )
            got = {
                r.url: r.fetch_error is None
                for r in incremental_fetch(
                    spark, src, manifest, state_dir, refetch_failed=refetch
                ).collect()
            }
            # the model: URLs in the manifest not yet ok, minus (when not
            # refetching) URLs whose last outcome is recorded as failed
            expected = {u for u in manifest if u not in model_ok}
            if not refetch:
                expected -= model_seen_failed if tick else set()
            assert set(got) == expected, f"trial {trial} tick {tick}"
            for u, ok in got.items():
                if ok:
                    model_ok.add(u)
            model_seen_failed = {
                u for u in (model_seen_failed if tick else set()) | set(got)
                if u not in model_ok
            }
            manifest_n = min(len(urls), manifest_n + rng.randint(0, 3))


def test_capped_tick_prioritizes_new_urls_over_failed_retries(spark, tmp_path):
    from kafka_connect_ftp_spark.sources.http_source import incremental_fetch

    state_dir = str(tmp_path / "state")
    urls = sorted(BODIES)
    dead = set(urls[:2])
    src = HttpManifestSource(
        retries=0, opener=_fake_opener(BODIES, fail_counts={u: -1 for u in dead})
    )
    # tick 1: the two dead URLs fail
    incremental_fetch(spark, src, urls[:2], state_dir)
    # the manifest grows; capped ticks must fetch the NEW urls first
    # instead of refilling every tick with the same failing retries
    fetched = set()
    for _ in range(4):
        fetched |= {
            r.url
            for r in incremental_fetch(
                spark, src, urls, state_dir, max_urls_per_tick=2
            ).collect()
            if r.fetch_error is None
        }
    assert fetched == set(urls) - dead  # every new URL landed despite the cap


def test_empty_manifest_is_an_empty_tick_not_an_error(spark, tmp_path):
    from kafka_connect_ftp_spark.sources.http_source import incremental_fetch

    src = HttpManifestSource(opener=_fake_opener(BODIES))
    out = incremental_fetch(spark, src, [], str(tmp_path / "state"))
    assert out.count() == 0


def test_sink_epoch_defaults_to_the_state_version(spark, tmp_path):
    from kafka_connect_ftp_spark.sources.http_source import incremental_fetch

    state_dir = str(tmp_path / "state")
    src = HttpManifestSource(opener=_fake_opener(BODIES))
    urls = sorted(BODIES)
    epochs = []
    incremental_fetch(spark, src, urls[:2], state_dir, sink=lambda f, e: epochs.append(e))
    incremental_fetch(spark, src, urls[:4], state_dir, sink=lambda f, e: epochs.append(e))
    # a fresh epoch per tick: an epoch-keyed sink never overwrites the
    # previous tick's delivery
    assert epochs == [1, 2]


def test_incremental_fetch_review_9b_fixes(spark, tmp_path):
    """Review 9b: (a) a GENERATOR manifest must not be drained by the
    emptiness check before the frame build consumes it; (b) an idle
    tick leaves the state untouched — no new version dir, no pruning
    churn; (c) a stale HTTP status from an earlier retry attempt never
    attaches to a final failure that carried no code."""
    from kafka_connect_ftp_spark.sources.http_source import (
        committed_versions,
        incremental_fetch,
    )

    state_dir = str(tmp_path / "state")
    src = HttpManifestSource(opener=_fake_opener(BODIES))
    urls = sorted(BODIES)[:3]
    # (a) generator manifest
    t1 = incremental_fetch(spark, src, (u for u in urls), state_dir)
    assert {r.url for r in t1.collect()} == set(urls)
    v_after_t1 = committed_versions(spark, state_dir)
    # (b) idle tick: same manifest again -> empty frame, SAME versions
    sink_calls = []
    t2 = incremental_fetch(
        spark, src, urls, state_dir, sink=lambda df, e: sink_calls.append(e)
    )
    assert t2.count() == 0
    assert committed_versions(spark, state_dir) == v_after_t1
    assert sink_calls == []  # empty epoch appends are skipped too

    # (c) attempt 1 raises with .code 503 (retryable), attempt 2 raises
    # a plain timeout with NO code: the recorded status must be NULL,
    # not the dead 503
    class _FlipFail:
        def __init__(self):
            self.n = 0

        def __call__(self, url, headers, timeout):
            self.n += 1
            if self.n == 1:
                e = OSError("server error")
                e.code = 503
                raise e
            raise TimeoutError("timed out")

    flip = HttpManifestSource(
        opener=_FlipFail(), retries=1, fetch_partitions=1, sleep=lambda s: None
    )
    row = flip.fetch(spark, ["https://host.example/x"]).collect()[0]
    assert row.fetch_error and "TimeoutError" in row.fetch_error
    assert row.status is None and row.attempts == 2
