"""URL/domain blocklist filtering (operators/url_filter.py): host
extraction, registered-domain heuristic, literal and frame blocklists.
Reference scope note: the reference connector has no URL surface at
all; this is the C4/UT1-style curation step (SURVEY §2.11 extension
class), value-checked in the scalar_funcs driver gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_connect_ftp_spark.operators.url_filter import (
    filter_by_blocklist,
    host_blocked,
    registered_domain,
    url_host,
)

_URLS = [
    (1, "https://Shop0.Example.COM:443/x?a=1", "shop0.example.com", "example.com"),
    (2, "http://user:pw@ADS.Tracker.co.uk/p", "ads.tracker.co.uk", "tracker.co.uk"),
    (3, "http://example.com/", "example.com", "example.com"),
    (4, "ftp://files.example.com.au:21/f", "files.example.com.au", "example.com.au"),
    (5, "relative/path only", None, None),
    (6, "http://10.0.0.1:8080/admin", "10.0.0.1", "10.0.0.1"),
    (7, "https://localhost/x", "localhost", "localhost"),
    (8, None, None, None),
    # bracketed IPv6 literals: colons are address bytes, the port comes
    # after the bracket; brackets are kept (canonical v6 entry form)
    (9, "http://[2001:db8::1]:8080/x", "[2001:db8::1]", "[2001:db8::1]"),
    (10, "https://[::ffff:10.0.0.1]/y", "[::ffff:10.0.0.1]", "[::ffff:10.0.0.1]"),
]


@pytest.fixture(scope="module")
def urls(spark):
    return spark.createDataFrame(
        [(i, u) for i, u, _, _ in _URLS], "doc_id long, url string"
    )


def test_host_and_registered_domain(spark, urls):
    got = {
        r.doc_id: (r.h, r.d)
        for r in urls.select(
            "doc_id",
            url_host("url").alias("h"),
            registered_domain(url_host("url")).alias("d"),
        ).collect()
    }
    for i, _, host, dom in _URLS:
        assert got[i] == (host, dom), (i, got[i], (host, dom))


def test_host_blocked_literal_list(spark, urls):
    flags = {
        r.doc_id: (r.b_sub, r.b_exact)
        for r in urls.select(
            "doc_id",
            host_blocked(url_host("url"), ("example.com", "tracker.co.uk")).alias(
                "b_sub"
            ),
            host_blocked(
                url_host("url"),
                ("example.com",),
                include_subdomains=False,
            ).alias("b_exact"),
        ).collect()
    }
    # subdomain semantics: an entry blocks itself and everything below,
    # never a superdomain
    assert flags[1] == (True, False)  # shop0.example.com via example.com
    assert flags[2] == (True, False)  # ads.tracker.co.uk via tracker.co.uk
    assert flags[3] == (True, True)  # exact example.com
    assert flags[4] == (False, False)  # example.com.AU is a different tree
    assert flags[5] == (False, False) and flags[8] == (False, False)  # no host
    with pytest.raises(ValueError, match="non-empty"):
        host_blocked(url_host("url"), ())


def test_filter_by_blocklist_frame(spark, urls):
    bl = spark.createDataFrame(
        [("Example.com",), ("ads.tracker.co.uk",), ("",)], "domain string"
    )
    kept = sorted(
        r.doc_id for r in filter_by_blocklist(urls, bl, url_col="url").collect()
    )
    # 1 and 3 blocked by suffix example.com; 2 by exact host;
    # 4 (example.com.au) survives; hostless and v6 rows survive
    assert kept == [4, 5, 6, 7, 8, 9, 10]

    # full suffix-chain semantics: a MID-LEVEL entry (between registered
    # domain and host) blocks deeper hosts — the UT1 shape that a
    # host+registered-domain two-probe design misses (round-10 example
    # pipeline caught exactly this)
    deep = spark.createDataFrame(
        [(1, "https://cdn.src3.example.org/doc"), (2, "https://src3.example.org/x"),
         (3, "https://example.org/clean"), (4, "https://othersrc3.example.org/y")],
        "doc_id long, url string",
    )
    mid = spark.createDataFrame([("src3.example.org",)], "domain string")
    kept_deep = sorted(
        r.doc_id for r in filter_by_blocklist(deep, mid, url_col="url").collect()
    )
    # 1 via suffix, 2 exact; 3 is the superdomain (never blocked);
    # 4 merely ENDS with the string but is a different label
    assert kept_deep == [3, 4]
    blocked = sorted(
        r.doc_id
        for r in filter_by_blocklist(
            urls, bl, url_col="url", keep_blocked=True
        ).collect()
    )
    assert blocked == [1, 2, 3]
    # column set untouched
    assert filter_by_blocklist(urls, bl, url_col="url").columns == urls.columns


def test_filter_plan_is_broadcast_equi_joins(spark, urls):
    bl = spark.createDataFrame([("example.com",)], "domain string")
    plan = (
        filter_by_blocklist(urls, bl, url_col="url")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_frame_suffix_chain_never_emits_bare_tlds(spark):
    """A bare-TLD (or single-label) blocklist entry must never match —
    including against <= 2-label hosts. Round-10 regression: the suffix
    chain built sequence(1, 0), which Spark evaluates DESCENDING as
    [1, 0], so 2-label hosts gained a bare-TLD suffix and entry 'org'
    blocked example.org (and 'localhost' matched foo.localhost only at
    depth 1 while ALSO matching via the phantom i=0 self-suffix)."""
    corpus = spark.createDataFrame(
        [
            (1, "https://example.org/a"),        # 2-label host
            (2, "https://a.example.org/b"),      # 3-label host
            (3, "https://localhost/c"),          # single-label host
            (4, "https://foo.localhost/d"),      # subdomain of single-label
            (5, "http://[2001:db8::1]/e"),       # bracket IPv6
        ],
        "doc_id long, url string",
    )
    # bare TLD + single-label + bracket-v6 entries
    bl = spark.createDataFrame(
        [("org",), ("localhost",), ("[2001:db8::1]",)], "domain string"
    )
    blocked = sorted(
        r.doc_id
        for r in filter_by_blocklist(
            corpus, bl, url_col="url", keep_blocked=True
        ).collect()
    )
    # 'org' blocks NOTHING (dotless entries match exact-host only, and
    # no host IS 'org'); 'localhost' blocks exactly host 3 —
    # foo.localhost has 2 labels, so its chain is just itself and the
    # single-label entry never appears in it; the bracket v6 entry
    # blocks 5 exactly.
    assert blocked == [3, 5]

    # literal-path parity: host_blocked must agree on every decision
    # (round 11 aligned dotless entries to exact-host-only there too)
    flags = {
        r.doc_id: r.b
        for r in corpus.select(
            "doc_id",
            host_blocked(url_host("url"), ("org", "localhost", "[2001:db8::1]"))
            .alias("b"),
        ).collect()
    }
    assert flags == {1: False, 2: False, 3: True, 4: False, 5: True}


def test_filter_by_blocklist_shuffle_mode(spark, urls):
    """join_mode='shuffle': identical result set with no FORCED
    broadcast in the static plan — the scale path for entry sets too
    big to ship to every executor."""
    bl = spark.createDataFrame(
        [("Example.com",), ("ads.tracker.co.uk",)], "domain string"
    )
    b_kept = sorted(
        r.doc_id for r in filter_by_blocklist(urls, bl, url_col="url").collect()
    )
    s_kept = sorted(
        r.doc_id
        for r in filter_by_blocklist(
            urls, bl, url_col="url", join_mode="shuffle"
        ).collect()
    )
    assert s_kept == b_kept
    # static (pre-AQE) plan: merge-hinted equi-joins, nothing forced to
    # broadcast; AQE may demote runtime-small sides — that's safe and
    # not asserted against
    plan = (
        filter_by_blocklist(urls, bl, url_col="url", join_mode="shuffle")
        ._jdf.queryExecution()
        .sparkPlan()
        .toString()
    )
    assert "SortMergeJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_filter_by_blocklist_broadcast_guard(spark, urls):
    bl = spark.createDataFrame([(f"h{i}.example.com",) for i in range(64)],
                               "domain string")
    with pytest.raises(ValueError, match="join_mode='shuffle'"):
        filter_by_blocklist(urls, bl, url_col="url", max_broadcast_entries=10)
    # None skips the count; bad mode rejected
    assert filter_by_blocklist(
        urls, bl, url_col="url", max_broadcast_entries=None
    ).columns == urls.columns
    with pytest.raises(ValueError, match="join_mode"):
        filter_by_blocklist(urls, bl, url_col="url", join_mode="hash")


def test_reserved_columns_rejected(spark, urls):
    bl = spark.createDataFrame([("example.com",)], "domain string")
    with pytest.raises(ValueError, match="reserved"):
        filter_by_blocklist(urls.withColumn("_ufb_host", F.lit("x")), bl, url_col="url")


def test_url_chain_matches_python_reference_property(spark):
    """Property: host extraction + registered-domain heuristic agree
    with an independent pure-Python derivation over generated URLs
    (random case, userinfo, ports, paths, multi-label TLDs, IPs)."""
    import re

    from kafka_connect_ftp_spark.operators.url_filter import MULTI_LABEL_TLDS

    hosts = [
        "Example.COM", "a.b.Example.com", "WWW.Shop.co.uk", "x.COM.au",
        "files.example.com.au", "10.0.0.1", "localhost", "ads.tracker.co.jp",
        "[2001:DB8::1]", "[::ffff:10.0.0.1]",
    ]
    cases = []
    i = 0
    for h in hosts:
        for user in ("", "u:p@"):
            for port in ("", ":8080"):
                for path in ("", "/", "/A/b?q=1"):
                    cases.append((i, f"https://{user}{h}{port}{path}"))
                    i += 1
    cases += [(i, "no scheme here"), (i + 1, None), (i + 2, "http://"), (i + 3, "")]

    def py_host(u):
        if u is None:
            return None
        m = re.match(r"^[^:/?#]+://(?:[^/@?#]*@)?(\[[^\]/?#]*\]|[^/?#:]+)", u.strip())
        return m.group(1).lower() if m and m.group(1) else None

    def py_domain(h):
        if h is None:
            return None
        if re.fullmatch(r"\d{1,3}(\.\d{1,3}){3}", h) or h.startswith("["):
            return h
        parts = h.split(".")
        if len(parts) <= 2:
            return h
        last2 = ".".join(parts[-2:])
        return ".".join(parts[-3:]) if last2 in MULTI_LABEL_TLDS else last2

    df = spark.createDataFrame(cases, "i long, url string")
    got = {
        r.i: (r.h, r.d)
        for r in df.select(
            "i",
            url_host("url").alias("h"),
            registered_domain(url_host("url")).alias("d"),
        ).collect()
    }
    for i_, u in cases:
        h = py_host(u)
        assert got[i_] == (h, py_domain(h)), (u, got[i_], (h, py_domain(h)))


@pytest.mark.skipif(
    not __import__("os").environ.get("SPARK_GRAFT_SLOW"),
    reason="volume smoke (~1 min); set SPARK_GRAFT_SLOW=1",
)
def test_blocklist_volume_smoke(spark):
    """100k-entry blocklist frame x 200k-URL corpus through the
    broadcast suffix-chain path — the UT1-scale shape; result checked
    against the modular-arithmetic ground truth."""
    corpus = spark.range(200_000).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("https://cdn.site"),
            (F.col("id") % 150_000).cast("string"),
            F.lit(".example.net/p"),
        ).alias("url"),
    )
    bl = spark.range(100_000).select(
        F.concat(F.lit("site"), F.col("id").cast("string"), F.lit(".example.net")).alias("domain")
    )
    kept = filter_by_blocklist(corpus, bl, url_col="url")
    # blocked: id % 150k < 100k -> kept = ids with id % 150000 >= 100000
    assert kept.count() == corpus.filter("id % 150000 >= 100000").count()
