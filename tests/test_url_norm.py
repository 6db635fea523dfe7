"""URL normalization + URL-grain dedup (operators/url_norm.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_ftp_spark.operators.url_norm import dedup_by_url, normalize_url

CASES = [
    # fragment dropped; scheme+host lowercased; path case preserved
    ("HTTP://Example.COM/Path/File#sec", "http://example.com/Path/File"),
    # userinfo stripped, default https port stripped
    ("https://user:pw@Site.Org:443/a", "https://site.org/a"),
    # http default port; NON-default port kept
    ("http://h.net:80/x", "http://h.net/x"),
    ("http://h.net:8080/x", "http://h.net:8080/x"),
    # tracking params in every position; real params and their order kept
    ("http://h/p?utm_source=a&id=1&fbclid=z&q=2", "http://h/p?id=1&q=2"),
    ("http://h/p?utm_a=1&utm_b=2", "http://h/p"),
    ("http://h/p?gclid=7", "http://h/p"),
    ("http://h/p?id=1&ref_src=t", "http://h/p?id=1"),
    # empty path -> '/', also when a query follows directly
    ("http://Host.com", "http://host.com/"),
    ("HTTP://Host.com?utm_source=x", "http://host.com/"),
    ("http://host.com?id=3", "http://host.com/?id=3"),
    # trailing slash on a real path is PRESERVED (different resource)
    ("http://h/dir/", "http://h/dir/"),
    # no authority: pass through with fragment/tracking cleanup only
    ("mailto:a@b.c", "mailto:a@b.c"),
    ("/relative/path#f", "/relative/path"),
    ("  http://h/x  ", "http://h/x"),  # trimmed
    ("\t http://h/x \n", "http://h/x"),  # tabs/newlines too, not just spaces
    # bracketed IPv6 literals (round 11): default port stripped through
    # the bracket form, non-default kept, address lowercased
    ("http://[2001:DB8::1]:80/x", "http://[2001:db8::1]/x"),
    ("https://[2001:db8::1]:443/x", "https://[2001:db8::1]/x"),
    ("http://[2001:db8::1]:8080/x", "http://[2001:db8::1]:8080/x"),
    ("http://u:p@[::1]/y#f", "http://[::1]/y"),
]


def test_normalization_cases(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(CASES)], "i long, url string"
    )
    got = {
        r.i: r.n
        for r in df.select("i", normalize_url("url").alias("n")).collect()
    }
    for i, (raw, want) in enumerate(CASES):
        assert got[i] == want, f"{raw!r}: {got[i]!r} != {want!r}"
    # NULL in -> NULL out
    nrow = spark.createDataFrame([(None,)], "url string").select(
        normalize_url("url").alias("n")
    ).first()
    assert nrow.n is None


def test_dedup_by_url_keeps_min_tie(spark):
    df = spark.createDataFrame(
        [
            (3, "HTTP://A.com/x#frag", "late"),
            (1, "http://a.com/x?utm_source=m", "early"),
            (2, "http://b.com/y", "only"),
        ],
        "doc_id long, url string, text string",
    )
    out = {r.url_norm: r for r in dedup_by_url(df).collect()}
    assert set(out) == {"http://a.com/x", "http://b.com/y"}
    assert out["http://a.com/x"].doc_id == 1 and out["http://a.com/x"].text == "early"
    # partition-layout invariant
    out2 = {r.url_norm: r.doc_id for r in dedup_by_url(df.repartition(5)).collect()}
    assert out2 == {k: v.doc_id for k, v in out.items()}


def test_plan_is_jvm_side(spark):
    df = spark.createDataFrame([(1, "http://a/b")], "doc_id long, url string")
    plan = (
        df.select(normalize_url("url"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan and "Exchange" not in plan


def test_tracking_literal_in_path_is_preserved(spark):
    # round-7 review finding: the '&p=v' removal must scope to the
    # QUERY — a literal '&gclid=' inside the PATH is part of the
    # resource name and must survive, as must the real query after it
    df = spark.createDataFrame(
        [(1, "http://h/a&gclid=1/page?id=2&utm_source=x")], "i long, url string"
    )
    got = df.select(normalize_url("url").alias("n")).first().n
    assert got == "http://h/a&gclid=1/page?id=2"


def test_dedup_tie_collision_is_deterministic(spark):
    # equal tie values (same fetch tick) fall through to full-row order
    rows = [(7, "http://a.com/x", t) for t in ("zeta", "alpha", "midd")]
    df = spark.createDataFrame(rows, "doc_id long, url string, text string")
    outs = set()
    for n in (1, 3, 8):
        r = dedup_by_url(df.repartition(n)).collect()
        assert len(r) == 1
        outs.add(r[0].text)
    assert outs == {"alpha"}  # lexicographic min on the tiebreak columns
