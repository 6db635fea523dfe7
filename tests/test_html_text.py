"""HTML visible-text extraction (operators/html_text.py): block drops,
paragraph preservation, entity decode order, malformed-markup
robustness, the JVM-only plan, and the warc strip_html composition."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_ftp_spark.operators.html_text import html_to_text


def _one(spark, html):
    return (
        spark.createDataFrame([(html,)], "h string")
        .select(html_to_text("h").alias("t"))
        .first()
        .t
    )


def test_strips_tags_keeps_paragraph_breaks(spark):
    html = (
        "<html><head><title>ignored</title></head><body>"
        "<h1>Title</h1><p>First para.</p><p>Second <b>bold</b> para.</p>"
        "<ul><li>one</li><li>two</li></ul></body></html>"
    )
    assert _one(spark, html) == "Title\nFirst para.\nSecond bold para.\none\ntwo"


def test_script_style_comments_dropped_whole(spark):
    html = (
        "<p>keep</p><script type='x'>var dropped = 'me';</script>"
        "<style>.c { color: red }</style><!-- secret comment -->"
        "<p>also keep</p>"
    )
    t = _one(spark, html)
    assert "dropped" not in t and "color" not in t and "secret" not in t
    assert t == "keep\nalso keep"


def test_entity_decode_order(spark):
    # &amp; decodes LAST: "&amp;lt;" means the literal text "&lt;"
    assert _one(spark, "a &lt;b&gt; &quot;c&quot; &amp;lt; &nbsp;d") == 'a <b> "c" &lt; d'


def test_malformed_markup_never_throws(spark):
    assert _one(spark, "<p>unclosed <b>bold") == "unclosed bold"
    assert _one(spark, "plain text, no markup") == "plain text, no markup"
    # angle-bracket garbage: "<<<>" parses as one tag and is stripped,
    # the unterminated "<p" survives as text — no exception either way
    assert _one(spark, "<<<>>> <p") == ">> <p"
    assert (
        spark.createDataFrame([(None,)], "h string")
        .select(html_to_text("h").alias("t"))
        .first()
        .t
        is None
    )


def test_plan_is_jvm_only(spark):
    df = spark.createDataFrame([("<p>x</p>",)], "h string").select(html_to_text("h"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_warc_strip_html_composition(spark, tmp_path):
    from tests.test_warc import _http, _record
    from kafka_connect_ftp_spark.ingest.warc import read_warc, warc_to_corpus

    page = b"<html><body><p>Real prose here.</p><script>x=1;</script></body></html>"
    rec = _record("response", _http(page, ctype="text/html"), uri="http://h.example/p")
    (tmp_path / "p.warc").write_bytes(rec)
    docs = warc_to_corpus(
        read_warc(spark, str(tmp_path) + "/p.warc"), strip_html=True
    ).collect()
    assert len(docs) == 1 and docs[0].text == "Real prose here."


def test_uppercase_legacy_entities_decode(spark):
    # browsers accept &AMP; &LT; &NBSP; for the legacy named references
    df = spark.createDataFrame([("AT&AMP;T says 1 &LT; 2&NBSP;always",)], "h string")
    from kafka_connect_ftp_spark.operators.html_text import html_to_text

    got = df.select(html_to_text("h").alias("t")).first().t
    assert got == "AT&T says 1 < 2 always"


def test_nbsp_padding_trimmed(spark):
    from kafka_connect_ftp_spark.operators.html_text import html_to_text

    df = spark.createDataFrame([("\u00a0\u00a0<p>padded</p>\u00a0",)], "h string")
    assert df.select(html_to_text("h").alias("t")).first().t == "padded"
