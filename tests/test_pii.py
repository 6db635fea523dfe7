"""PII scrub operator: each category detected and replaced, clean text
untouched, counts consistent with replacements, overlap precedence (PAN
digits never double-count as phones)."""

from __future__ import annotations

import pytest

from kafka_connect_ftp_spark.operators.pii import scrub

ROWS = [
    (1, "contact me at jane.doe+spam@example.co.uk for details"),
    (2, "call 555-867-5309 or (212) 555-0142 x9"),
    (3, "card 4111 1111 1111 1111 expires soon"),
    (4, "ssn 078-05-1120 on file"),
    (5, "server at 192.168.0.1 is up"),
    (6, "perfectly clean sentence with numbers 12345"),
    (7, "mixed: a@b.io then 10.0.0.7 then 555-123-4567"),
]


@pytest.fixture(scope="module")
def scrubbed(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    return {r.doc_id: r for r in scrub(df).collect()}


def test_email(scrubbed):
    r = scrubbed[1]
    assert r.n_email == 1 and "<EMAIL>" in r.text and "example" not in r.text


def test_phones(scrubbed):
    r = scrubbed[2]
    assert r.n_phone == 2
    assert r.text.count("<PHONE>") == 2 and "5309" not in r.text


def test_pan_not_counted_as_phone(scrubbed):
    r = scrubbed[3]
    assert r.n_pan == 1 and r.n_phone == 0
    assert "<CARD>" in r.text and "4111" not in r.text


def test_ssn(scrubbed):
    r = scrubbed[4]
    assert r.n_ssn == 1 and "<SSN>" in r.text


def test_ipv4(scrubbed):
    r = scrubbed[5]
    assert r.n_ipv4 == 1 and "<IP>" in r.text


def test_clean_text_untouched(scrubbed):
    r = scrubbed[6]
    assert r.text == ROWS[5][1]
    assert not r.has_pii
    assert r.n_email == r.n_phone == r.n_pan == r.n_ssn == r.n_ipv4 == 0


def test_mixed_all_categories(scrubbed):
    r = scrubbed[7]
    assert (r.n_email, r.n_ipv4, r.n_phone) == (1, 1, 1)
    assert r.has_pii
    for tok in ("<EMAIL>", "<IP>", "<PHONE>"):
        assert tok in r.text


def test_split_formulation_equals_count_replace_pair(spark):
    """pii_counts computes each category with ONE regex pass (split →
    size-1 counts, array_join replaces). Property: on adversarial text —
    PII at string edges, back-to-back matches, near-miss shapes, empty
    and NULL — it must be value-identical to the naive regexp_count +
    regexp_replace pair it replaced."""
    from pyspark.sql import functions as F

    from kafka_connect_ftp_spark.operators.pii import PII_PATTERNS, pii_counts

    texts = [
        "a@b.io",                                # match IS the whole string
        "a@b.io x@y.org",                        # two matches, one space
        "a@b.ioa@b.io",                          # no space: one greedy email
        "1.2.3.4",                               # leading/trailing match
        "10.0.0.1 10.0.0.2",                     # back-to-back ips
        "078-05-1120078-05-1120",                # ssn then glued digits
        "4111 1111 1111 1111 4111 1111 1111 1111",  # adjacent pans
        "(212) 555-0142(212) 555-0143",          # adjacent phones, no space
        "555-12-3456x",                          # ssn then letter
        "1.2.3.4.5",                             # 5 octets: leftmost ip wins
        "",                                      # empty text
        None,                                    # NULL text
        "no pii at all",
        "edge@case.com 999-99-9999 8.8.8.8 (303) 555-0100 "
        "4242 4242 4242 4242 trailing@end.io",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    counts, scrubbed = pii_counts("text")
    got = df.select("doc_id", *counts, scrubbed.alias("s")).orderBy("doc_id").collect()

    naive_cols, remaining = [], F.col("text")
    for name, pattern, repl in PII_PATTERNS:
        naive_cols.append(F.regexp_count(remaining, F.lit(pattern)).alias(f"n_{name}"))
        remaining = F.regexp_replace(remaining, pattern, repl)
    want = (
        df.select("doc_id", *naive_cols, remaining.alias("s")).orderBy("doc_id").collect()
    )
    assert got == want
