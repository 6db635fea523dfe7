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
