"""crawl_corpus_family fixture pins: the oracle's literal md5/text
values re-derived from the adversarial archive bytes by an INDEPENDENT
Python implementation (hashlib + a from-scratch regex chain following
the documented extraction steps), plus one end-to-end run asserting the
section semantics the driver gate hashes."""

from __future__ import annotations

import hashlib
import re

from kafka_connect_ftp_spark.plans import crawl_queries as cq


def _independent_extract(body: bytes) -> str:
    """The documented html_to_text + clean_text chain, re-implemented
    from the module docs (NOT imported from the operators)."""
    s = body.decode("utf-8", "replace")
    s = re.sub(r"(?is)<(script|style|head)\b.*?</\1\s*>|<!--.*?-->", " ", s)
    s = re.sub(r"(?is)</?(p|div|br|li|tr|h[1-6])\b[^>]*>", "\n", s)
    s = re.sub(r"(?s)<[^>]*>", " ", s)
    for ent, repl in [
        (r"(?i)&nbsp;", " "), (r"(?i)&lt;", "<"), (r"(?i)&gt;", ">"),
        (r"(?i)&quot;", '"'), (r"&#39;", "'"), (r"(?i)&apos;", "'"),
        (r"(?i)&amp;", "&"),
    ]:
        s = re.sub(ent, repl, s)
    s = re.sub(r"[ \t\r\f]+", " ", s)
    s = re.sub(r" ?\n ?", "\n", s)
    s = re.sub(r"\n{2,}", "\n", s)
    s = re.sub(r"^\s+|\s+$", "", s)
    # clean_text tier
    s = re.sub(r"\r\n?", "\n", s)
    s = re.sub(r"[\x0b\x0c\x85  ]", "\n", s)
    s = re.sub(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f-\x9f]", "", s)
    s = re.sub(r"[​‎‏‪-‮⁠﻿]", "", s)
    s = re.sub(r"[ \t]+\n", "\n", s)
    s = re.sub(r"\n{3,}", "\n\n", s)
    return re.sub(r"^\s+|\s+$", "", s)


def test_oracle_md5_literals_match_fixture_bytes():
    # the oracle's literal md5s ARE these payloads' md5s
    assert hashlib.md5(cq._MESSY_BODY).hexdigest() == cq._MD5["messy"]
    assert hashlib.md5(cq._BADHOST_BODY).hexdigest() == cq._MD5["badhost"]
    assert hashlib.md5(cq._GONE_BODY).hexdigest() == cq._MD5["gone"]
    assert hashlib.md5(b"").hexdigest() == cq._MD5["empty"]
    assert hashlib.md5(cq._WARCINFO_PAYLOAD).hexdigest() == cq._MD5["warcinfo"]


def test_oracle_messy_text_matches_independent_extraction():
    assert _independent_extract(cq._MESSY_BODY) == cq._MESSY_TEXT
    assert _independent_extract(cq._BADHOST_BODY) == "plain"


def test_adversarial_archive_is_deterministic_and_parseable():
    b1, b2 = cq.adversarial_warc_bytes(), cq.adversarial_warc_bytes()
    assert b1 == b2
    assert b1[:2] == b"\x1f\x8b"


def test_family_sections_end_to_end(spark):
    rows = cq.crawl_corpus_family(spark, "/root/testdata/sf0.001").collect()
    by_sec: dict[str, list] = {}
    for r in rows:
        by_sec.setdefault(r.section, []).append(r)
    # 500 generated + 5 parseable adversarial records + 1 quarantine
    assert len(by_sec["rec"]) == 506
    # 500 generated + messy + badhost + empty (404/warcinfo/quarantine out)
    assert len(by_sec["doc"]) == 503
    assert len(by_sec["wds"]) == 503
    # HTTP manifest source over the fake transport
    assert len(by_sec["http"]) == 502          # 500 docs + gone + down
    assert len(by_sec["httprange"]) == 72      # doc_id % 7 == 0
    assert len(by_sec["tick0"]) == 252         # even half + 2 failures
    assert len(by_sec["tick1"]) == 252         # odd half + 2 retries
    http = {r.k: r for r in by_sec["http"]}
    assert http[cq._GONE_HTTP].status == 404 and http[cq._GONE_HTTP].text == "1"
    assert http[cq._DOWN_HTTP].status is None and http[cq._DOWN_HTTP].text == "2"
    # tick 1 fetched ONLY odd (new) URLs + the two quarantine retries
    assert all(
        r.k in (cq._GONE_HTTP, cq._DOWN_HTTP) or int(r.k.rsplit("/", 1)[-1]) % 2 == 1
        for r in by_sec["tick1"]
    )
    quarantine = [r for r in by_sec["rec"] if r.k == "__quarantine__"]
    assert len(quarantine) == 1 and quarantine[0].err == cq._QUARANTINE_ERR
    docs = {r.k: r for r in by_sec["doc"]}
    assert docs[cq._MESSY_URL].text == cq._MESSY_TEXT
    assert docs[cq._BADHOST_URL].src == "unknown"
    assert docs[cq._EMPTY_URL].text == ""
    # every WDS sample round-tripped: byte-identical text AND the signed
    # doc_id inverted from the sample key
    assert all(r.n == 1 for r in by_sec["wds"])
