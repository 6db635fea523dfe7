"""Corpus-governance profile: one oracle-checked documents-grain query
covering the training-data bookkeeping operators that previously had
pytest-only evidence — deterministic splits (operators/splits.py),
mixing keys (operators/mixing.py), PII detection/scrubbing
(operators/pii.py), unigram-LM fluency scoring and bigram
Stupid Backoff scoring (operators/lm_score.py, the Brants et al. 2007
rule trained on a reference slice so the backoff branch is exercised)
— plus the document fingerprints absorbed from round 2's
``doc_fingerprint`` query (md5/sha256/rolling hash).

The query calls the REAL operator code paths; the DuckDB oracle
re-derives every column independently (md5-hex arithmetic, RE2 regexes,
ln/avg, bigram count tables), so all six operator families sit inside
the driver's full hash-comparison gate in a single row-budget slot.

PII note: the synthetic documents contain no digits at all, so counting
PII on the raw text would be vacuously zero. The query therefore
augments each document with deterministic, id-derived PII strings
(email for doc_id%5==0, SSN-shaped for %7, PAN-shaped for %11, a
``(nnn) nnn-nnnn`` phone for %13) and detects/scrubs THOSE — the regex
machinery is exercised with per-row variation, and both engines build
the identical augmented text from table values. The operator's phone
pattern needs lookaround (unavailable in RE2/DuckDB), so the phone
injection is constructed to make the context requirements trivially
satisfied (space-delimited, no adjacent digits or dashes): on THIS text
the Java lookaround pattern and the oracle's lookaround-free RE2 twin
``\\(\\d{3}\\) \\d{3}-\\d{4}`` provably match the identical spans, so
n_phone and the scrub fingerprint are hash-checked non-vacuously.
ipv4 (doc_id%17, ``10.x.0.y`` with every segment <= 3 digits so the
Java phone pattern's ``\\d{4}`` tail can never claim part of it) is
lookaround-free in both engines, so the operator's own regex is the
oracle's regex and n_ipv4 is hash-checked non-vacuously too — every
PII category the operator ships is now exercised by the gate.

Scale design (100 TB): fingerprints/split/mix-key/PII are pure map-side
projections that pipeline with the scan; the LM columns add one
token-keyed aggregation bounded by vocabulary size plus a broadcast
log-prob join (see operators/lm_score.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_ftp_spark.operators.lm_score import (
    stupid_backoff_scores,
    train_stupid_backoff,
    unigram_scores,
)
from kafka_connect_ftp_spark.operators.mixing import es_key, uniform_hash
from kafka_connect_ftp_spark.operators.pii import PII_PATTERNS, pii_counts
from kafka_connect_ftp_spark.operators.splits import split_column
from kafka_connect_ftp_spark.plans import register
from kafka_connect_ftp_spark.session import load_tables

_ROLL_B = 131
_ROLL_M = 2147483647  # 2^31 - 1

_SPLIT_WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}
_MIX_RATE = 0.6
_DENOM = float(1 << 52)

# the split boundaries as Python-float accumulation, EXACTLY as
# operators/splits.py accumulates them — repr()'d into the oracle so both
# engines compare u against bit-identical thresholds (0.8 + 0.1 is
# 0.9000000000000001, not 0.9)
def _split_bounds() -> list[tuple[str, float]]:
    total = float(sum(_SPLIT_WEIGHTS.values()))
    out, acc = [], 0.0
    for name in list(_SPLIT_WEIGHTS)[:-1]:
        acc += _SPLIT_WEIGHTS[name] / total
        out.append((name, acc))
    return out


def _duck_u(salt_sql: str) -> str:
    """DuckDB twin of mixing.uniform_hash / splits' hash-to-[0,1)."""
    return (
        f"(('0x' || substr(md5({salt_sql} || ':' || CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT"
        f" / {_DENOM!r})"
    )


# deterministic PII augmentation — the same text built on both engines
_AUG_SPARK = (
    "concat(text,"
    " CASE WHEN doc_id % 5 = 0 THEN concat(' contact user', CAST(doc_id AS STRING), '@example.com') ELSE '' END,"
    " CASE WHEN doc_id % 7 = 0 THEN concat(' ssn ', lpad(CAST(doc_id % 1000 AS STRING), 3, '0'),"
    "      '-42-', lpad(CAST(doc_id % 10000 AS STRING), 4, '0')) ELSE '' END,"
    " CASE WHEN doc_id % 11 = 0 THEN concat(' card 4111 1111 1111 ',"
    "      lpad(CAST(doc_id % 10000 AS STRING), 4, '0')) ELSE '' END,"
    " CASE WHEN doc_id % 13 = 0 THEN concat(' call (', CAST(200 + doc_id % 700 AS STRING), ') ',"
    "      lpad(CAST(doc_id % 1000 AS STRING), 3, '0'), '-',"
    "      lpad(CAST(doc_id % 10000 AS STRING), 4, '0'), ' now') ELSE '' END,"
    " CASE WHEN doc_id % 17 = 0 THEN concat(' ip 10.', CAST(doc_id % 256 AS STRING), '.0.',"
    "      CAST(doc_id % 250 AS STRING), ' ok') ELSE '' END)"
)
_AUG_DUCK = (
    "text ||"
    " CASE WHEN doc_id % 5 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END ||"
    " CASE WHEN doc_id % 7 = 0 THEN ' ssn ' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')"
    "      || '-42-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END ||"
    " CASE WHEN doc_id % 11 = 0 THEN ' card 4111 1111 1111 '"
    "      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END ||"
    " CASE WHEN doc_id % 13 = 0 THEN ' call (' || CAST(200 + doc_id % 700 AS VARCHAR) || ') '"
    "      || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'"
    "      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' now' ELSE '' END ||"
    " CASE WHEN doc_id % 17 = 0 THEN ' ip 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.'"
    "      || CAST(doc_id % 250 AS VARCHAR) || ' ok' ELSE '' END"
)

# RE2-compatible scrub chain for the oracle: email -> pan -> ssn ->
# phone -> ipv4, each counted on the progressively-scrubbed text exactly
# like operators/pii.py. The operator's phone pattern needs lookaround
# (not RE2); on the space-delimited augmented phone injection its
# matches coincide exactly with this lookaround-free twin (module doc).
# The ipv4 pattern is lookaround-free, so the operator's own regex runs
# verbatim on both engines; the injected address keeps every segment
# <= 3 digits, so no 4-digit run exists for the Java phone pattern to
# claim before the ipv4 count sees it.
_RX = {name: pattern for name, pattern, _ in PII_PATTERNS}
_REPL = {name: repl for name, _, repl in PII_PATTERNS}
_PHONE_RE2 = r"\(\d{3}\) \d{3}-\d{4}"


def _duck_pii() -> str:
    t0 = "aug"
    t1 = f"regexp_replace({t0}, '{_RX['email']}', '{_REPL['email']}', 'g')"
    t2 = f"regexp_replace({t1}, '{_RX['pan']}', '{_REPL['pan']}', 'g')"
    t3 = f"regexp_replace({t2}, '{_RX['ssn']}', '{_REPL['ssn']}', 'g')"
    t4 = f"regexp_replace({t3}, '{_PHONE_RE2}', '{_REPL['phone']}', 'g')"
    t5 = f"regexp_replace({t4}, '{_RX['ipv4']}', '{_REPL['ipv4']}', 'g')"
    return f"""
      SELECT doc_id,
             CAST(len(regexp_extract_all({t0}, '{_RX['email']}')) AS INT) AS n_email,
             CAST(len(regexp_extract_all({t1}, '{_RX['pan']}')) AS INT) AS n_pan,
             CAST(len(regexp_extract_all({t2}, '{_RX['ssn']}')) AS INT) AS n_ssn,
             CAST(len(regexp_extract_all({t3}, '{_PHONE_RE2}')) AS INT) AS n_phone,
             CAST(len(regexp_extract_all({t4}, '{_RX['ipv4']}')) AS INT) AS n_ipv4,
             md5({t5}) AS scrub_fp
      FROM (SELECT doc_id, {_AUG_DUCK} AS aug FROM documents)
    """


def _oracle() -> str:
    from kafka_connect_ftp_spark.plans import ORACLE_MAX_TOKENS
    from kafka_connect_ftp_spark.plans.text import _DUCK_TOKS

    bounds = "".join(
        f"WHEN u < {b!r} THEN '{name}' " for name, b in _split_bounds()
    )
    last = list(_SPLIT_WEIGHTS)[-1]
    u_split = _duck_u("'v1'")
    u_mix = _duck_u("'v1:' || source || ':0'")
    ulp = 1.0 / _DENOM
    return f"""
    WITH lm_toks AS (
      SELECT doc_id, unnest({_DUCK_TOKS}) AS token FROM documents
    ),
    vocab AS (SELECT token, COUNT(*) AS n FROM lm_toks GROUP BY token),
    norm AS (SELECT SUM(n) AS total, COUNT(*) AS vsize FROM vocab),
    lp AS (
      SELECT token, ln((n + 0.5) / (total + 0.5 * (vsize + 1))) AS log_prob
      FROM vocab, norm
    ),
    doc_lm AS (
      SELECT t.doc_id, COUNT(*) AS n_tokens, AVG(lp.log_prob) AS avg_logprob
      FROM lm_toks t JOIN lp USING (token) GROUP BY t.doc_id
    ),
    sb_all AS (
      SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents
    ),
    sb_ref AS (SELECT toks FROM sb_all WHERE doc_id % 13 = 0),
    sb_uni AS (
      SELECT token, COUNT(*) AS n
      FROM (SELECT unnest(toks) AS token FROM sb_ref) GROUP BY token
    ),
    sb_norm AS (SELECT SUM(n) AS total, COUNT(*) AS vsize FROM sb_uni),
    sb_big AS (
      SELECT toks[i] AS w1, toks[i + 1] AS w2, COUNT(*) AS nb
      FROM sb_ref, generate_series(1, {ORACLE_MAX_TOKENS}) AS t(i)
      WHERE i < len(toks)
      GROUP BY 1, 2
    ),
    sb_stream AS (
      SELECT doc_id, toks[1] AS w1, CAST(NULL AS VARCHAR) AS w2, TRUE AS is_first
      FROM sb_all WHERE len(toks) >= 1
      UNION ALL
      SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2, FALSE
      FROM sb_all, generate_series(1, {ORACLE_MAX_TOKENS}) AS t(i)
      WHERE i < len(toks)
    ),
    sb_scored AS (
      SELECT s.doc_id,
             CASE WHEN s.is_first
                    THEN ln((COALESCE(u1.n, 0) + 0.5) / (n.total + 0.5 * (n.vsize + 1)))
                  WHEN b.nb IS NOT NULL THEN ln(CAST(b.nb AS DOUBLE) / u1.n)
                  ELSE ln(0.4) + ln((COALESCE(u2.n, 0) + 0.5) / (n.total + 0.5 * (n.vsize + 1)))
             END AS logp,
             CASE WHEN NOT s.is_first AND b.nb IS NULL THEN 1 ELSE 0 END AS backoff
      FROM sb_stream s
      LEFT JOIN sb_big b ON s.w1 = b.w1 AND s.w2 = b.w2
      LEFT JOIN sb_uni u1 ON s.w1 = u1.token
      LEFT JOIN sb_uni u2 ON s.w2 = u2.token
      CROSS JOIN sb_norm n
    ),
    sb_doc AS (
      SELECT doc_id, AVG(logp) AS sb_logscore, SUM(backoff) AS sb_backoff_n
      FROM sb_scored GROUP BY doc_id
    ),
    pii AS ({_duck_pii()}),
    base AS (
      SELECT doc_id,
             md5(text) AS fp_md5, sha256(text) AS fp_sha256,
             CAST(strlen(text) AS BIGINT) AS n_bytes,
             list_reduce(
               list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT)),
               (a, b) -> (a * {_ROLL_B} + b) % {_ROLL_M}
             ) AS roll_hash,
             CASE {bounds}ELSE '{last}' END AS split,
             ROUND(POW({u_split} + {ulp!r}, 1.0 / CAST(n_chars AS DOUBLE)), 6) AS es_key,
             ({u_mix} + {ulp!r}) <= {_MIX_RATE!r} AS mix_keep
      FROM (SELECT *, {u_split} AS u FROM documents)
    )
    SELECT b.doc_id, b.fp_md5, b.fp_sha256, b.n_bytes, b.roll_hash,
           b.split, b.es_key, b.mix_keep,
           p.n_email, p.n_pan, p.n_ssn, p.n_phone, p.n_ipv4,
           (p.n_email + p.n_pan + p.n_ssn + p.n_phone + p.n_ipv4) > 0 AS has_pii,
           p.scrub_fp,
           CAST(COALESCE(l.n_tokens, 0) AS BIGINT) AS n_tokens,
           ROUND(l.avg_logprob, 4) AS avg_logprob,
           ROUND(EXP(-l.avg_logprob), 4) AS perplexity,
           ROUND(s.sb_logscore, 4) AS sb_logscore,
           CAST(COALESCE(s.sb_backoff_n, 0) AS BIGINT) AS sb_backoff_n
    FROM base b
    JOIN pii p USING (doc_id)
    LEFT JOIN doc_lm l USING (doc_id)
    LEFT JOIN sb_doc s USING (doc_id)
    ORDER BY doc_id
    """


@register(
    "governance_profile",
    _oracle(),
    doc=(
        "Merged corpus-governance row per document: content fingerprints "
        "(md5/sha256/Rabin-Karp rolling hash — round 2's doc_fingerprint), "
        "deterministic train/val/test split, Efraimidis-Spirakis mixing "
        "key + per-source mix-keep decision, PII counts/scrub fingerprint "
        "over deterministically-augmented text, unigram-LM fluency "
        "(token count, avg log-prob, perplexity), and bigram Stupid "
        "Backoff fluency (mean log-score + backoff count; model trained "
        "on the doc_id%13 slice so the unseen-bigram backoff branch is "
        "non-vacuous at every SF). Every column runs the "
        "real operator code (operators/{splits,mixing,pii,lm_score}.py) "
        "and is independently re-derived by the DuckDB oracle."
    ),
)
def governance_profile(spark, sf_dir):
    # Plan shape: fingerprints, split, mix key/keep and the whole PII
    # chain are pure column expressions — they live in ONE map-side
    # projection over the scan, no join. The LM families add shuffles
    # that are each bounded by TYPE counts (vocab / bigram types) or the
    # docs grain, never corpus-row-proportional. The merged gate row
    # scans the documents table once per family branch (docs/PLANS.md
    # counts ~10 narrow 1-2 column scans) — the deliberate price of
    # packing six operator families into one driver row-budget slot; a
    # production pipeline composes only the stages it needs and a
    # trained SB/unigram model is reused, not retrained per query.
    docs = load_tables(spark, sf_dir, "documents")["documents"]

    # the char array is materialized once (_ch) — inlining the
    # filter(split(text, '')) tokenizer at each of its references would
    # split a ~1.5k-char doc multiple times per row
    chars = "filter(split(text, ''), c -> c <> '')"
    # single HOF pass: folding from a 0 accumulator equals folding from
    # the first char ((0*B + c1) = c1), which is exactly the oracle's
    # list_reduce, so the transform+slice+element_at preamble (a second
    # interpreted per-char pass) is unnecessary. Empty text stays NULL
    # (the oracle's list_reduce has no empty-list value either).
    fold = (
        "CASE WHEN size(_ch) = 0 THEN NULL ELSE"
        " aggregate(_ch, cast(0 as bigint),"
        f" (a, c) -> (a * {_ROLL_B} + cast(ascii(c) as bigint)) % {_ROLL_M})"
        " END"
    )

    # pii_counts returns its count columns in PII_PATTERNS order
    # (email, pan, ssn, phone, ipv4) — all five categories are injected
    # and hash-checked (module doc)
    counts, scrubbed = pii_counts(F.expr(_AUG_SPARK))
    n_email, n_pan, n_ssn, n_phone, n_ipv4 = counts
    has_pii = (
        F.col("n_email") + F.col("n_pan") + F.col("n_ssn") + F.col("n_phone")
        + F.col("n_ipv4")
        > 0
    )

    mapside = docs.withColumn("_ch", F.expr(chars)).select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("fp_md5"),
        F.sha2(F.col("text").cast("binary"), 256).alias("fp_sha256"),
        F.octet_length("text").cast("long").alias("n_bytes"),
        F.expr(fold).alias("roll_hash"),
        split_column("doc_id", _SPLIT_WEIGHTS, salt="v1").alias("split"),
        F.round(
            es_key(F.col("doc_id"), F.col("n_chars"), salt="v1"), 6
        ).alias("es_key"),
        (
            uniform_hash(
                F.col("doc_id"), F.concat(F.lit("v1:"), F.col("source"), F.lit(":0"))
            )
            <= F.lit(_MIX_RATE)
        ).alias("mix_keep"),
        n_email,
        n_pan,
        n_ssn,
        n_phone,
        n_ipv4,
        F.md5(scrubbed.cast("binary")).alias("scrub_fp"),
    )

    lm = unigram_scores(docs, include_tokenless=False).select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round("avg_logprob", 4).alias("avg_logprob"),
        F.round("perplexity", 4).alias("perplexity"),
    )

    # bigram Stupid Backoff trained on the doc_id % 13 == 0 slice and
    # scoring everything: out-of-slice documents contain unseen bigrams,
    # so the backoff branch and the OOV floor are non-vacuous inside the
    # hash AT EVERY SF (a 50% slice covers the small shared vocabulary's
    # bigram space at sf0.1 — zero backoffs, vacuous; measured). Self-
    # scoring would never back off at all (operators/lm_score.py).
    sb_model = train_stupid_backoff(docs.filter(F.col("doc_id") % 13 == 0))
    sb = stupid_backoff_scores(docs, sb_model).select(
        "doc_id",
        F.round("sb_logscore", 4).alias("sb_logscore"),
        F.col("sb_backoff_n").cast("long").alias("sb_backoff_n"),
    )

    return (
        mapside.join(lm, "doc_id", "left")
        .join(sb, "doc_id", "left")
        .select(
            "doc_id", "fp_md5", "fp_sha256", "n_bytes", "roll_hash",
            "split", "es_key", "mix_keep",
            "n_email", "n_pan", "n_ssn", "n_phone", "n_ipv4",
            has_pii.alias("has_pii"),
            "scrub_fp",
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            "avg_logprob", "perplexity",
            "sb_logscore", "sb_backoff_n",
        )
        # the hash repartition is a deliberate materialization boundary:
        # the LM join broadcasts, so without it the global sort's RANGE
        # SAMPLING pass re-executes the whole regex/fold chain a second
        # time (no shuffle below the sort to read back); with it, the
        # chain runs once and sampling reads the materialized shuffle.
        # Measured 2.3x on the full query; the same trade holds at scale,
        # where re-running the CPU-bound scrub chain over every row costs
        # more than one extra exchange of the output.
        .repartition("doc_id")
        .orderBy("doc_id")
    )
