"""Corpus mixing: deterministic weighted sampling for training-mixture
curricula ("webtext 0.6, code 0.3, reference 0.1").

Uses the Efraimidis–Spirakis weighted-reservoir key: each row gets
``k = u^(1/w)`` with ``u`` a uniform hash of (salt, id) — taking the
global top-n by ``k`` IS an exact weighted sample without replacement.
All of it is map-side column math plus one ``TakeOrderedAndProject``
(no full sort, no shuffle of the corpus, no driver collect), and like
operators/splits.py the hash (not rand()) makes the sample reproducible
and stable: re-running with the same salt reselects the same rows.

``mix_corpora`` applies per-source sampling rates in one pass over a
union: rows keep/drop by comparing the hash to the source's rate — the
standard "epochs per source" knob (a rate > 1 repeats the source with
distinct salt epochs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DENOM = float(1 << 52)


def uniform_hash(id_col: Column, salt: Column | str) -> Column:
    """Uniform (0, 1] from md5(salt || id) — 52 bits → exact double;
    the +1 ulp shift avoids u=0, which would break u^(1/w). ``salt`` may
    be a per-row Column (mix_corpora builds per-source salts)."""
    s = F.lit(salt + ":") if isinstance(salt, str) else F.concat(salt, F.lit(":"))
    u = F.conv(
        F.substring(F.md5(F.concat(s, id_col.cast("string"))), 1, 13), 16, 10
    ).cast("double") / F.lit(_DENOM)
    return u + F.lit(1.0 / _DENOM)


def es_key(id_col: Column, weight_col: Column, salt: str = "v1") -> Column:
    """The Efraimidis–Spirakis reservoir key ``u^(1/w)``: the global top-n
    rows by this key form an exact weighted sample without replacement."""
    return F.pow(uniform_hash(id_col, salt), F.lit(1.0) / weight_col.cast("double"))


_uniform = uniform_hash  # internal alias kept for the call sites below


def weighted_sample(
    df: DataFrame,
    n: int,
    *,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "v1",
) -> DataFrame:
    """Exact weighted sample WITHOUT replacement of ``n`` rows.

    P(row selected) follows its weight (Efraimidis–Spirakis); rows with
    non-positive weight are never selected. Deterministic in (salt, id).
    """
    if n <= 0:
        raise ValueError("n must be positive")
    w = F.col(weight_col).cast("double")
    key = es_key(F.col(id_col), w, salt)
    return (
        df.filter(w > 0)
        .withColumn("_es_key", key)
        .orderBy(F.desc("_es_key"))
        .limit(n)
        .drop("_es_key")
    )


def mix_corpora(
    sources: dict[str, tuple[DataFrame, float]],
    *,
    id_col: str = "doc_id",
    salt: str = "v1",
) -> DataFrame:
    """Weighted union: each (name → (df, rate)) contributes ``rate`` of
    its rows (rate in [0, 1]; rate > 1 adds full + fractional epochs,
    each epoch re-rolled with its own salt). Output adds ``source`` and
    ``epoch`` columns; selection is per-row deterministic."""
    parts = []
    for name, (df, rate) in sources.items():
        if rate < 0:
            raise ValueError(f"rate for {name!r} must be >= 0")
        full_epochs, frac = int(rate), rate - int(rate)
        for e in range(full_epochs):
            parts.append(
                df.withColumn("source", F.lit(name)).withColumn("epoch", F.lit(e))
            )
        if frac > 0:
            esalt = f"{salt}:{name}:{full_epochs}"
            kept = df.filter(_uniform(F.col(id_col), esalt) <= frac)
            parts.append(
                kept.withColumn("source", F.lit(name)).withColumn("epoch", F.lit(full_epochs))
            )
    if not parts:
        raise ValueError("at least one source with rate > 0 is required")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def rates_for_token_budgets(
    docs: DataFrame,
    budgets: dict[str, float],
    *,
    source_col: str = "source",
    token_count_expr: Column | None = None,
    allow_epochs: bool = True,
    totals: dict[str, int] | None = None,
) -> dict[str, float]:
    """Turn per-source TOKEN budgets ("50B tokens of web, 10B of code")
    into the sampling rates ``mix_corpora`` consumes.

    Mixture specs are usually written in tokens, but the engine samples
    by row; the bridge is one aggregation (map-side partial sums — one
    tiny row per source reaches the driver) giving each source's total
    tokens, then ``rate = budget / total``. Hash sampling hits the budget
    in expectation with relative deviation ~1/sqrt(docs selected) —
    negligible at corpus scale; an exact greedy cut would need a
    running-sum window per source, funneling billions of rows through
    one reducer per source (the hot-key window anti-pattern,
    docs/SCALING.md).

    ``allow_epochs=False`` caps rates at 1.0 (never repeat data);
    sources without a budget entry get rate 0.0 (dropped).

    ``totals`` short-circuits the aggregation with precomputed per-source
    token totals (e.g. from a corpus_stats pass the caller already ran),
    so the bridge costs zero extra jobs when composed into a report.
    """
    if totals is None:
        toks = (
            token_count_expr
            if token_count_expr is not None
            else F.size(F.expr("filter(split(text, ' '), x -> x <> '')"))
        )
        totals = {
            r["src"]: r["total"]
            for r in docs.groupBy(F.col(source_col).alias("src"))
            .agg(F.sum(toks.cast("long")).alias("total"))
            .collect()
        }
    unknown = set(budgets) - set(totals)
    if unknown:
        raise ValueError(f"budgets name sources absent from the corpus: {sorted(unknown)}")
    rates = {}
    for name, budget in budgets.items():
        if budget < 0:
            raise ValueError(f"budget for {name!r} must be >= 0")
        total = totals[name] or 0
        rate = (budget / total) if total else 0.0
        rates[name] = rate if allow_epochs else min(1.0, rate)
    # the documented contract: corpus sources with no budget entry are
    # dropped via an explicit 0.0 rate, so callers can wire the result
    # straight into mix_corpora over ALL sources without a KeyError
    for name in totals:
        rates.setdefault(name, 0.0)
    return rates


def temperature_rates(
    totals: dict[str, float],
    *,
    budget: float,
    alpha: float = 0.3,
    allow_epochs: bool = True,
) -> dict[str, float]:
    """Temperature-based mixture rates (the multilingual-sampling rule
    of mBERT/XLM-R and the source-weighting shape of the GPT-3 mixture):
    source ``s`` with share ``p_s = n_s / N`` contributes ``q_s ∝
    p_s^alpha`` of the ``budget``; ``alpha = 1`` is proportional
    sampling (every source at the same rate — the corpus's natural
    mix), ``alpha → 0`` approaches uniform-over-sources (rare sources
    maximally upweighted). Returns per-source rates for
    :func:`mix_corpora`: ``rate_s = budget * q_s / n_s``.

    Driver-side arithmetic over the per-source totals (one tiny dict —
    get it from the same aggregation :func:`rates_for_token_budgets`
    uses, or a corpus_stats pass). ``allow_epochs=False`` caps each
    rate at 1.0: a rare source whose temperature share exceeds its size
    is then consumed whole rather than repeated, and the realized total
    undershoots ``budget`` — the standard no-repeat trade."""
    if not totals:
        raise ValueError("totals must be non-empty")
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    if any(n < 0 for n in totals.values()):
        raise ValueError("totals must be >= 0")
    n_total = float(sum(totals.values()))
    if n_total == 0:
        return {name: 0.0 for name in totals}
    shares = {name: (n / n_total) ** alpha for name, n in totals.items()}
    z = sum(shares.values())
    rates = {}
    for name, n in totals.items():
        want = budget * shares[name] / z
        rate = (want / n) if n else 0.0
        rates[name] = rate if allow_epochs else min(1.0, rate)
    return rates
