"""Trained language identification — a Cavnar–Trenkle char-n-gram
profile classifier ("N-Gram-Based Text Categorization", Cavnar &
Trenkle 1994, SDAIR): per-language TOP-N character-trigram rank
profiles are TRAINED from a seed corpus, and a document is classified
to the language whose profile minimizes the out-of-place rank
distance. This is the trained front-door gate every real crawl
pipeline runs BEFORE English-tuned quality rules (CCNet, RefinedWeb,
Gopher's MassiveWeb all gate per-language first) — the stopword-list
heuristic in plans/text.py mis-scores anything outside its four
hard-coded lists, and the English-only C4/Gopher rules silently
reject well-formed non-English prose unless routed per-language.

Method, re-derived for Spark:

1. Normalize: lowercase, map every character outside a fixed letter
   set to space, collapse runs, trim, pad with one leading/trailing
   space (the CT word-boundary marker). The letter set includes the
   common western-European accents — ``é``/``ü``/``ñ`` carry a large
   share of the es/fr/de signal.
2. Featurize as overlapping char TRIGRAMS of the padded text (CT use
   1..5-grams; trigrams alone are the standard single-width variant
   and keep the oracle SQL one ``substr`` per position).
3. Train: per language, count trigrams over the seed corpus and keep
   the ``top_n`` by (count desc, gram asc) with rank 1..top_n — a
   bounded table (langs x top_n rows) that broadcasts anywhere.
4. Classify: build the SAME ranked profile per DOCUMENT (top
   ``doc_top`` grams), join it against the broadcast language
   profiles, and score each language by the out-of-place distance
   ``sum(|doc_rank - lang_rank|)`` + ``penalty`` for every doc-profile
   gram missing from the language profile. ``ct_lang`` = argmin
   (ties: lang asc); a document with no grams classifies ``'und'``.

Everything is deterministic integer arithmetic — no RNG, no floats —
so the whole train+classify chain is re-derivable in ANSI SQL and
sits inside the driver's hash gate (plans/text.py text_profile's
``ct_lang`` column).

Scale design (100 TB): training touches only the SEED corpus (tiny by
definition; the aggregation is bounded by gram-type count either
way). Classification is one explode over the corpus, a (doc_id, gram)
count whose hot keys combine map-side, a per-doc window rank
(partitioned on doc_id — Spark's WindowGroupLimit pre-prunes the
``rank <= doc_top`` filter map-side), a BROADCAST join against the
langs x top_n profile table, and a (doc_id, lang) aggregation with
langs a small constant. Raw text never shuffles; nothing
corpus-proportional reaches the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# letters kept by the normalizer: ascii + the common western accents.
# FIXED alphabet (not \p{L}): both engines must agree char-for-char,
# and Java vs RE2 unicode-class semantics differ at the edges.
NORM_KEEP = "a-zàâäçèéêëìíîïñòóôöùúûüß"

# Seed corpus: classic public-domain sentences (pangram, Dickens,
# Tolstoy, Shakespeare, Cervantes, Proust openers and their standard
# translations). Small on purpose — the operator's contract is that
# profiles come from ANY seed frame; this default makes the trained
# path deterministic and oracle-checkable without shipping data files.
SEED_TEXTS: dict[str, str] = {
    "en": (
        "the quick brown fox jumps over the lazy dog. "
        "it was the best of times, it was the worst of times. "
        "all happy families are alike; each unhappy family is unhappy in its own way. "
        "to be, or not to be, that is the question. "
        "we hold these truths to be self-evident, that all men are created equal. "
        "call me ishmael. some years ago, never mind how long precisely, "
        "having little or no money in my purse, i thought i would sail about "
        "a little and see the watery part of the world."
    ),
    "de": (
        "der schnelle braune fuchs springt über den faulen hund. "
        "es war die beste aller zeiten, es war die schlechteste aller zeiten. "
        "alle glücklichen familien gleichen einander, jede unglückliche familie "
        "ist auf ihre eigene weise unglücklich. "
        "sein oder nichtsein, das ist hier die frage. "
        "die würde des menschen ist unantastbar. "
        "als gregor samsa eines morgens aus unruhigen träumen erwachte, fand er "
        "sich in seinem bett zu einem ungeheueren ungeziefer verwandelt."
    ),
    "es": (
        "el rápido zorro marrón salta sobre el perro perezoso. "
        "era el mejor de los tiempos, era el peor de los tiempos. "
        "todas las familias felices se parecen unas a otras, pero cada familia "
        "infeliz lo es a su manera. "
        "ser o no ser, esa es la cuestión. "
        "en un lugar de la mancha, de cuyo nombre no quiero acordarme, no ha "
        "mucho tiempo que vivía un hidalgo de los de lanza en astillero. "
        "la libertad es uno de los más preciosos dones que a los hombres "
        "dieron los cielos."
    ),
    "fr": (
        "le rapide renard brun saute par-dessus le chien paresseux. "
        "c'était le meilleur des temps, c'était le pire des temps. "
        "toutes les familles heureuses se ressemblent, mais chaque famille "
        "malheureuse l'est à sa façon. "
        "être ou ne pas être, telle est la question. "
        "longtemps, je me suis couché de bonne heure. "
        "les hommes naissent et demeurent libres et égaux en droits. "
        "la liberté consiste à pouvoir faire tout ce qui ne nuit pas à autrui."
    ),
}


def _norm_expr(text_col: str) -> str:
    """The padded normalized form as a SQL expression — one definition,
    embedded verbatim (modulo dialect) in the DuckDB oracle twin."""
    t = (
        f"trim(regexp_replace(regexp_replace(lower(coalesce({text_col}, '')),"
        f" '[^{NORM_KEEP} ]', ' '), ' +', ' '))"
    )
    return f"CASE WHEN {t} = '' THEN '' ELSE concat(' ', {t}, ' ') END"


def _grams_expr(text_col: str) -> str:
    """Overlapping char trigrams of the padded text (empty array below
    3 chars — guarded, because Spark's sequence() runs BACKWARDS when
    stop < start instead of returning empty)."""
    p = _norm_expr(text_col)
    return (
        f"CASE WHEN length({p}) < 3 THEN array()"
        f" ELSE transform(sequence(1, length({p}) - 2),"
        f" i -> substring({p}, i, 3)) END"
    )


def char_grams(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """``(id, gram)`` — one row per trigram occurrence; the shared
    featurization (training and classification can never disagree)."""
    return docs.select(
        F.col(id_col), F.explode(F.expr(_grams_expr(text_col))).alias("gram")
    )


def seed_frame(spark, texts: dict[str, str] | None = None) -> DataFrame:
    """The default seed corpus as a ``(lang, text)`` frame."""
    items = sorted((texts or SEED_TEXTS).items())
    return spark.createDataFrame(items, "lang string, text string")


def train_char_profiles(
    seed: DataFrame,
    *,
    lang_col: str = "lang",
    text_col: str = "text",
    top_n: int = 100,
) -> DataFrame:
    """Per-language rank profile ``(lang, gram, rank)``, rank 1..top_n
    by (count desc, gram asc) — bounded by langs x top_n, broadcastable
    at any corpus size. Deterministic: ties break on the gram string."""
    if top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")
    counts = (
        char_grams(seed, id_col=lang_col, text_col=text_col)
        .groupBy(lang_col, "gram")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    w = Window.partitionBy(lang_col).orderBy(F.desc("_c"), F.asc("gram"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .select(F.col(lang_col).alias("lang"), "gram", F.col("rank").cast("int"))
    )


def classify_lang(
    docs: DataFrame,
    profiles: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 100,
    doc_top: int | None = None,
    penalty: int | None = None,
) -> DataFrame:
    """``(id, ct_lang, ct_dist)`` — the out-of-place classification
    (module doc). ``penalty`` (default ``top_n``) is the cost of a
    doc-profile gram absent from a language profile; ``doc_top``
    (default ``top_n``) caps the per-document profile. ``ct_dist`` is
    the winning distance (long; 0 and lang ``'und'`` for gram-less
    docs)."""
    doc_top = top_n if doc_top is None else doc_top
    penalty = top_n if penalty is None else penalty
    if doc_top < 1 or penalty < 1:
        raise ValueError("doc_top and penalty must be >= 1")
    dw = Window.partitionBy("_id").orderBy(F.desc("_c"), F.asc("gram"))
    doc_prof = (
        char_grams(docs.select(F.col(id_col).alias("_id"), text_col), id_col="_id",
                   text_col=text_col)
        .groupBy("_id", "gram")
        .agg(F.count(F.lit(1)).alias("_c"))
        .withColumn("drank", F.row_number().over(dw))
        .filter(F.col("drank") <= doc_top)
        .select("_id", "gram", "drank")
    )
    langs = profiles.select("lang").distinct()
    # per (doc, lang): matched out-of-place sum + count of matches; the
    # unmatched remainder costs `penalty` each. Profile join BROADCASTS
    # (langs x top_n rows); the cross join fans each doc's m rows by the
    # constant language count only.
    matched = (
        doc_prof.join(F.broadcast(profiles), "gram")
        .groupBy("_id", "lang")
        .agg(
            F.sum(F.abs(F.col("drank") - F.col("rank"))).alias("_msum"),
            F.count(F.lit(1)).alias("_mn"),
        )
    )
    sizes = doc_prof.groupBy("_id").agg(F.count(F.lit(1)).alias("_m"))
    dists = (
        sizes.crossJoin(F.broadcast(langs))
        .join(matched, ["_id", "lang"], "left")
        .select(
            "_id",
            "lang",
            (
                F.coalesce("_msum", F.lit(0))
                + (F.col("_m") - F.coalesce("_mn", F.lit(0))) * F.lit(penalty)
            ).cast("long").alias("dist"),
        )
    )
    best = (
        dists.groupBy("_id")
        # min over (dist, lang) structs = argmin with lang-asc tie-break,
        # combines map-side (no per-doc window over the lang fan-out)
        .agg(F.min(F.struct("dist", "lang")).alias("_b"))
        .select("_id", F.col("_b.lang").alias("ct_lang"), F.col("_b.dist").alias("ct_dist"))
    )
    return (
        docs.select(F.col(id_col).alias("_id"))
        .join(best, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("ct_lang", F.lit("und")).alias("ct_lang"),
            F.coalesce("ct_dist", F.lit(0)).cast("long").alias("ct_dist"),
        )
    )
