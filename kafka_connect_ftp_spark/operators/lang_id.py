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
   ``doc_top`` grams) with pure array ops on the row, and score each
   language against its profile EMBEDDED AS A LITERAL gram→rank map
   by the out-of-place distance ``sum(|doc_rank - lang_rank|)`` +
   ``penalty`` for every doc-profile gram missing from the language
   profile. ``ct_lang`` = argmin (ties: lang asc); a document with no
   grams classifies ``'und'``.

Everything is deterministic integer arithmetic — no RNG, no floats —
so the whole train+classify chain is re-derivable in ANSI SQL and
sits inside the driver's hash gate (plans/text.py text_profile's
``ct_lang`` column).

Scale design (100 TB): training touches only the SEED corpus (tiny by
definition; the aggregation is bounded by gram-type count either
way). Classification is a pure MAP-SIDE projection — ZERO shuffles,
zero joins, zero Python: the trained profiles are bounded (langs x
top_n — the PQ-codebook contract), collected once at plan build and
embedded as one literal gram→rank map per language; the per-doc
ranked profile comes from array ops on the row (grams as PACKED LONGS
— order-isomorphic to the string form, see ``_GRAMS_LONG_OF_CP`` —
sort the gram array, find run starts, rank by sort_array of (-count,
gram) structs, slice to ``doc_top``); each language's distance is an
``aggregate`` fold over that profile against its literal map, argmin
= least() + a lang-ascending CASE chain. Raw text never shuffles; nothing
corpus-proportional reaches the driver (see ``classify_lang``'s
docstring for the staged-projection details).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "NORM_KEEP",
    "NORM_KEEP_ROUTED",
    "SCRIPT_OF_LANG",
    "SCRIPT_RANGES",
    "SEED_TEXTS",
    "SEED_TEXTS_ROUTED",
    "char_grams",
    "classify_lang",
    "classify_lang_routed",
    "classify_script",
    "seed_frame",
    "train_char_profiles",
]

# letters kept by the normalizer: ascii + the common western accents.
# FIXED alphabet (not \p{L}): both engines must agree char-for-char,
# and Java vs RE2 unicode-class semantics differ at the edges.
NORM_KEEP = "a-zàâäçèéêëìíîïñòóôöùúûüß"

# ---- script-level dispatch (round 9, VERDICT r8 #3) ---------------------
# Unicode-block ranges as LITERAL characters (not \u/\x{} escapes: Java
# regex takes \uXXXX, RE2 takes \x{XXXX} — literal range endpoints are
# the one spelling both engines parse identically inside a char class).
# Bounded fixed list, deliberately coarse: the dispatch only has to say
# WHICH trained profile set (or fallback) a document routes to.
SCRIPT_RANGES: dict[str, str] = {
    "latin": "A-Za-zÀ-ɏ",
    "cyrillic": "Ѐ-ӿԀ-ԯ",
    "greek": "Ͱ-Ͽἀ-῿",
    "han": "㐀-䶿一-鿿",
    "kana": "぀-ヿ",
    "hangul": "ᄀ-ᇿ가-힯",
    "arabic": "؀-ۿݐ-ݿ",
    "hebrew": "֐-׿",
    "devanagari": "ऀ-ॿ",
    # no trained language rides thai (round 10, deliberate): it keeps a
    # REAL unprofiled-script fallback path under hash-gate coverage now
    # that hebrew has a trained profile — Thai prose routes to the
    # script label with the gate's default params
    "thai": "฀-๿",
}

# the routed classifier's language->script map for the shipped seeds.
# zh/ja ride the han/kana scripts: kanji-heavy Japanese with little
# kana can dispatch to han and classify zh — the standard script-level
# ambiguity; kana presence is the ja signal
SCRIPT_OF_LANG: dict[str, str] = {
    "en": "latin",
    "de": "latin",
    "es": "latin",
    "fr": "latin",
    "ru": "cyrillic",
    "el": "greek",
    "zh": "han",
    "ja": "kana",
    "ar": "arabic",
    "ko": "hangul",
    "hi": "devanagari",
    "he": "hebrew",
}

# union normalization alphabet for the routed classifier: one norm pass
# covers every script with trained profiles (latin + cyrillic + greek +
# han + kana + arabic + hangul + devanagari) — grams from one script
# never collide with another's profiles, so the union costs nothing in
# accuracy and keeps classification single-scan. Letters and IN-WORD
# marks only: digits and punctuation are excluded in every script (the
# Latin convention). Arabic keeps tatweel + harakat (dropping them
# would split words — non-keep chars normalize to SPACE) but excludes
# the ؟/،/٪ punctuation, the Arabic-Indic ٠-٩/extended ۰-۹ digits and
# the ۔ Urdu full stop (it is a C4 LINE TERMINAL — featurizing the
# sentence mark only for this script would skew its profiles);
# devanagari skips the ।/॥ dandas and the ०-९ digits.
NORM_KEEP_ROUTED = (
    NORM_KEEP
    + "а-яёα-ωά-ώϊϋΐΰ぀-ヿ㐀-䶿一-鿿"
    + "ؠ-ٟٮ-ۓە-ۯۺ-ۿᄀ-ᇿ가-힯ऀ-ॣॱ-ॿ"
    # hebrew letters incl. final forms (round 10: trained he profile);
    # niqqud marks excluded — modern prose is unpointed, and pointed
    # seed grams would never match it
    + "א-ת"
)

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


# the routed seed corpus: SEED_TEXTS plus Cyrillic/Greek/Han/Kana/
# Arabic/Hangul/Devanagari classics (Tolstoy, the Russian pangram,
# Shakespeare/Dickens/Homer standard translations, UDHR article 1) —
# same public-domain-opener convention, lowercase (identity for the
# caseless scripts)
SEED_TEXTS_ROUTED: dict[str, str] = {
    **SEED_TEXTS,
    "ru": (
        "все счастливые семьи похожи друг на друга, каждая несчастливая "
        "семья несчастлива по-своему. "
        "съешь же ещё этих мягких французских булок, да выпей чаю. "
        "быть или не быть, вот в чём вопрос. "
        "это было лучшее из всех времён, это было худшее из всех времён. "
        "человек создан для счастья, как птица для полёта. "
        "все люди рождаются свободными и равными в своём достоинстве и правах."
    ),
    "el": (
        "όλες οι ευτυχισμένες οικογένειες μοιάζουν μεταξύ τους, κάθε "
        "δυστυχισμένη οικογένεια είναι δυστυχισμένη με τον δικό της τρόπο. "
        "να ζει κανείς ή να μη ζει, ιδού η απορία. "
        "ήταν οι καλύτεροι καιροί, ήταν οι χειρότεροι καιροί. "
        "άνδρα μοι έννεπε μούσα πολύτροπον ος μάλα πολλά πλάγχθη. "
        "η ελευθερία είναι το πολυτιμότερο αγαθό που δόθηκε στους ανθρώπους."
    ),
    "zh": (
        "幸福的家庭都是相似的不幸的家庭各有各的不幸。"
        "这是最好的时代这是最坏的时代。"
        "生存还是毁灭这是一个问题。"
        "人人生而自由在尊严和权利上一律平等。"
        "学而时习之不亦说乎有朋自远方来不亦乐乎。"
        "道可道非常道名可名非常名。"
    ),
    "ja": (
        "しあわせなかぞくはみなにている。ふしあわせなかぞくはそれぞれにふしあわせである。"
        "いきるべきかしぬべきかそれがもんだいだ。"
        "むかしむかしあるところにおじいさんとおばあさんがすんでいました。"
        "はるはあけぼのやうやうしろくなりゆくやまぎわすこしあかりて。"
        "すべてのにんげんはうまれながらにしてじゆうでありそんげんとけんりにおいてびょうどうである。"
    ),
    # round 9b continuation: the three scripts that previously fell
    # back to bare script labels get trained profiles (UDHR article 1
    # + the Tolstoy/Dickens/Shakespeare opener convention)
    "ar": (
        "يولد جميع الناس أحرارا متساوين في الكرامة والحقوق "
        "وقد وهبوا عقلا وضميرا وعليهم أن يعامل بعضهم بعضا بروح الإخاء. "
        "كل العائلات السعيدة متشابهة لكن كل عائلة تعيسة هي تعيسة بطريقتها الخاصة. "
        "كان أفضل الأوقات وكان أسوأ الأوقات. "
        "أن تكون أو لا تكون تلك هي المسألة. "
        "ذهب الولد إلى المدرسة في الصباح الباكر وقرأ كتابا جديدا عن تاريخ العلوم."
    ),
    "ko": (
        "행복한 가정은 모두 비슷하지만 불행한 가정은 저마다의 이유로 불행하다. "
        "모든 인간은 태어날 때부터 자유로우며 그 존엄과 권리에 있어 동등하다. "
        "인간은 천부적으로 이성과 양심을 부여받았으며 서로 형제애의 정신으로 행동하여야 한다. "
        "최고의 시절이자 최악의 시절이었다. "
        "사느냐 죽느냐 그것이 문제로다. "
        "옛날 옛적에 한 마을에 할아버지와 할머니가 살고 있었습니다."
    ),
    "hi": (
        "सभी सुखी परिवार एक जैसे होते हैं लेकिन हर दुखी परिवार अपने अपने ढंग से दुखी होता है। "
        "सभी मनुष्यों को गौरव और अधिकारों के मामले में जन्मजात स्वतंत्रता और समानता प्राप्त है। "
        "उन्हें बुद्धि और अंतरात्मा की देन प्राप्त है और परस्पर उन्हें भाईचारे के भाव से बर्ताव करना चाहिए। "
        "होना या न होना यही प्रश्न है। "
        "वह सबसे अच्छा समय था और वह सबसे बुरा समय था। "
        "मैं सुबह जल्दी उठकर किताब पढ़ता हूं और शाम को बगीचे में टहलता हूं।"
    ),
    # round 10: hebrew trained profile (same UDHR article 1 +
    # Tolstoy/Dickens/Shakespeare opener convention); closes the last
    # unprofiled SCRIPT_OF_LANG gap — the fallback path now rides thai
    "he": (
        "כל בני האדם נולדו בני חורין ושווים בערכם ובזכויותיהם. "
        "כולם חוננו בתבונה ובמצפון לפיכך חובה עליהם לנהוג איש ברעהו ברוח של אחווה. "
        "כל המשפחות המאושרות דומות זו לזו אך כל משפחה אומללה היא אומללה בדרכה שלה. "
        "אלה היו הטובים שבזמנים אלה היו הרעים שבזמנים. "
        "להיות או לא להיות זו היא השאלה. "
        "הילד הלך לבית הספר בבוקר וקרא ספר חדש על תולדות המדע."
    ),
}


def _norm_expr(text_col: str, norm_keep: str = NORM_KEEP) -> str:
    """The padded normalized form as a SQL expression — one definition,
    embedded verbatim (modulo dialect) in the DuckDB oracle twin."""
    t = (
        f"trim(regexp_replace(regexp_replace(lower(coalesce({text_col}, '')),"
        f" '[^{norm_keep} ]', ' '), ' +', ' '))"
    )
    return f"CASE WHEN {t} = '' THEN '' ELSE concat(' ', {t}, ' ') END"


# trigrams off an ALREADY-MATERIALIZED char-array column: three aligned
# slices zipped with concat — O(len) per document. The obvious
# per-position form (transform(sequence(...), i -> substring(p, i, 3)))
# is QUADRATIC: UTF8String.substring seeks from the string head on
# every call (profiled: 2.4s for 1.5M grams at sf0.1 vs 0.4s for this
# form — and inlining the norm regexes into that lambda instead of
# staging them was another 6x on top).
_GRAMS_OF_CS = (
    "CASE WHEN size({cs}) < 3 THEN array() ELSE"
    " zip_with(zip_with(slice({cs}, 1, size({cs}) - 2),"
    "                   slice({cs}, 2, size({cs}) - 2),"
    "                   (a, b) -> concat(a, b)),"
    "          slice({cs}, 3, size({cs}) - 2),"
    "          (ab, c) -> concat(ab, c)) END"
)

# classification-side trigrams as PACKED LONGS (round 9b): the three
# codepoints of a trigram packed into one bigint (cp1*2^42 + cp2*2^21 +
# cp3 — 21 bits holds any codepoint <= U+10FFFF, and both split('')
# and ascii() are codepoint-exact, astral included; verified on
# U+10348). The packing is a BIJECTION from 3-codepoint strings that
# PRESERVES LEXICOGRAPHIC ORDER for equal-length grams (higher-order
# bits = earlier position, UTF8 byte order = codepoint order), so
# sorting/run-counting/rank tie-breaks over packed longs produce
# byte-identical profiles and distances to the string form the DuckDB
# oracle twin derives — while the hot path (array_sort of ~len(text)
# grams per row + doc_top lookups into top_n literal maps) runs on
# primitive long compares instead of allocated 3-char strings
# (measured: the 4-language distance stage over 5k sf0.1 docs dropped
# 2.63s -> 1.93s). ``{cp}`` is the codepoint array of the padded
# normalized text.
_GRAMS_LONG_OF_CP = (
    "CASE WHEN size({cp}) < 3 THEN array() ELSE"
    " zip_with(zip_with(slice({cp}, 1, size({cp}) - 2),"
    "                   slice({cp}, 2, size({cp}) - 2),"
    "                   (a, b) -> a * 4398046511104L + b * 2097152L),"
    "          slice({cp}, 3, size({cp}) - 2),"
    "          (ab, c) -> ab + c) END"
)


def _pack_gram(gram: str) -> int:
    """Python twin of the packed-long trigram encoding above — used to
    key the literal rank maps from TRAINED (string) grams."""
    if len(gram) != 3:
        raise ValueError(f"trigram expected, got {gram!r}")
    return (ord(gram[0]) << 42) | (ord(gram[1]) << 21) | ord(gram[2])


def char_grams(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    norm_keep: str = NORM_KEEP,
) -> DataFrame:
    """``(id, gram)`` — one row per trigram occurrence; the shared
    featurization (training and classification can never disagree).

    TWO-stage projection, deliberately: the padded-norm string (two
    regexp_replace + lower) is split into a char ARRAY materialized as
    its own aliased column, and the trigram zip references THAT.
    CollapseProject keeps the boundary because the alias is non-cheap
    and multiply-referenced (the gopher_rules/governance
    staged-projection lesson)."""
    staged = docs.select(
        F.col(id_col),
        F.expr(f"split({_norm_expr(text_col, norm_keep)}, '')").alias("_cs"),
    )
    return staged.select(
        F.col(id_col),
        F.explode(F.expr(_GRAMS_OF_CS.format(cs="_cs"))).alias("gram"),
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
    norm_keep: str = NORM_KEEP,
) -> DataFrame:
    """Per-language rank profile ``(lang, gram, rank)``, rank 1..top_n
    by (count desc, gram asc) — bounded by langs x top_n, broadcastable
    at any corpus size. Deterministic: ties break on the gram string.

    Raises if any seed language yields ZERO grams under ``norm_keep``
    (review r9): training SEED_TEXTS_ROUTED with the default Latin-only
    alphabet would silently drop the ru/el/zh/ja profiles and every
    such document would quietly fall back to its script label at
    classification — a build-time error beats that. Training is a
    bounded seed-corpus job, so the extra action costs nothing."""
    if top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")
    counts = (
        char_grams(seed, id_col=lang_col, text_col=text_col, norm_keep=norm_keep)
        .groupBy(lang_col, "gram")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    w = Window.partitionBy(lang_col).orderBy(F.desc("_c"), F.asc("gram"))
    out = (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .select(F.col(lang_col).alias("lang"), "gram", F.col("rank").cast("int"))
    )
    seed_langs = {r[0] for r in seed.select(lang_col).distinct().collect()}
    prof_langs = {r[0] for r in out.select("lang").distinct().collect()}
    gramless = sorted(seed_langs - prof_langs)
    if gramless:
        raise ValueError(
            f"train_char_profiles: seed language(s) {gramless} normalize to "
            f"zero grams under norm_keep={norm_keep!r} — pass the alphabet "
            "covering their script (e.g. NORM_KEEP_ROUTED)"
        )
    return out


def classify_lang(
    docs: DataFrame,
    profiles: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 100,
    doc_top: int | None = None,
    penalty: int | None = None,
    keep_cols: tuple[str, ...] = (),
    norm_keep: str = NORM_KEEP,
) -> DataFrame:
    """``(id, ct_lang, ct_dist, *keep_cols)`` — the out-of-place
    classification (module doc). ``penalty`` (default ``top_n``) is
    the cost of a doc-profile gram absent from a language profile;
    ``doc_top`` (default ``top_n``) caps the per-document profile.
    ``ct_dist`` is the winning distance (long; 0 and lang ``'und'``
    for gram-less docs). ``keep_cols`` are input columns carried
    verbatim through the projection (classification is map-side, so a
    caller that needs ct_lang NEXT TO other per-doc columns chains a
    select instead of paying a join — the pq_encode_arrow passthrough
    convention).

    Physical shape (round-8 rework; the round-9 text_profile gate
    composes this map-side with the script dispatch, C4 flags and
    token stats into ONE scan — current gate cost is whatever
    BENCH_r{N}.json records for text_profile, not a number pinned
    here): a document's gram stream is ONE row's array, so the whole
    classification is a MAP-SIDE projection — zero shuffles, zero
    joins, zero Python:

    - the trained profiles are BOUNDED (langs x top_n — the
      PQ-codebook contract), collected once at plan build and embedded
      as one literal gram->rank map per language;
    - the per-doc ranked profile comes from array ops on the row,
      with grams as PACKED LONGS (``_GRAMS_LONG_OF_CP``: bijective and
      order-isomorphic with the trained string grams, so profiles and
      distances are bit-identical to the string form the oracle twin
      derives): sort the gram array, find run starts (a distinct-count
      without a groupBy), rank by (count desc, gram asc) via
      sort_array of (-count, gram) structs, slice to ``doc_top``;
    - each language's out-of-place distance is an ``aggregate`` fold
      over that profile against its literal map; the argmin is
      least() + a lang-ascending CASE chain.

    Staged projections materialize each array once (CollapseProject
    keeps boundaries for non-cheap multiply-referenced aliases);
    raw text never shuffles and nothing but the output columns leaves
    the mapper — the shape a 100 TB corpus wants."""
    doc_top = top_n if doc_top is None else doc_top
    penalty = top_n if penalty is None else penalty
    if doc_top < 1 or penalty < 1:
        raise ValueError("doc_top and penalty must be >= 1")
    prows = profiles.collect()  # bounded: langs x top_n
    langs = sorted({r.lang for r in prows})
    _check_reserved("classify_lang", id_col, keep_cols, len(langs))
    if not langs:
        raise ValueError("profiles is empty")
    costs = _distance_frame(
        docs,
        prows,
        langs,
        id_col=id_col,
        text_col=text_col,
        doc_top=doc_top,
        penalty=penalty,
        keep_cols=keep_cols,
        norm_keep=norm_keep,
    )
    dist_cols = [F.col(f"_d_{i}") for i in range(len(langs))]
    min_dist = F.least(*dist_cols) if len(dist_cols) > 1 else dist_cols[0]
    # lang-ascending CASE = the deterministic tie-break (langs sorted);
    # a gram-less doc has an empty profile -> 'und' with distance 0
    pick = F.when(F.col("_m") == 0, F.lit("und"))
    for i, lang in enumerate(langs):
        pick = pick.when(dist_cols[i] == min_dist, F.lit(lang))
    return costs.select(
        F.col("_id").alias(id_col),
        pick.alias("ct_lang"),
        F.when(F.col("_m") == 0, F.lit(0)).otherwise(min_dist).cast("long").alias("ct_dist"),
        *keep_cols,
    )


def _check_reserved(
    who: str,
    id_col: str,
    keep_cols: tuple[str, ...],
    n_langs: int = 0,
    extra: frozenset[str] = frozenset(),
) -> None:
    # THE reserved-name guard (the repetition_signals convention): a
    # caller column named like an internal stage alias would silently
    # shadow or break the staged projections. One helper for every
    # guarded operator in this module — a new internal alias goes in
    # exactly one place (review r9: three drifting copies collapsed).
    reserved = (
        {"_id", "_cp", "_sg", "_st", "_prof", "_m"}
        | {f"_d_{i}" for i in range(n_langs)}
        | set(extra)
    )
    clash = ({id_col, *keep_cols}) & reserved
    if clash:
        raise ValueError(
            f"{who}: column(s) {sorted(clash)} collide with "
            f"internal names {sorted(reserved)}"
        )


def _distance_frame(
    docs: DataFrame,
    prows,
    langs: list[str],
    *,
    id_col: str,
    text_col: str,
    doc_top: int,
    penalty: int,
    keep_cols: tuple[str, ...],
    norm_keep: str,
    script_gate: dict[str, str] | None = None,
    script_col: str = "ct_script",
) -> DataFrame:
    """The shared map-side distance machinery (module doc): staged
    projections ``_id/_sg/_st/_prof`` then one ``_d_i`` out-of-place
    distance column per language against its literal gram→rank map,
    plus ``_m`` (doc-profile size). Callers pick the argmin — globally
    (``classify_lang``) or per script (``classify_lang_routed``).

    ``script_gate`` (lang→script, requires ``script_col`` in
    ``keep_cols``): each ``_d_i`` evaluates ONLY when the row's script
    matches that language's script, else NULL. The routed pick never
    reads an off-script distance, and the fold (doc_top map lookups,
    each a linear scan of a top_n literal map) is the hot term — gating
    cuts the per-row fold count from len(langs) to the languages of one
    script (~10x at 12 trained languages; measured 2.14s -> 1.39s over
    5k docs at sf0.1)."""
    # one SQL map literal per language, parsed in a single expression
    # each (round 9: the F.create_map form built 2 x langs x top_n
    # Column objects through py4j — ~1s of driver time per plan build
    # at 4 langs x 64 grams, re-paid on every query construction).
    # Keys are PACKED LONGS (_GRAMS_LONG_OF_CP note): primitive map
    # lookups on the hot path, bijective with the trained string grams
    def _map_sql(lang: str) -> str:
        pairs = ", ".join(
            f"{_pack_gram(r.gram)}L, {int(r.rank)}"
            for r in prows
            if r.lang == lang
        )
        return f"map({pairs})"

    rank_map = {lang: F.expr(_map_sql(lang)) for lang in langs}
    # stage 1: sorted packed-gram array (longs); stage 2: run starts
    # (distinct grams); stage 3: ranked profile. Each alias is
    # multiply-referenced by the next stage, so the projections stay
    # materialized.
    keep = list(keep_cols)
    s1 = docs.select(
        F.col(id_col).alias("_id"),
        F.expr(
            f"transform(split({_norm_expr(text_col, norm_keep)}, ''),"
            " c -> CAST(ascii(c) AS BIGINT))"
        ).alias("_cp"),
        *keep,
    ).select(
        "_id",
        F.expr(f"array_sort({_GRAMS_LONG_OF_CP.format(cp='_cp')})").alias("_sg"),
        *keep,
    )
    s2 = s1.select(
        "_id",
        "_sg",
        *keep,
        F.expr(
            "CASE WHEN size(_sg) < 1 THEN array() ELSE"
            " filter(sequence(1, size(_sg)),"
            "        i -> i = 1 OR element_at(_sg, i) != element_at(_sg, i - 1)) END"
        ).alias("_st"),
    )
    # run k spans [start_k, next_start_k): count = next - start; the
    # ranked profile sorts (-count, gram) ascending and slices doc_top
    s3 = s2.select(
        "_id",
        *keep,
        # empty-guard matters: zip_with pads the SHORTER side with
        # NULLs, so an empty _st against the sentinel array would
        # fabricate a NULL run instead of an empty profile
        F.expr(
            "CASE WHEN size(_st) = 0 THEN"
            " CAST(array() AS array<struct<negc: int, gram: bigint>>) ELSE"
            " slice(array_sort(zip_with("
            " _st,"
            " concat(slice(_st, 2, greatest(size(_st) - 1, 0)), array(size(_sg) + 1)),"
            " (s, nxt) -> struct(CAST(s - nxt AS INT) AS negc, element_at(_sg, s) AS gram)"
            f")), 1, {int(doc_top)}) END"
        ).alias("_prof"),
    )

    def lang_dist(lang: str):
        m = rank_map[lang]
        per_gram = F.transform(
            "_prof",
            lambda x, i: F.coalesce(
                F.abs((i + 1) - m[x["gram"]]), F.lit(penalty)
            ).cast("long"),
        )
        return F.aggregate(per_gram, F.lit(0).cast("long"), lambda acc, x: acc + x)

    def gated(i: int, lang: str):
        if script_gate is None:
            return lang_dist(lang).alias(f"_d_{i}")
        return F.when(
            F.col(script_col) == script_gate[lang], lang_dist(lang)
        ).alias(f"_d_{i}")

    return s3.select(
        "_id",
        *keep,
        F.size("_prof").alias("_m"),
        *[gated(i, lang) for i, lang in enumerate(langs)],
    )


def classify_script(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """``(id, ct_script, *keep_cols)`` — unicode-block script dispatch
    (VERDICT r8 #3: without it every non-Latin document normalizes to
    empty and classifies ``'und'`` before English-parameterized gates).

    One codepoint-range count per script in ``SCRIPT_RANGES`` — as the
    LENGTH DIFFERENCE ``length(t) - length(regexp_replace(t, '[range]',
    ''))`` (each match is one char), never ``regexp_extract_all``:
    letters are DENSE matches, and materializing an array of every
    matching character would allocate ~doc-length single-char strings
    per script per row on the hot path (review r9). Literal-character
    ranges are the one spelling Java regex and RE2 parse identically,
    so the whole chain re-derives in the DuckDB oracle. Argmax with the
    deterministic script-ascending tie-break; ``'und'`` when no script
    character occurs. Pure MAP-SIDE projection: counts staged once
    (multiply referenced by greatest() + the CASE chain), zero
    shuffles, zero Python — fuses into the scan at any corpus size."""
    scripts = sorted(SCRIPT_RANGES)
    _check_reserved(
        "classify_script",
        id_col,
        keep_cols,
        extra=frozenset(f"_s_{i}" for i in range(len(scripts))) | {"_s_len"},
    )
    t = f"coalesce({text_col}, '')"
    staged = docs.select(
        F.col(id_col),
        *keep_cols,
        F.expr(f"length({t})").alias("_s_len"),
        *[
            F.expr(
                f"length(regexp_replace({t}, '[{SCRIPT_RANGES[s]}]', ''))"
            ).alias(f"_s_{i}")
            for i, s in enumerate(scripts)
        ],
    ).select(
        F.col(id_col),
        *keep_cols,
        *[
            (F.col("_s_len") - F.col(f"_s_{i}")).alias(f"_s_{i}")
            for i in range(len(scripts))
        ],
    )
    cnt = [F.col(f"_s_{i}") for i in range(len(scripts))]
    gmax = F.greatest(*cnt) if len(cnt) > 1 else cnt[0]
    pick = F.when(gmax == 0, F.lit("und"))
    for i, s in enumerate(scripts):
        pick = pick.when(cnt[i] == gmax, F.lit(s))
    return staged.select(F.col(id_col), pick.alias("ct_script"), *keep_cols)


def classify_lang_routed(
    docs: DataFrame,
    profiles: DataFrame,
    *,
    script_of_lang: dict[str, str] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 100,
    doc_top: int | None = None,
    penalty: int | None = None,
    keep_cols: tuple[str, ...] = (),
    norm_keep: str = NORM_KEEP_ROUTED,
) -> DataFrame:
    """``(id, ct_script, ct_lang, ct_dist, *keep_cols)`` — script-level
    dispatch in front of the trained CT profiles: ``classify_script``
    names the document's unicode script, and the out-of-place argmin is
    restricted to the languages of THAT script (``script_of_lang``,
    default ``SCRIPT_OF_LANG``). A script with no trained languages
    falls back to ``ct_lang = ct_script`` (script-granularity routing
    is exactly what the per-language gate params key on); a profiled-
    script document with no grams classifies ``'und'``.

    ``profiles`` must be trained with the SAME ``norm_keep`` (default
    ``NORM_KEEP_ROUTED``, the union alphabet over all profiled scripts:
    one normalization pass — grams from one script never collide with
    another script's profiles, so the union costs nothing in accuracy).

    Physical shape: ``classify_script``'s count projection and the
    distance machinery compose into ONE map-side chain — still zero
    shuffles, zero joins, zero Python — and each language's distance
    fold is SCRIPT-GATED (evaluated only on rows of that language's
    script; the per-script argmin never reads the others), so a row
    pays for its own script's languages, not the whole profile set."""
    doc_top = top_n if doc_top is None else doc_top
    penalty = top_n if penalty is None else penalty
    if doc_top < 1 or penalty < 1:
        raise ValueError("doc_top and penalty must be >= 1")
    sol = SCRIPT_OF_LANG if script_of_lang is None else script_of_lang
    prows = profiles.collect()  # bounded: langs x top_n
    langs = sorted({r.lang for r in prows})
    if not langs:
        raise ValueError("profiles is empty")
    missing = [lg for lg in langs if lg not in sol]
    if missing:
        raise ValueError(f"script_of_lang missing entries for {missing}")
    unknown = sorted({sol[lg] for lg in langs} - set(SCRIPT_RANGES))
    if unknown:
        raise ValueError(f"script_of_lang names unknown scripts {unknown}")
    _check_reserved("classify_lang_routed", id_col, keep_cols, len(langs))
    if "ct_script" in {id_col, *keep_cols}:
        raise ValueError("ct_script collides with the output script column")
    scr = classify_script(
        docs,
        id_col=id_col,
        text_col=text_col,
        # dedupe: a caller carrying text_col in keep_cols must not
        # project it twice
        keep_cols=tuple(dict.fromkeys((text_col, *keep_cols))),
    )
    costs = _distance_frame(
        scr,
        prows,
        langs,
        id_col=id_col,
        text_col=text_col,
        doc_top=doc_top,
        penalty=penalty,
        keep_cols=("ct_script", *keep_cols),
        norm_keep=norm_keep,
        # evaluate each language's fold only on its own script's rows
        # (the pick below never reads an off-script distance)
        script_gate={lg: sol[lg] for lg in langs},
    )
    by_script: dict[str, list[int]] = {}
    for i, lg in enumerate(langs):
        by_script.setdefault(sol[lg], []).append(i)
    profiled = sorted(by_script)
    # fallback first (unprofiled script -> the script label itself, which
    # is 'und' for scriptless docs), then gram-less, then per-script argmin
    lang_pick = F.when(
        ~F.col("ct_script").isin(profiled), F.col("ct_script")
    ).when(F.col("_m") == 0, F.lit("und"))
    dist_pick = F.when(
        (~F.col("ct_script").isin(profiled)) | (F.col("_m") == 0), F.lit(0)
    )
    for s in profiled:
        idxs = by_script[s]
        dcols = [F.col(f"_d_{i}") for i in idxs]
        if len(dcols) == 1:
            lang_pick = lang_pick.when(F.col("ct_script") == s, F.lit(langs[idxs[0]]))
            dist_pick = dist_pick.when(F.col("ct_script") == s, dcols[0])
            continue
        smin = F.least(*dcols)
        sub = F.when(dcols[0] == smin, F.lit(langs[idxs[0]]))
        for i in idxs[1:]:
            sub = sub.when(F.col(f"_d_{i}") == smin, F.lit(langs[i]))
        lang_pick = lang_pick.when(F.col("ct_script") == s, sub)
        dist_pick = dist_pick.when(F.col("ct_script") == s, smin)
    return costs.select(
        F.col("_id").alias(id_col),
        "ct_script",
        lang_pick.alias("ct_lang"),
        dist_pick.cast("long").alias("ct_dist"),
        *keep_cols,
    )
