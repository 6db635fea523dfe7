"""Ad-hoc variant profiler: times alternative physical strategies for the
slow bench queries side by side at a given SF so optimization decisions are
measured, not guessed. Not part of the driver surface."""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from kafka_connect_ftp_spark.session import get_spark, load_tables

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
_TOKS = "filter(split(text, ' '), x -> x <> '')"


def timed(name, df):
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    print(f"{name}: {time.time() - t0:.2f}s", flush=True)


def docs(spark):
    return load_tables(spark, SF_DIR, "documents")["documents"]


def simhash_current(spark):
    from kafka_connect_ftp_spark.plans import registry

    return registry()["simhash_fingerprint"].fn(spark, SF_DIR)


def simhash_conv(spark):
    df = docs(spark).repartition(spark.sparkContext.defaultParallelism, "doc_id")
    tok = df.select("doc_id", F.explode(F.expr(_TOKS)).alias("tk")).select(
        "doc_id",
        F.conv(F.substring(F.md5(F.col("tk").cast("binary")), 1, 8), 16, 10)
        .cast("long")
        .alias("h"),
    )
    # bit p of h == hex digit k's bit b with p = (8-k)*4 + b; s_p >= 0
    # iff 2*ones_p >= n
    aggs = [
        F.sum(F.shiftright(F.col("h"), p).bitwiseAND(F.lit(1))).alias(f"c{p}")
        for p in range(32)
    ] + [F.count(F.lit(1)).alias("n")]
    bits = tok.groupBy("doc_id").agg(*aggs)
    simhash = None
    for p in range(32):
        term = F.when(F.col(f"c{p}") * 2 >= F.col("n"), F.lit(1 << p)).otherwise(F.lit(0))
        simhash = term if simhash is None else simhash + term
    return bits.select("doc_id", simhash.cast("long").alias("simhash")).orderBy("doc_id")


_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in"],
    "de": ["der", "die", "das", "und", "ist"],
    "es": ["el", "los", "una", "que", "por"],
    "fr": ["le", "les", "et", "dans", "pour"],
}
_TOKEN_RX = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def text_profile_current(spark):
    from kafka_connect_ftp_spark.plans import registry

    return registry()["text_profile"].fn(spark, SF_DIR)


def text_profile_exploded(spark):
    df = docs(spark).repartition(spark.sparkContext.defaultParallelism, "doc_id")
    tok = df.select("doc_id", F.explode(F.expr(_TOKS)).alias("tk"))
    all_words = F.create_map(
        *[x for lang, ws in _STOPWORDS.items() for w in ws for x in (F.lit(w), F.lit(lang))]
    )
    tagged = tok.withColumn("lang", all_words[F.col("tk")])
    stats = tagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.count_distinct("tk").alias("n_distinct_tokens"),
        F.sum(F.length("tk")).alias("tok_chars"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("en_hits"),
        F.sum(F.when(F.col("lang") == "de", 1).otherwise(0)).alias("de_hits"),
        F.sum(F.when(F.col("lang") == "es", 1).otherwise(0)).alias("es_hits"),
        F.sum(F.when(F.col("lang") == "fr", 1).otherwise(0)).alias("fr_hits"),
    )
    bpe = F.expr(f"regexp_extract_all(text, '{_TOKEN_RX}', 0)")
    norm = F.trim(
        F.regexp_replace(F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "), " +", " ")
    )
    mapside = df.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_calc"),
        F.size(bpe).cast("long").alias("n_bpe_tokens"),
        F.size(F.array_distinct(bpe)).cast("long").alias("n_distinct_bpe_tokens"),
        F.md5(norm.cast("binary")).alias("norm_fp"),
    )
    hits = {k: F.col(f"{k}_hits") for k in _STOPWORDS}
    all_zero = (hits["en"] == 0) & (hits["de"] == 0) & (hits["es"] == 0) & (hits["fr"] == 0)
    pred = (
        F.when(all_zero, "und")
        .when((hits["en"] >= hits["de"]) & (hits["en"] >= hits["es"]) & (hits["en"] >= hits["fr"]), "en")
        .when((hits["de"] >= hits["es"]) & (hits["de"] >= hits["fr"]), "de")
        .when(hits["es"] >= hits["fr"], "es")
        .otherwise("fr")
    )
    ratio = F.col("n_distinct_tokens").cast("double") / F.col("n_tokens")
    return (
        stats.join(mapside, "doc_id")
        .select(
            "doc_id",
            "n_chars_calc",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("n_distinct_tokens").cast("long").alias("n_distinct_tokens"),
            F.round(ratio, 4).alias("distinct_ratio"),
            F.round(F.col("tok_chars").cast("double") / F.col("n_tokens"), 4).alias("avg_token_len"),
            F.round(ratio * (F.least(F.col("n_tokens"), F.lit(64)) / F.lit(64.0)), 4).alias("quality_score"),
            F.col("en_hits").cast("long").alias("en_hits"),
            F.col("de_hits").cast("long").alias("de_hits"),
            F.col("es_hits").cast("long").alias("es_hits"),
            F.col("fr_hits").cast("long").alias("fr_hits"),
            pred.alias("pred_lang"),
            "n_bpe_tokens",
            "n_distinct_bpe_tokens",
            "norm_fp",
        )
        .orderBy("doc_id")
    )


def near_dup_current(spark):
    from kafka_connect_ftp_spark.plans import registry

    return registry()["embedding_near_dup_pairs"].fn(spark, SF_DIR)


def near_dup_pandas(spark):
    import numpy as np
    import pandas as pd

    emb = load_tables(spark, SF_DIR, "embeddings")["embeddings"].select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"), "label"
    )

    def block_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame({"vec_a": [], "vec_b": [], "cos_sim": []})
        pdf = pdf.sort_values("vec_id")
        ids = pdf["vec_id"].to_numpy()
        m = np.stack(pdf["v"].to_numpy())
        nrm = np.sqrt((m * m).sum(axis=1))
        sim = (m @ m.T) / np.outer(nrm, nrm)
        ia, ib = np.triu_indices(len(ids), k=1)
        keep = sim[ia, ib] >= 0.3
        return pd.DataFrame(
            {"vec_a": ids[ia[keep]], "vec_b": ids[ib[keep]], "cos_sim": sim[ia, ib][keep]}
        )

    return (
        emb.groupBy("label")
        .applyInPandas(block_pairs, "vec_a long, vec_b long, cos_sim double")
        .select("vec_a", "vec_b", F.round("cos_sim", 4).alias("cos_sim"))
        .orderBy("vec_a", "vec_b")
    )


_MAX_SHINGLE_DF = 100


def ngram_current(spark):
    from kafka_connect_ftp_spark.plans import registry

    return registry()["ngram_jaccard_pairs"].fn(spark, SF_DIR)


def ngram_onepass(spark):
    df = (
        docs(spark)
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
        .withColumn("tk", F.expr(_TOKS))
        .filter(F.size("tk") >= 3)
    )
    shingles = df.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr(
                    "transform(sequence(1, greatest(size(tk) - 2, 1)),"
                    " i -> concat_ws(' ', element_at(tk, i), element_at(tk, i + 1), element_at(tk, i + 2)))"
                )
            )
        ).alias("sh"),
    )
    postings = (
        shingles.groupBy("sh")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") <= _MAX_SHINGLE_DF)
    )
    # one explode emits pairs AND per-doc singletons; a==b rows aggregate to
    # the post-cap shingle count per doc, a<b rows to the intersections
    emit = postings.select(
        F.explode(
            F.expr(
                "concat("
                " transform(ids, x -> struct(x AS a, x AS b)),"
                " flatten(transform(ids, (x, i) ->"
                "   transform(slice(ids, i + 2, size(ids) - i - 1), y -> struct(x AS a, y AS b)))))"
            )
        ).alias("p")
    ).groupBy("p.a", "p.b").agg(F.count(F.lit(1)).alias("ct"))
    counts = emit.cache()
    sizes = counts.filter(F.col("a") == F.col("b")).select(
        F.col("a").alias("doc_id"), F.col("ct").alias("n_sh")
    )
    pairs = counts.filter(F.col("a") < F.col("b")).select(
        F.col("a").alias("doc_a"), F.col("b").alias("doc_b"), F.col("ct").alias("n_inter")
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    jac = F.col("n_inter").cast("double") / (F.col("na") + F.col("nb") - F.col("n_inter"))
    return (
        pairs.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .filter(jac >= 0.2)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )


def main():
    spark = get_spark("profile")
    spark.range(1).count()
    which = sys.argv[2:] or ["simhash"]
    if "simhash" in which:
        timed("simhash_current", simhash_current(spark))
        timed("simhash_conv", simhash_conv(spark))
        timed("simhash_current_2", simhash_current(spark))
        timed("simhash_conv_2", simhash_conv(spark))
        # correctness cross-check
        a = simhash_current(spark).collect()
        b = simhash_conv(spark).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b], "variant mismatch"
        print("variants agree")
    if "text_profile" in which:
        timed("text_profile_current", text_profile_current(spark))
        timed("text_profile_exploded", text_profile_exploded(spark))
        timed("text_profile_current_2", text_profile_current(spark))
        timed("text_profile_exploded_2", text_profile_exploded(spark))
        a = text_profile_current(spark).collect()
        b = text_profile_exploded(spark).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b], "variant mismatch"
        print("variants agree")
    if "near_dup" in which:
        timed("near_dup_current", near_dup_current(spark))
        timed("near_dup_pandas", near_dup_pandas(spark))
        timed("near_dup_current_2", near_dup_current(spark))
        timed("near_dup_pandas_2", near_dup_pandas(spark))
        a = near_dup_current(spark).collect()
        b = near_dup_pandas(spark).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b], "variant mismatch"
        print("variants agree")
    if "ngram" in which:
        timed("ngram_current", ngram_current(spark))
        timed("ngram_onepass", ngram_onepass(spark))
        timed("ngram_current_2", ngram_current(spark))
        timed("ngram_onepass_2", ngram_onepass(spark))
        a = ngram_current(spark).collect()
        b = ngram_onepass(spark).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b], "variant mismatch"
        print("variants agree")


if __name__ == "__main__":
    main()
