"""Model-based document quality scoring — the classifier stage of the
GPT-3 / CCNet / LLaMA data pipelines: train a linear classifier to
separate a trusted reference corpus (positive class) from raw crawl
(negative class), score every document with the probability it "looks
like" the reference, and keep documents by score — optionally through
the GPT-3-style Pareto acceptance rule, which keeps most high-scoring
documents while still admitting a long tail of low scorers instead of
hard-thresholding (Brown et al. 2020, Appendix A).

Rule-based gates (plans/llm_pipeline.py quality_filter_flags,
operators/repetition.py) catch mechanical junk; the classifier catches
what rules can't express — "this passes every length/repetition check
but doesn't read like the reference distribution".

Spark mapping:
- features are hashed token counts (``HashingTF`` over the engine's
  whitespace tokenizer — the fasttext-style bag-of-words surrogate;
  hashing keeps the feature space FIXED-WIDTH so no vocabulary is
  collected or broadcast, exactly what makes the featurizer viable on
  an unbounded corpus);
- training (``LogisticRegression``) is the one iterative step and runs
  once per pipeline build over the labeled sample, never per document;
- scoring is ``model.transform`` — JVM-side (no Python UDF: pyspark.ml
  featurizers and LR prediction execute as JVM expressions over the
  batch), one map-side pass over the corpus, zero shuffles;
- the Pareto acceptance rule is a pure column expression seeded by
  ``xxhash64(id)``: deterministic per document, reproducible across
  runs/partitionings — ``np.random.pareto`` in the original is replaced
  by the inverse-CDF transform of a hash-uniform, so the decision needs
  no RNG state and re-runs byte-identically (same convention as
  operators/splits.py's hash-keyed splits).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TOKS = "filter(split({col}, ' '), x -> x <> '')"


# pyspark.ml's fixed pipeline column names; score_quality drops them
# from its output, so a caller frame must not already use them — fail
# loudly instead of silently clobbering a user column
_RESERVED = ("_tokens", "features", "rawPrediction", "probability", "prediction")


def _featurize(docs: DataFrame, text_col: str, n_features: int) -> DataFrame:
    from pyspark.ml.feature import HashingTF

    clashes = [c for c in _RESERVED if c in docs.columns]
    if clashes:
        raise ValueError(
            f"input columns {clashes} collide with the ml pipeline's "
            f"reserved names {_RESERVED}; rename them before scoring"
        )
    toks = docs.withColumn("_tokens", F.expr(_TOKS.format(col=text_col)))
    tf = HashingTF(
        inputCol="_tokens", outputCol="features", numFeatures=n_features
    )
    return tf.transform(toks).drop("_tokens")


def train_quality_classifier(
    positive: DataFrame,
    negative: DataFrame,
    *,
    text_col: str = "text",
    n_features: int = 1 << 18,
    max_iter: int = 50,
    reg_param: float = 1e-4,
):
    """Fit the reference-vs-crawl classifier. ``positive`` is the
    trusted corpus sample, ``negative`` the raw one; both only need
    ``text_col``. Returns the fitted LogisticRegressionModel (plus the
    feature width rides on the model params). Training is deterministic
    for a fixed input + partitioning (LBFGS from a zero start)."""
    from pyspark.ml.classification import LogisticRegression

    labeled = _featurize(
        positive.select(F.col(text_col)).withColumn("label", F.lit(1.0)).unionByName(
            negative.select(F.col(text_col)).withColumn("label", F.lit(0.0))
        ),
        text_col,
        n_features,
    )
    lr = LogisticRegression(
        maxIter=max_iter, regParam=reg_param, featuresCol="features", labelCol="label"
    )
    return lr.fit(labeled)


def save_quality_model(model, path: str) -> None:
    """Persist a trained classifier with Spark ML's native writer (a
    metadata JSON + coefficients parquet directory) — the artifact
    convention of :func:`bpe.save_merges` and the IVF index sidecars: a
    production pipeline trains ONCE over the labeled sample and every
    subsequent corpus-scoring job loads the artifact instead of
    re-running LBFGS. Overwrites any prior artifact at ``path``."""
    model.write().overwrite().save(path)


def load_quality_model(spark, path: str):
    """Load a classifier saved by :func:`save_quality_model`. The Spark
    ML reader resolves the session internally; ``spark`` exists for
    artifact-API symmetry with :func:`bpe.load_merges` and the IVF
    sidecar readers, and is deliberately otherwise unused."""
    del spark
    from pyspark.ml.classification import LogisticRegressionModel

    return LogisticRegressionModel.load(path)


def score_quality(
    docs: DataFrame,
    model,
    *,
    text_col: str = "text",
    score_col: str = "quality_score",
) -> DataFrame:
    """One row per document: every input column plus ``score_col`` — the
    model's P(reference | doc). Featurize + transform are one map-side
    JVM pass; nothing shuffles."""
    n_features = model.numFeatures
    feats = _featurize(docs, text_col, n_features)
    scored = model.transform(feats)
    # probability is a 2-class ml Vector; element 1 is P(label=1)
    from pyspark.ml.functions import vector_to_array

    return scored.withColumn(
        score_col, vector_to_array("probability")[1]
    ).drop("features", "rawPrediction", "probability", "prediction")


def pareto_keep(
    score_col: str = "quality_score",
    *,
    id_col: str = "doc_id",
    alpha: float = 9.0,
    salt: str = "quality-pareto-v1",
) -> Column:
    """The GPT-3 acceptance rule as a deterministic column: keep a
    document iff ``score > 1 - pareto_draw`` where the draw is the
    inverse-CDF transform ``u^(-1/alpha) - 1`` of a hash-uniform ``u``
    keyed on (salt, id) — P(keep | score s) = (2 - s)^(-alpha), the
    exact acceptance probability of the original
    ``np.random.pareto(alpha) > 1 - score`` rule. High scores almost
    always pass; low scores pass with probability ~ the Pareto tail,
    preserving diversity a hard threshold would destroy. Deterministic
    per id — identical across runs, partitionings and engines.

    The uniform is ``mixing.uniform_hash`` (the engine's ONE
    hash-to-uniform definition): its (0, 1] range maps to a draw in
    [0, inf) with no boundary blow-up — a raw [0, 1) uniform fed
    through ``(1-u)^(-1/alpha)`` can hit u→1 and yield an Infinity draw
    that keeps a document regardless of score."""
    from kafka_connect_ftp_spark.operators.mixing import uniform_hash

    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    u = uniform_hash(F.col(id_col), salt)
    draw = F.pow(u, F.lit(-1.0 / alpha)) - F.lit(1.0)
    return F.col(score_col) > (F.lit(1.0) - draw)
