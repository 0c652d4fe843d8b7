"""Classifier-based quality filtering (the GPT-3 / LLaMA recipe):
train a logistic-regression quality classifier on hashed bag-of-words
features, score every raw document, and keep a document when
``score > 1 − x`` with ``x`` drawn from a Pareto(α) — the stochastic
acceptance rule from GPT-3 Appendix A that keeps mostly-high-quality
documents while letting through a long tail of lower-scoring ones.

Spark-first shape:
- Features: MLlib ``HashingTF`` (2¹⁵ buckets) over the shared
  ``clean_words`` tokenization — JVM-side, no Python in the loop.
- Training: ``pyspark.ml.classification.LogisticRegression`` (LBFGS —
  deterministic, no sampling), a handful of distributed passes over
  cached feature vectors.
- Scoring: ``model.transform`` — a broadcast of the coefficient vector,
  map-side only.
- The Pareto draw is the repo's seeded md5 unit interval pushed through
  the inverse CDF ``x = u^(−1/α) − 1``, so the filter decision is a
  pure function of (doc_id, seed) — re-running the pipeline on grown
  data never flips a kept document, the same contract as
  ``functions/hashing.py::split_assign``.

Scale (100 TB): training runs on a SAMPLE (the classifier needs
~10⁵-10⁶ labeled examples, not the corpus); scoring is embarrassingly
parallel map work over hashed features — text never shuffles. The only
full-corpus aggregate is the optional holdout evaluation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import md5_unit_interval
from ..functions.text import clean_words
from ..session import ensure_utc
from ..sources import load_table
from .registry import register

N_FEATURES = 1 << 15


def rank_auc(
    scored: DataFrame,
    score_col: str = "quality_score",
    label_col: str = "label",
    tiebreak_col: str = "doc_id",
    extra_aggs: list[Column] | None = None,
):
    """Mann-Whitney rank AUC, fully distributed — no unpartitioned
    window (the r10 verdict found the old global
    ``row_number().over(Window.orderBy(...))`` single-task-sorts the
    whole holdout; this is the helper people reach for to AUC a FULL
    corpus, so the bottleneck had to go).

    Uses :func:`plans.windows.bucket_ranked` (range-partitioned
    two-pass rank — every bucket sorts in parallel) and fuses the AUC
    reduction plus any caller ``extra_aggs`` into ONE aggregate over
    the cached bucketed frame, so the corpus is ranked and reduced in
    a single pass, never checkpointed.

    Rank semantics are identical to the old window: deterministic
    ``(score, tiebreak)`` row_number — ties between a positive and a
    negative at the same score resolve by the tiebreaker, exactly as
    before (pytest-locked parity).

    Returns ``(auc, row)`` where ``row`` carries ``__n``/``__n_pos``
    and the results of ``extra_aggs``.
    """
    from .windows import bucket_ranked

    ranked, cached = bucket_ranked(
        scored, [score_col, tiebreak_col], rank_col="__r"
    )
    try:
        lbl = F.col(label_col).cast("long")
        row = ranked.agg(
            F.count("*").alias("__n"),
            F.sum(lbl).alias("__n_pos"),
            F.sum(F.when(lbl == 1, F.col("__r")).otherwise(0)).alias("__rank_pos"),
            *(extra_aggs or []),
        ).collect()[0]
    finally:
        cached.unpersist()
    n_pos = row["__n_pos"] or 0
    n_neg = row["__n"] - n_pos
    auc = (row["__rank_pos"] - n_pos * (n_pos + 1) / 2) / max(n_pos * n_neg, 1)
    return auc, row


def _featurize(docs: DataFrame, text_col: str = "text") -> DataFrame:
    from pyspark.ml.feature import HashingTF

    tokened = docs.withColumn("__toks", clean_words(text_col))
    tf = HashingTF(inputCol="__toks", outputCol="__features", numFeatures=N_FEATURES)
    return tf.transform(tokened).drop("__toks")


def train_quality_classifier(
    labeled: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    max_iter: int = 25,
    reg_param: float = 0.01,
):
    """Fit the quality LR on (text, label∈{0,1}) rows → fitted model.

    LBFGS logistic regression is deterministic given the data (no
    sampling, no random init) — the scored output is reproducible
    without a seed.
    """
    from pyspark.ml.classification import LogisticRegression

    feats = _featurize(labeled, text_col).withColumn(
        "__label", F.col(label_col).cast("double")
    )
    lr = LogisticRegression(
        featuresCol="__features",
        labelCol="__label",
        maxIter=max_iter,
        regParam=reg_param,
    )
    return lr.fit(feats)


def score_quality(
    model, docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Append ``quality_score`` = P(label=1 | text) to ``docs``."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(_featurize(docs, text_col))
    return scored.withColumn(
        "quality_score", vector_to_array("probability").getItem(1)
    ).drop("__features", "rawPrediction", "probability", "prediction")


def save_quality_model(model, path: str) -> None:
    """Persist the fitted LR (MLlib native format: metadata JSON +
    coefficient parquet — metadata-sized, engine-versioned). The
    train-once/score-everywhere seam: batch jobs, the CLI, and the
    streaming scorer all reload from here."""
    model.write().overwrite().save(path)


def load_quality_model(path: str):
    from pyspark.ml.classification import LogisticRegressionModel

    return LogisticRegressionModel.load(path)


def pareto_keep(
    score: Column | str,
    key: Column | str,
    alpha: float = 9.0,
    seed: str = "quality",
) -> Column:
    """GPT-3's stochastic filter: keep iff ``score > 1 − x``,
    ``x ~ Pareto(α)`` seeded per key (inverse CDF on the md5 unit
    draw: ``x = (1−u)^(−1/α) − 1``)."""
    s = F.col(score) if isinstance(score, str) else score
    u = md5_unit_interval(key, seed=seed)
    x = F.pow(1.0 - u, F.lit(-1.0 / alpha)) - 1.0
    return s > (1.0 - x)


def _planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic labeled corpus: every document doubled as a
    same-length spam rewrite (cycled junk vocabulary) with label 0.
    No randomness — both engines and every rerun see identical rows."""
    from ..sources.readers import spread

    ensure_utc(spark)
    docs = spread(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    spam_vocab = F.array(
        F.lit("buy"), F.lit("cheap"), F.lit("click"), F.lit("winner"), F.lit("prize")
    )
    spam_text = F.array_join(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(clean_words("text")), F.lit(1))),
            lambda i: F.element_at(spam_vocab, (i % 5) + 1),
        ),
        " ",
    )
    good = docs.select("doc_id", "text", F.lit(1).alias("label"))
    bad = docs.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        spam_text.alias("text"),
        F.lit(0).alias("label"),
    )
    return good.unionByName(bad)


@register(
    "quality_classifier_holdout",
    oracle="""
WITH planted AS (
  SELECT doc_id FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id FROM documents
),
split AS (
  SELECT doc_id,
         ('0x' || substr(md5('qsplit|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
           / 4294967296.0 < 0.7 AS is_train
  FROM planted
)
SELECT CAST(sum(CASE WHEN is_train THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
       CAST(sum(CASE WHEN is_train THEN 0 ELSE 1 END) AS BIGINT) AS n_eval,
       TRUE AS auc_ge_090,
       TRUE AS good_kept_ge_070,
       TRUE AS bad_kept_le_010
FROM split
""",
)
def quality_classifier_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Invariant check (the mllib_kmeans_coverage pattern — the oracle
    states the SQL-computable facts, the plan must reproduce them):
    train on a deterministic 70% md5 split of the planted good/spam
    corpus, then on the 30% holdout the classifier must reach AUC ≥
    0.90 and the seeded Pareto filter must keep ≥ 70% of good docs and
    ≤ 10% of spam. Library-only (contract cap); the split counts are
    exact cross-engine facts, the quality thresholds are the invariant.
    """
    corpus = _planted(spark, sf_dir)
    is_train = md5_unit_interval("doc_id", seed="qsplit") < 0.7
    corpus = corpus.withColumn("is_train", is_train).persist()
    try:
        train = corpus.filter("is_train")
        holdout = corpus.filter("NOT is_train")
        model = train_quality_classifier(train)
        scored = score_quality(model, holdout).select(
            "doc_id",
            "label",
            "quality_score",
            pareto_keep("quality_score", "doc_id").alias("kept"),
        )
        # Rank-based AUC (Mann-Whitney): distributed two-pass bucket
        # rank (no unpartitioned window), keep-counts fused into the
        # same aggregate pass.
        auc, agg = rank_auc(
            scored,
            extra_aggs=[
                F.sum(
                    F.when((F.col("label") == 1) & F.col("kept"), 1).otherwise(0)
                ).alias("good_kept"),
                F.sum(
                    F.when((F.col("label") == 0) & F.col("kept"), 1).otherwise(0)
                ).alias("bad_kept"),
            ],
        )
        n_pos = agg["__n_pos"]
        n_neg = agg["__n"] - n_pos
        n_train = train.count()
        return spark.createDataFrame(
            [
                (
                    n_train,
                    int(agg["__n"]),
                    bool(auc >= 0.90),
                    bool(agg["good_kept"] >= 0.70 * n_pos),
                    bool(agg["bad_kept"] <= 0.10 * n_neg),
                )
            ],
            "n_train long, n_eval long, auc_ge_090 boolean, "
            "good_kept_ge_070 boolean, bad_kept_le_010 boolean",
        )
    finally:
        corpus.unpersist()
