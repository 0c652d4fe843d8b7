"""Corpus-trained n-gram language model scoring.

Perplexity-based data selection (the CCNet/Gopher recipe: score every
document under a reference LM, keep/bucket by perplexity) needs a
scorer. ``plans/sampling.py::sample_perplexity_buckets`` ships the
bucket/accept machinery with a pluggable scorer seam; this module
provides a REAL in-repo scorer — an add-α-smoothed bigram model
trained ON the corpus with plain DataFrame aggregations — so the whole
select-by-perplexity path runs end-to-end without external model
weights.

Model: p(r | l) = (c(l r) + α) / (c(l ·) + α·V), where c(l r) is the
corpus count of bigram "l r", c(l ·) = Σ_r c(l r) the context count,
and V the unigram vocabulary size. Per-document score is the average
negative log-likelihood over the doc's bigrams (lower = more like the
corpus); unseen bigrams and unseen contexts are well-defined through
the smoothing (coalesce to 0 counts).

Scale shape:
- training is two hash aggregations bounded by the DISTINCT bigram /
  context vocabulary (map-side combined) plus one scalar (V) — the
  corpus is scanned once;
- scoring joins the doc-bigram stream against the two count tables on
  their gram keys. The LM tables are vocabulary-bounded; Spark/AQE
  broadcast them when small, shuffle-join otherwise — either way no
  state grows with corpus size beyond the vocabulary.

Cross-engine determinism (registry rules): a float SUM is
order-dependent, so each bigram's nll is integer-quantized at 1e-6
FIRST (functions/rounding.py::quantize discipline — portable integer
rounding), the per-doc SUM runs over exact BIGINTs (associative), and
the final average is quantized at 1e-4. ``F.log`` (java.lang.Math.log)
and DuckDB ``ln`` are both <=1-ulp implementations; the 1e-6
quantization boundary sits ~1e4 ulps away at these magnitudes, and the
``--audit`` sweep measures the margin rather than assuming it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import quantize
from ..functions.text import clean_words, shingles_of_words
from .registry import register

_ALPHA = 0.5


def train_bigram_lm(
    df: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, DataFrame, int]:
    """(bigram counts, context counts, vocabulary size) from the
    corpus — the trained model. Both frames are vocabulary-bounded;
    persist or write them to reuse across scoring runs."""
    words = df.select(clean_words(F.col(text_col)).alias("__w"))
    big = (
        words.select(
            F.explode(shingles_of_words(F.col("__w"), 2)).alias("gram")
        )
        .groupBy("gram")
        .agg(F.count("*").alias("c_ab"))
    )
    ctx = (
        big.withColumn("left", F.split(F.col("gram"), " ")[0])
        .groupBy("left")
        .agg(F.sum("c_ab").alias("c_a"))
    )
    vocab = (
        words.select(F.explode("__w").alias("w")).agg(
            F.countDistinct("w").alias("v")
        )
    ).collect()[0]["v"]
    return big, ctx, int(vocab)


def score_bigram_nll(
    df: DataFrame,
    big: DataFrame,
    ctx: DataFrame,
    vocab: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = _ALPHA,
) -> DataFrame:
    """(id, n_bigrams, avg_nll) per document under the trained model.
    Docs with no bigram (fewer than two words) are omitted — their
    likelihood is undefined, and both engines agree by construction.
    Lower avg_nll = closer to the training corpus."""
    doc_grams = df.select(
        F.col(id_col),
        F.explode(
            shingles_of_words(clean_words(F.col(text_col)), 2)
        ).alias("gram"),
    ).withColumn("left", F.split(F.col("gram"), " ")[0])
    prob = (
        doc_grams.join(big, "gram", "left_outer")
        .join(ctx, "left", "left_outer")
        .select(
            F.col(id_col),
            (
                (F.coalesce(F.col("c_ab"), F.lit(0)) + F.lit(alpha))
                / (
                    F.coalesce(F.col("c_a"), F.lit(0))
                    + F.lit(alpha) * F.lit(float(vocab))
                )
            ).alias("p"),
        )
    )
    # integer-quantize EACH bigram's nll before summing: BIGINT sums
    # are associative, so the fold order Spark picks cannot shift the
    # result (module doc, determinism)
    nll6 = F.round(-F.log("p") * F.lit(1e6)).cast("long")
    return (
        prob.select(F.col(id_col), nll6.alias("nll6"))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum("nll6").alias("s6"),
        )
        .select(
            id_col,
            F.col("n_bigrams").cast("long").alias("n_bigrams"),
            quantize(
                F.col("s6").cast("double") / 1e6 / F.col("n_bigrams"), 4
            ).alias("avg_nll"),
        )
    )


# --- library entry (oracle-backed, --all gate; contract is at cap) -----------

# DuckDB mirror of clean_words + 2-gram shingles (the text.py parity
# fragments, restated here so the oracle is self-contained)
_W = "list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'), x -> x <> '')"
_G2 = (
    f"list_filter(list_transform(range(1, greatest(len({_W}) - 0, 1)), "
    f"i -> array_to_string(({_W})[i:i+1], ' ')), x -> x <> '')"
)

_LM_ORACLE = f"""
WITH grams AS (
  SELECT doc_id, unnest({_G2}) AS gram FROM documents
),
big AS (
  SELECT gram, count(*) AS c_ab FROM grams GROUP BY gram
),
ctx AS (
  SELECT string_split(gram, ' ')[1] AS lft, sum(c_ab) AS c_a
  FROM big GROUP BY lft
),
v AS (
  SELECT count(DISTINCT w) AS vocab
  FROM (SELECT unnest({_W}) AS w FROM documents)
),
scored AS (
  SELECT g.doc_id,
         CAST(round(-ln(
           (b.c_ab + 0.5)
           / (c.c_a + 0.5 * (SELECT vocab FROM v))
         ) * 1000000) AS BIGINT) AS nll6
  FROM grams g
  JOIN big b USING (gram)
  JOIN ctx c ON string_split(g.gram, ' ')[1] = c.lft
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(round((CAST(sum(nll6) AS DOUBLE) / 1000000 / count(*)) * 10000)
            AS BIGINT) / 10000.0 AS avg_nll
FROM scored
GROUP BY doc_id
"""


@register("text_bigram_lm_nll", oracle=_LM_ORACLE)
def text_bigram_lm_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the bigram LM on the documents corpus and score every
    document's average negative log-likelihood under it (self-scoring:
    every bigram is seen, so the oracle's inner joins are exact
    mirrors of the left joins). Library row, --all gate."""
    from ..session import ensure_utc
    from ..sources import load_table
    from ..sources.readers import spread

    ensure_utc(spark)
    docs = spread(load_table(spark, sf_dir, "documents"))
    big, ctx, v = train_bigram_lm(docs)
    return score_bigram_nll(docs, big, ctx, v)


def lm_perplexity_buckets(
    docs: DataFrame,
    n_buckets: int = 10,
    keep_rates: list[float] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: str = "lmkeep",
    accuracy: int = 10_000,
) -> DataFrame:
    """The CCNet recipe end-to-end on the in-repo scorer: train the
    bigram LM on ``docs``, score every document, bucket by CORPUS-
    RELATIVE score quantiles, and keep each bucket at its own rate
    (thin the too-clean head and the noisy tail, keep the fluent
    middle). Returns (id, bucket, avg_nll) for kept documents.

    Bucketing uses ``percentile_approx`` boundaries — ONE aggregate
    row, then a map-side comparison per doc — instead of an ntile
    window, which would global-sort the corpus at 100 TB. The keep
    decision is the repo's seeded md5 unit-interval predicate, so
    membership is stable under corpus growth (a re-run on grown data
    never flips an already-kept document's coin).
    """
    from ..functions.hashing import md5_unit_interval
    from .sampling import _PPL_KEEP_RATES

    rates = keep_rates if keep_rates is not None else _PPL_KEEP_RATES
    if len(rates) != n_buckets:
        raise ValueError(
            f"lm_perplexity_buckets: keep_rates has {len(rates)} entries "
            f"for {n_buckets} buckets"
        )
    big, ctx, v = train_bigram_lm(docs, text_col)
    scored = score_bigram_nll(
        docs, big, ctx, v, text_col=text_col, id_col=id_col
    )
    probs = [i / n_buckets for i in range(1, n_buckets)]
    (bounds_row,) = scored.agg(
        F.percentile_approx("avg_nll", probs, accuracy).alias("b")
    ).collect()
    bounds = list(bounds_row["b"] or [])
    bucket = sum(
        (F.col("avg_nll") > F.lit(float(b))).cast("int") for b in bounds
    ) if bounds else F.lit(0)
    u = md5_unit_interval(id_col, seed)
    rate = F.element_at(
        F.array(*[F.lit(float(r)) for r in rates]), bucket + F.lit(1)
    )
    return (
        scored.withColumn("bucket", bucket.cast("int"))
        .filter(u < rate)
        .select(id_col, "bucket", "avg_nll")
    )
