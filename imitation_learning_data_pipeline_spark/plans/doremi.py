"""DoReMi-style domain reweighting from excess bigram-LM loss.

DoReMi (Xie et al. 2023, "DoReMi: Optimizing Data Mixtures Speeds Up
Language Model Pretraining") chooses domain mixture weights by
upweighting domains with high EXCESS LOSS — loss the proxy model has
not yet reduced to the reference model's level — i.e. domains that are
hard but learnable. The full recipe interleaves Group-DRO weight
updates with proxy-model training; what a data pipeline can compute
without a GPU training loop is the one-shot estimate this module
ships: per-domain excess loss under the in-repo bigram LM family
(plans/lm.py), turned into exponentiated-gradient weights with uniform
smoothing — exactly one Group-DRO step from uniform, which is also how
the paper's released static weights are consumed downstream. The
output feeds plans/sampling.py::apply_mixture_plan unchanged.

Excess definition here: reference model = ONE bigram LM trained on the
pooled corpus (the uniform-mixture stand-in); per-domain ceiling = the
domain's OWN bigram LM (the best a domain-specialized proxy could do).
excess_d = mean_NLL_pooled(domain d) − mean_NLL_own(domain d) ≥ 0
measures how much the pooled model underfits domain d — the
hard-but-learnable headroom signal.

Scale shape — everything is vocabulary-bounded, the corpus is scanned
TWICE (the gram pass and the word-vocabulary pass — a single-word doc
has vocabulary but no bigram, so words can't derive from the gram
table): the per-(domain, gram) count table is the main corpus
aggregate and the pooled model's tables DERIVE from it by a second
tiny aggregate (sum over domains); the domain NLL sums need NO
doc-level scoring join at all, because Σ_instances nll(gram) =
Σ_grams count·nll(gram) — a weighted sum over the count table itself;
and the (domain, word) distinct table is pinned so both vocabulary
aggregates read it once.
The final softmax runs over k domain rows.

Cross-engine determinism: per-gram nll is integer-quantized at 1e-6
(the plans/lm.py discipline), multiplied by the exact integer
instance count, and summed as BIGINT (associative). The softmax
numerators exp(excess/η) are re-derived from the integer micro-nat
excess and quantized to 1e-9 integers BEFORE the normalization sum,
so the denominator is an exact integer too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import cache
from ..functions.rounding import quantize
from ..functions.text import clean_words, shingles_of_words
from ..session import ensure_utc
from ..sources import load_table
from .registry import register

_ALPHA = 0.5  # add-α smoothing, same as plans/lm.py
_ETA = 0.5  # exponentiated-gradient step (softmax temperature⁻¹)
_SMOOTH = 0.2  # uniform-smoothing mass, DoReMi's u-mixing


def doremi_domain_weights(
    docs: DataFrame,
    domain_col: str = "lang",
    text_col: str = "text",
    eta: float = _ETA,
    smoothing: float = _SMOOTH,
    alpha: float = _ALPHA,
) -> DataFrame:
    """(domain, n_bigrams, excess_micro, weight) — one row per domain.

    ``excess_micro`` is the per-bigram excess NLL in integer
    micro-nats; ``weight`` is the smoothed exponentiated-gradient
    mixture weight (sums to 1 across domains, quantized 1e-6).
    """
    cache.begin_plan()
    grams = docs.select(
        F.col(domain_col).alias("domain"),
        F.explode(shingles_of_words(clean_words(F.col(text_col)), 2)).alias("gram"),
    )
    # THE corpus aggregate: instance counts per (domain, gram). Pinned:
    # ctx_d / big_g / ctx_g / scored all branch from it — without the
    # pin each branch would re-run the corpus explode+aggregate (four
    # corpus scans instead of one).
    big_d = cache.pin(
        grams.groupBy("domain", "gram")
        .agg(F.count("*").alias("c_ab_d"))
        .withColumn("lft", F.split("gram", " ")[0])
    )
    ctx_d = big_d.groupBy("domain", "lft").agg(F.sum("c_ab_d").alias("c_a_d"))
    # pooled (reference) model derives from the domain table.
    big_g = big_d.groupBy("gram").agg(F.sum("c_ab_d").alias("c_ab_g"))
    ctx_g = big_d.groupBy("lft").agg(F.sum("c_ab_d").alias("c_a_g"))
    # vocabulary sizes: per-domain and pooled, BOTH from one pinned
    # (domain, word) distinct table — without the pin the eager v_g
    # collect and the lazy vocab_d branch would each re-tokenize the
    # corpus (a full extra scan apiece at the scale this module
    # advertises). Total corpus scans: 2 (grams + words) — the word
    # pass cannot derive from the bigram table because single-word
    # documents contribute vocabulary but no bigram.
    dwords = cache.pin(
        docs.select(
            F.col(domain_col).alias("domain"),
            F.explode(clean_words(F.col(text_col))).alias("w"),
        ).distinct()
    )
    vocab_d = dwords.groupBy("domain").agg(F.count("*").alias("v_d"))
    v_g = int(dwords.select("w").distinct().count())

    def _nll6(c_num, c_den, v):
        p = (c_num + F.lit(alpha)) / (c_den + F.lit(alpha) * v.cast("double"))
        return F.round(-F.log(p) * F.lit(1e6)).cast("long")

    scored = (
        big_d.join(ctx_d, ["domain", "lft"])
        .join(big_g, "gram")
        .join(ctx_g, "lft")
        .join(F.broadcast(vocab_d), "domain")
        .select(
            "domain",
            "c_ab_d",
            _nll6(F.col("c_ab_d"), F.col("c_a_d"), F.col("v_d")).alias("nll6_own"),
            _nll6(F.col("c_ab_g"), F.col("c_a_g"), F.lit(v_g)).alias("nll6_ref"),
        )
    )
    per_dom = scored.groupBy("domain").agg(
        F.sum("c_ab_d").alias("n_bigrams"),
        F.sum(F.col("c_ab_d") * F.col("nll6_ref")).alias("s6_ref"),
        F.sum(F.col("c_ab_d") * F.col("nll6_own")).alias("s6_own"),
    )
    per_dom = per_dom.select(
        "domain",
        "n_bigrams",
        F.greatest(
            F.lit(0),
            F.round(
                (F.col("s6_ref") - F.col("s6_own")).cast("double")
                / F.col("n_bigrams")
            ).cast("long"),
        ).alias("excess_micro"),
    )
    # softmax over k domain rows with integer-quantized numerators:
    # e9 = round(exp(excess/η)·1e9) so the normalization sum is exact.
    e9 = F.round(
        F.exp(F.col("excess_micro").cast("double") / F.lit(1e6) / F.lit(eta))
        * F.lit(1e9)
    ).cast("long")
    per_dom = per_dom.withColumn("e9", e9)
    totals = per_dom.agg(
        F.sum("e9").alias("e9_sum"), F.count("*").alias("k_domains")
    )
    weight = (
        F.lit(1.0 - smoothing)
        * (F.col("e9").cast("double") / F.col("e9_sum").cast("double"))
        + F.lit(smoothing) / F.col("k_domains").cast("double")
    )
    return (
        per_dom.crossJoin(F.broadcast(totals))
        .select(
            "domain",
            "n_bigrams",
            "excess_micro",
            quantize(weight, 6).alias("weight"),
        )
    )


# ONE oracle tokenizer definition per family: reuse plans/lm.py's
# clean_words/2-gram mirrors instead of a fresh copy (drift risk).
from .lm import _G2, _W  # noqa: E402


@register(
    "mixture_doremi_weights",
    oracle=f"""
WITH grams AS (
  SELECT lang AS domain, unnest({_G2}) AS gram FROM documents
),
big_d AS (
  SELECT domain, gram, string_split(gram, ' ')[1] AS lft,
         count(*) AS c_ab_d
  FROM grams GROUP BY domain, gram
),
ctx_d AS (
  SELECT domain, lft, sum(c_ab_d) AS c_a_d FROM big_d GROUP BY domain, lft
),
big_g AS (SELECT gram, sum(c_ab_d) AS c_ab_g FROM big_d GROUP BY gram),
ctx_g AS (SELECT lft, sum(c_ab_d) AS c_a_g FROM big_d GROUP BY lft),
vocab_d AS (
  SELECT lang AS domain, count(DISTINCT w) AS v_d
  FROM (SELECT lang, unnest({_W}) AS w FROM documents) GROUP BY lang
),
v_g AS (
  SELECT count(DISTINCT w) AS v
  FROM (SELECT unnest({_W}) AS w FROM documents)
),
scored AS (
  SELECT b.domain, b.c_ab_d,
         CAST(round(-ln((b.c_ab_d + {_ALPHA})
             / (cd.c_a_d + {_ALPHA} * vd.v_d)) * 1000000) AS BIGINT) AS nll6_own,
         CAST(round(-ln((bg.c_ab_g + {_ALPHA})
             / (cg.c_a_g + {_ALPHA} * (SELECT v FROM v_g))) * 1000000) AS BIGINT)
           AS nll6_ref
  FROM big_d b
  JOIN ctx_d cd ON b.domain = cd.domain AND b.lft = cd.lft
  JOIN big_g bg ON b.gram = bg.gram
  JOIN ctx_g cg ON b.lft = cg.lft
  JOIN vocab_d vd ON b.domain = vd.domain
),
per_dom AS (
  SELECT domain,
         CAST(sum(c_ab_d) AS BIGINT) AS n_bigrams,
         greatest(0, CAST(round(CAST(sum(c_ab_d * nll6_ref) - sum(c_ab_d * nll6_own)
             AS DOUBLE) / sum(c_ab_d)) AS BIGINT)) AS excess_micro
  FROM scored GROUP BY domain
),
withe AS (
  SELECT domain, n_bigrams, excess_micro,
         CAST(round(exp(CAST(excess_micro AS DOUBLE) / 1000000 / {_ETA}) * 1000000000)
              AS BIGINT) AS e9
  FROM per_dom
),
tot AS (SELECT sum(e9) AS e9_sum, count(*) AS k_domains FROM withe)
SELECT w.domain, w.n_bigrams, w.excess_micro,
       CAST(round(((1 - {_SMOOTH}) * (CAST(w.e9 AS DOUBLE) / CAST(t.e9_sum AS DOUBLE))
             + {_SMOOTH} / t.k_domains) * 1000000) AS BIGINT) / 1000000.0 AS weight
FROM withe w, tot t
""",
)
def mixture_doremi_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract query: DoReMi-style mixture weights over the documents
    corpus with language as the domain. Five rows, integer excess +
    quantized weights — drop-in input for apply_mixture_plan."""
    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents").select("lang", "text")
    return doremi_domain_weights(docs, domain_col="lang")
