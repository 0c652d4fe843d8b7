"""Additional relational benchmarks: TPC-H-shaped Q3/Q6 analogues.

These strengthen the multi-join + selective-scan coverage: Q3 is the
classic join-then-topk shipping-priority shape, Q6 the pure
predicate-pushdown revenue scan (the plan should be a single filtered
scan + one partial/final agg, nothing else).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import ensure_utc
from ..sources import load_table
from .registry import register


@register(
    "q3_shipping_priority",
    oracle="""
SELECT l.l_orderkey AS okey,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
       o.o_orderpriority AS priority
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l.l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, okey
LIMIT 10
""",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_utc(spark)
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit("1998-01-01 00:00:00").cast("timestamp")
    seg = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    o = orders.filter(F.col("o_orderdate") < cutoff).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    l = li.filter(F.col("l_shipdate") > cutoff).select(  # noqa: E741
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(seg), F.col("o_custkey") == seg.c_custkey)
        .groupBy(
            F.col("l_orderkey").alias("okey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "okey")
        .limit(10)
        .select("okey", "revenue", "orderdate", "priority")
    )


@register(
    "q6_forecast_revenue",
    oracle="""
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The whole query is PushedFilters + one agg — .explain shows all four
    # predicates at the parquet scan and a 3-column ReadSchema.
    ensure_utc(spark)
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "agg_approx_sketches",
    oracle="""
SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_distinct_parts,
       TRUE AS hll_within_5pct,
       TRUE AS qsketch_within_tol,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS exact_distinct_supps,
       TRUE AS hll_supp_within_5pct
FROM lineitem
""",
)
def agg_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates (HLL count-distinct, quantile sketch) with
    oracle-checkable error-bound invariants.

    Sketch outputs aren't bit-comparable across engines, so this uses the
    same invariant-companion pattern as the MLlib checks: the plan
    computes BOTH the sketch and the exact value, and exports the exact
    values plus booleans asserting the sketch landed inside its
    documented error bound (HLL rsd=0.02 → 5% slack; percentile_approx
    at accuracy 10000 vs exact percentile → 1% of range). At 100 TB the
    sketches are the only affordable form — approx_count_distinct is one
    pass with O(1) state per group vs a full shuffle for exact distinct.
    """
    ensure_utc(spark)
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("hll_parts"),
        F.countDistinct("l_suppkey").alias("exact_supps"),
        F.approx_count_distinct("l_suppkey", rsd=0.02).alias("hll_supps"),
        F.expr("percentile_approx(l_extendedprice, 0.5, 10000)").alias("ap50"),
        F.percentile("l_extendedprice", F.lit(0.5)).alias("ex50"),
        (F.max("l_extendedprice") - F.min("l_extendedprice")).alias("rng"),
    )
    within = lambda a, e: (F.abs(F.col(a) - F.col(e)) / F.col(e)) <= 0.05  # noqa: E731
    return agg.select(
        F.col("exact_parts").cast("long").alias("exact_distinct_parts"),
        within("hll_parts", "exact_parts").alias("hll_within_5pct"),
        (F.abs(F.col("ap50") - F.col("ex50")) <= F.col("rng") * 0.01).alias(
            "qsketch_within_tol"
        ),
        F.col("exact_supps").cast("long").alias("exact_distinct_supps"),
        within("hll_supps", "exact_supps").alias("hll_supp_within_5pct"),
    )


# --- count-min sketch: approximate frequency with deterministic hashing ------
#
# Completes the sketch family (HLL distinct + KLL quantiles in
# agg_approx_sketches) with the approximate COUNTER: d independent md5
# hash rows × w buckets; an item's estimate is the MIN over its d
# counters — never an underestimate, overestimate bounded by collisions
# (ε ≈ e/w of total mass with probability 1−e^−d). The md5 bucketing is
# bit-identical on every engine, so unlike library CMS implementations
# this one is exactly oracle-checkable.

_CMS_W = 1024  # buckets per hash row
_CMS_D = 4  # independent hash rows


def _cms_bucket_sql(d: int, col: str = "word") -> str:
    return (
        f"('0x' || substr(md5({d} || '|' || {col}), 1, 8))::BIGINT % {_CMS_W}"
    )


@register(
    "sketch_count_min",
    oracle=f"""
WITH toks AS (
  SELECT unnest(list_filter(string_split(trim(regexp_replace(regexp_replace(
           lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' '),
         x -> x <> '')) AS word
  FROM documents
),
counters AS (
  SELECT d, bucket, count(*) AS c
  FROM (
    {" UNION ALL ".join(f"SELECT {d} AS d, {_cms_bucket_sql(d)} AS bucket, word FROM toks" for d in range(_CMS_D))}
  )
  GROUP BY d, bucket
),
truth AS (SELECT word, count(*) AS n_true FROM toks GROUP BY word),
est AS (
  SELECT t.word, t.n_true, min(c.c) AS n_cms
  FROM truth t
  JOIN counters c
    ON (
      {" OR ".join(f"(c.d = {d} AND c.bucket = {_cms_bucket_sql(d, 't.word')})" for d in range(_CMS_D))}
    )
  GROUP BY t.word, t.n_true
)
SELECT word, n_true, n_cms FROM est
""",
)
def sketch_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over document word frequencies, checked against
    truth: (word, n_true, n_cms) with n_cms ≥ n_true always.

    Build: one token explode → d=4 (hash-row, bucket) keys per token →
    ONE groupBy counts all d×w=4096 counters (map-side partials; counter
    table size is fixed, independent of corpus size — that's the point
    of a sketch: the 100 TB shuffle is 4096 rows). Estimates join each
    distinct word to its d counters and take the min. Deterministic md5
    bucketing keeps Spark and the oracle bit-identical.
    """
    from ..functions.text import clean_words

    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents").select("text")
    toks = docs.select(F.explode(clean_words("text")).alias("word"))

    def bucket(d: int, col: str = "word"):
        return (
            F.conv(F.substring(F.md5(F.concat(F.lit(f"{d}|"), F.col(col))), 1, 8), 16, 10)
            .cast("long") % _CMS_W
        )

    keyed = toks.select(
        "word",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(d).alias("d"), bucket(d).alias("bucket"))
                    for d in range(_CMS_D)
                ]
            )
        ).alias("k"),
    ).select("word", F.col("k.d").alias("d"), F.col("k.bucket").alias("bucket"))
    counters = keyed.groupBy("d", "bucket").agg(F.count("*").alias("c"))

    truth = toks.groupBy("word").agg(F.count("*").alias("n_true"))
    probes = truth.select(
        "word",
        "n_true",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(d).alias("d"), bucket(d).alias("bucket"))
                    for d in range(_CMS_D)
                ]
            )
        ).alias("k"),
    ).select("word", "n_true", F.col("k.d").alias("d"), F.col("k.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(counters), ["d", "bucket"])
        .groupBy("word", "n_true")
        .agg(F.min("c").alias("n_cms"))
        .select("word", "n_true", "n_cms")
    )
