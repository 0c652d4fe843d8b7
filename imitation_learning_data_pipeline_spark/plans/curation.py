"""Corpus-curation composite + ordered-set/cube aggregates.

pipeline_corpus_curation is the LLM-training-data showcase: quality
filter → exact dedup (keep min doc_id) → per-language survivor report —
three stages of the curation funnel in one declarative plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import normalize_text
from ..session import ensure_utc
from ..sources import load_table
from .dedup import _NORM_SQL
from .registry import register


@register(
    "pipeline_corpus_curation",
    oracle=f"""
WITH scored AS (
  SELECT doc_id, lang,
         md5({_NORM_SQL}) AS content_hash,
         len(list_filter(string_split({_NORM_SQL}, ' '), x -> x <> '')) AS n_words
  FROM documents
), quality AS (
  SELECT * FROM scored WHERE n_words >= 20
), deduped AS (
  SELECT content_hash, min(doc_id) AS doc_id, min(lang) AS lang,
         min(n_words) AS n_words
  FROM quality GROUP BY content_hash
)
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(n_words) AS BIGINT) AS total_words,
       round(avg(n_words), 4) AS avg_words
FROM deduped GROUP BY lang
""",
)
def pipeline_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality gate → exact dedup → per-language corpus report.

    The funnel every pretraining corpus goes through; here all three
    stages fuse into scan → hash-agg → hash-agg (two exchanges total,
    no text shuffled past the first projection).
    """
    from ..sources.readers import spread

    ensure_utc(spark)
    docs = spread(load_table(spark, sf_dir, "documents"))
    scored = docs.select(
        "doc_id",
        "lang",
        F.md5(normalize_text("text")).alias("content_hash"),
        F.size(
            F.filter(F.split(normalize_text("text"), " "), lambda x: x != "")
        ).alias("n_words"),
    )
    quality = scored.filter(F.col("n_words") >= 20)
    deduped = quality.groupBy("content_hash").agg(
        F.min("doc_id").alias("doc_id"),
        F.min("lang").alias("lang"),
        F.min("n_words").alias("n_words"),
    )
    return deduped.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_words").cast("long").alias("total_words"),
        F.round(F.avg("n_words"), 4).alias("avg_words"),
    )


@register(
    "agg_percentiles",
    oracle="""
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.5), 4) AS median_price,
       round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
       round(quantile_cont(l_quantity, 0.25), 4) AS q1_qty
FROM lineitem GROUP BY l_returnflag
""",
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (ordered-set aggregate).

    F.percentile is the exact (sort-based) form matching SQL
    quantile_cont/percentile_cont semantics; percentile_approx is the
    sketch-based scale path but its error bound makes it
    hash-uncheckable against another engine.
    """
    ensure_utc(spark)
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", F.lit(0.5)), 4).alias("median_price"),
        F.round(F.percentile("l_extendedprice", F.lit(0.9)), 4).alias("p90_price"),
        F.round(F.percentile("l_quantity", F.lit(0.25)), 4).alias("q1_qty"),
    )


@register(
    "agg_cube",
    oracle="""
SELECT l_returnflag, l_linestatus,
       round(sum(l_extendedprice), 2) AS sum_price, count(*) AS n
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_utc(spark)
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.count("*").alias("n"),
    )
