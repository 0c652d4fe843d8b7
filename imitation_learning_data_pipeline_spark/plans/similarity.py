"""Similarity search over the embeddings table (BASELINE.json extension).

Three tiers:
- ann_bruteforce_topk — exact cosine top-k, the correctness baseline.
- ann_lsh_buckets    — random-hyperplane LSH bucketing, the scale path:
  at 100 TB the corpus is partitioned by bucket and a query only scans
  its own bucket.
- ann_lsh_topk       — top-k *within* the query's bucket (bucketed search
  end-to-end), demonstrating the restricted-candidate-set plan shape.

Hyperplane coefficients are derived from md5 in plain Python at
plan-build time (hashlib.md5 == every engine's md5), embedded as literal
arrays on both sides — no UDFs, no RNG, fully oracle-checkable. The
per-row work is `zip_with`/`aggregate` over the vector — JVM codegen,
no Python in the hot path.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.vector import as_double, cosine
from ..session import ensure_utc
from ..sources import load_table
from .registry import register

_DIM = 64
_N_PLANES = 8


def _coef(plane: int, dim: int) -> int:
    h = hashlib.md5(f"{plane}|{dim}".encode()).hexdigest()[:8]
    return int(h, 16) % 2001 - 1000


# plane → 64 integer coefficients in [−1000, 1000]
PLANES: list[list[int]] = [
    [_coef(p, d) for d in range(_DIM)] for p in range(_N_PLANES)
]


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.readers import spread

    ensure_utc(spark)
    # Few-MB parquet → 1-3 input splits, but every row runs 64-dim
    # zip_with/aggregate arithmetic: repartition to all cores first.
    return spread(load_table(spark, sf_dir, "embeddings"))


def _bucket_expr(v) -> F.Column:
    """8-bit LSH bucket string: sign bit of v·plane per hyperplane."""
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    v,
                    F.array(*[F.lit(float(c)) for c in PLANES[p]]),
                    lambda x, c: x * c,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            >= 0,
            "1",
        ).otherwise("0")
        for p in range(_N_PLANES)
    ]
    return F.concat(*bits)


def _bucket_sql(col: str = "v") -> str:
    bits = []
    for p in range(_N_PLANES):
        arr = "[" + ", ".join(f"{c}.0" for c in PLANES[p]) + "]"
        bits.append(
            f"(CASE WHEN list_dot_product({col}, {arr}) >= 0 THEN '1' ELSE '0' END)"
        )
    return " || ".join(bits)


_COS_SQL = (
    "list_dot_product(q.qv, c.v) "
    "/ (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(c.v, c.v)))"
)


@register(
    "ann_bruteforce_topk",
    oracle=f"""
WITH q AS (
  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < 8
), c AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), scored AS (
  SELECT q.qid, c.vec_id, {_COS_SQL} AS cos
  FROM q CROSS JOIN c
  WHERE c.vec_id <> q.qid
), ranked AS (
  SELECT qid, vec_id, cos,
         row_number() OVER (PARTITION BY qid
                            ORDER BY round(cos, 6) DESC, vec_id) AS rnk
  FROM scored
)
SELECT qid, rnk, vec_id, round(cos, 4) AS cos_sim
FROM ranked WHERE rnk <= 10
""",
)
def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 for each query vector (broadcast the queries,
    stream the corpus — one pass, per-partition top-k via window)."""
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"), as_double("embedding").alias("qv")
    )
    c = emb.select("vec_id", as_double("embedding").alias("v"))
    cos = cosine(F.col("qv"), F.col("v"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", cos.alias("cos"))
    )
    w = Window.partitionBy("qid").orderBy(F.round("cos", 6).desc(), "vec_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 10)
        .select("qid", "rnk", "vec_id", F.round("cos", 4).alias("cos_sim"))
    )


@register(
    "ann_lsh_buckets",
    oracle=f"""
WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
b AS (SELECT vec_id, {_bucket_sql("v")} AS bucket FROM c)
SELECT bucket, count(*) AS n_vecs, min(vec_id) AS min_vec
FROM b GROUP BY bucket
""",
)
def ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane bucket assignment + occupancy histogram.

    The bucket id is the partitioning key of the scale path: writing the
    corpus partitioned by bucket turns ANN into a partition-pruned scan.
    """
    emb = _emb(spark, sf_dir)
    c = emb.select("vec_id", as_double("embedding").alias("v"))
    return (
        c.select("vec_id", _bucket_expr(F.col("v")).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_vecs"), F.min("vec_id").alias("min_vec"))
    )


@register(
    "ann_lsh_topk",
    oracle=f"""
WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
b AS (SELECT vec_id, v, {_bucket_sql("v")} AS bucket FROM c),
q AS (SELECT vec_id AS qid, v AS qv, bucket FROM b WHERE vec_id < 8),
scored AS (
  SELECT q.qid, c.vec_id, {_COS_SQL} AS cos
  FROM q JOIN b c ON q.bucket = c.bucket AND c.vec_id <> q.qid
), ranked AS (
  SELECT qid, vec_id, cos,
         row_number() OVER (PARTITION BY qid
                            ORDER BY round(cos, 6) DESC, vec_id) AS rnk
  FROM scored
)
SELECT qid, rnk, vec_id, round(cos, 4) AS cos_sim
FROM ranked WHERE rnk <= 5
""",
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5: search only the query's own LSH bucket.

    The join key is the bucket — candidates shrink by ~2^planes. This is
    the 100 TB plan: bucket-partitioned corpus, queries shuffled to their
    bucket, per-bucket top-k, no global pass.
    """
    emb = _emb(spark, sf_dir)
    b = emb.select(
        "vec_id",
        as_double("embedding").alias("v"),
        _bucket_expr(as_double("embedding")).alias("bucket"),
    )
    q = b.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv"), "bucket"
    )
    cos = cosine(F.col("qv"), F.col("v"))
    scored = (
        b.join(F.broadcast(q), "bucket")
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", cos.alias("cos"))
    )
    w = Window.partitionBy("qid").orderBy(F.round("cos", 6).desc(), "vec_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("qid", "rnk", "vec_id", F.round("cos", 4).alias("cos_sim"))
    )
