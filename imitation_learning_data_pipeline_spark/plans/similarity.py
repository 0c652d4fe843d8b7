"""Similarity search over the embeddings table (BASELINE.json extension).

Three tiers:
- ann_bruteforce_topk — exact cosine top-k, the correctness baseline.
- ann_lsh_buckets    — random-hyperplane LSH bucketing, the scale path:
  at 100 TB the corpus is partitioned by bucket and a query only scans
  its own bucket.
- ann_lsh_topk       — top-k *within* the query's bucket (bucketed search
  end-to-end), demonstrating the restricted-candidate-set plan shape.

Hyperplane coefficients are derived from md5 in plain Python at
plan-build time (hashlib.md5 == every engine's md5), embedded as literals
on both sides — no RNG, fully oracle-checkable.

The dense linear algebra (corpus × query-matrix, corpus × plane-matrix)
runs as an Arrow-batched pandas UDF doing ONE numpy matmul per batch —
this is the documented "UDFs are the slow path, except vectorized batch
math" case: the same product as `aggregate(zip_with(...))` built-ins ran
~30× slower because array higher-order functions are CodegenFallback and
evaluate lambdas per element interpreted. The broadcast side (8 queries /
8 planes) is a closure constant; only vec_id + score rows leave the UDF.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import quantize
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
_PLANES_MAT = np.array(PLANES, dtype=np.float64)  # (8, 64)


def _bucket_udf():
    """pandas UDF: embedding → 8-bit hyperplane-sign bucket string."""
    planes_t = _PLANES_MAT.T  # (64, 8)

    @F.pandas_udf("string")
    def bucket(v: pd.Series) -> pd.Series:
        mat = np.stack(v.to_numpy()).astype(np.float64)  # (B, 64)
        bits = (mat @ planes_t) >= 0  # (B, 8)
        return pd.Series(
            ["".join("1" if b else "0" for b in row) for row in bits]
        )

    return bucket


def _probe_buckets_udf():
    """pandas UDF: embedding → array of probe buckets — the home 8-bit
    hyperplane bucket plus one bucket per SET bit with that bit flipped
    down ('1'→'0').

    Down-flips-only makes multi-probe pair discovery exactly-once with
    no dedup shuffle: a Hamming-1 pair (buckets X, Y differing at bit i)
    meets in exactly one block — whichever of X/Y has the 1 at bit i
    sends its vector down into the other's HOME, so one side of the
    meeting is always at home. No pair can meet twice: distinct
    down-flips of one bucket are distinct, and two buckets' down-flip
    sets intersect in at most one bucket. A Hamming-2 pair split
    one-bit-per-side does reach a shared AND-bucket, but BOTH sides are
    visitors there and the consumer's home-side mask (home_a | home_b)
    drops visitor-visitor meetings — so recall is exactly Hamming ≤ 1,
    as embedding_cosine_lsh_pairs documents. Relaxing the mask to chase
    Hamming-2 would break the exactly-once property (visitor-visitor
    pairs can meet in several shared buckets).
    """
    planes_t = _PLANES_MAT.T  # (64, 8)

    @F.pandas_udf("array<string>")
    def probes(v: pd.Series) -> pd.Series:
        mat = np.stack(v.to_numpy()).astype(np.float64)  # (B, 64)
        bits = (mat @ planes_t) >= 0  # (B, 8)
        out = []
        for row in bits:
            home = "".join("1" if b else "0" for b in row)
            bs = [home]
            for i, b in enumerate(row):
                if b:
                    bs.append(home[:i] + "0" + home[i + 1 :])
            out.append(bs)
        return pd.Series(out)

    return probes


def _cos_matrix_udf(qmat: np.ndarray):
    """pandas UDF: embedding → array of cosines against the query matrix."""
    qn = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)  # (Q, 64)

    @F.pandas_udf("array<double>")
    def cos_all(v: pd.Series) -> pd.Series:
        mat = np.stack(v.to_numpy()).astype(np.float64)  # (B, 64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        sims = (mat / norms) @ qn.T  # (B, Q)
        return pd.Series(list(sims))

    return cos_all


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.readers import spread

    ensure_utc(spark)
    return spread(load_table(spark, sf_dir, "embeddings"))


def _emb_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_utc(spark)
    return load_table(spark, sf_dir, "embeddings")


def _query_matrix(emb: DataFrame) -> tuple[list[int], np.ndarray]:
    """Collect the (tiny) query batch driver-side — the standard ANN
    shape: queries are broadcast constants, the corpus streams.

    Collects from the RAW table (callers pass the un-spread frame): the
    vec_id predicate pushes down to the parquet scan, so this job reads
    a few row groups and shuffles nothing."""
    rows = (
        emb.filter(F.col("vec_id") < 8)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    qids = [r.vec_id for r in rows]
    qmat = np.array([list(r.embedding) for r in rows], dtype=np.float64)
    return qids, qmat


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


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    # portable ranking: the sort key is an INTEGER micro-cosine and the
    # output a quantized double — fractional round() of a double is not
    # bit-portable across engines (functions/rounding.py), and a flipped
    # 6th decimal in the sort key would reorder rank ties
    micro = F.round(F.col("cos") * 1000000).cast("long")
    w = Window.partitionBy("qid").orderBy(F.col("micro").desc(), "vec_id")
    return (
        scored.withColumn("micro", micro)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("qid", "rnk", "vec_id", quantize(F.col("cos"), 4).alias("cos_sim"))
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
                            ORDER BY CAST(round(cos * 1000000) AS BIGINT)
                                     DESC, vec_id) AS rnk
  FROM scored
)
SELECT qid, rnk, vec_id, CAST(round(cos * 10000) AS BIGINT) / 10000.0 AS cos_sim
FROM ranked WHERE rnk <= 10
""",
)
def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 per query: one Arrow-batched matmul pass over
    the corpus, per-query ranking via window."""
    emb = _emb(spark, sf_dir)
    qids, qmat = _query_matrix(_emb_raw(spark, sf_dir))
    cos_all = _cos_matrix_udf(qmat)
    qid_arr = F.array(*[F.lit(q) for q in qids])
    scored = (
        emb.select("vec_id", cos_all(F.col("embedding")).alias("cs"))
        .select("vec_id", F.posexplode("cs").alias("qi", "cos"))
        .select(
            F.element_at(qid_arr, F.col("qi") + 1).alias("qid"), "vec_id", "cos"
        )
        .filter(F.col("vec_id") != F.col("qid"))
    )
    return _rank_topk(scored, 10)


def _quantize_i8(mat: np.ndarray) -> np.ndarray:
    """Per-vector symmetric int8 quantization, half-away-from-zero.

    q_i = round(x_i / scale), scale = max|x| / 127 — the storage format
    that cuts ANN memory/bandwidth 4× vs float32. Rounding is
    sign·floor(|x|/scale + 0.5) — half away from zero, matching both
    Spark's HALF_UP round() and DuckDB's round(), NOT numpy's
    half-to-even — so the quantized grid is engine-portable.
    """
    scale = np.maximum(np.abs(mat).max(axis=1, keepdims=True), 1e-12) / 127.0
    r = mat / scale
    return (np.sign(r) * np.floor(np.abs(r) + 0.5)).astype(np.int64)


def _int8_dot_udf(qmat: np.ndarray):
    """pandas UDF: embedding → int64 dot products of the int8-quantized
    vector against the int8-quantized query matrix, plus the vector's
    quantized squared norm. Integer arithmetic end-to-end
    (|dot| ≤ 127·127·64 ≪ 2⁵³): bit-exact on every engine."""
    qq_t = _quantize_i8(qmat).T  # (64, Q) int64

    @F.pandas_udf("struct<ds:array<long>, n2:long>")
    def dots(v: pd.Series) -> pd.DataFrame:
        mat = np.stack(v.to_numpy()).astype(np.float64)  # (B, 64)
        q = _quantize_i8(mat)
        out = q @ qq_t  # (B, Q) int64 exact
        n2 = (q * q).sum(axis=1)  # (B,) int64 exact
        return pd.DataFrame({"ds": list(out), "n2": n2})

    return dots


_Q8_SQL = (
    "list_transform(CAST({col} AS DOUBLE[]), x -> CAST(round(x / "
    "(greatest(list_max(list_transform(CAST({col} AS DOUBLE[]), "
    "y -> abs(y))), 1e-12) / 127.0)) AS BIGINT))"
)


@register(
    "ann_int8_topk",
    oracle=f"""
WITH q AS (
  SELECT vec_id AS qid, {_Q8_SQL.format(col="embedding")} AS qv
  FROM embeddings WHERE vec_id < 8
), c AS (
  SELECT vec_id, {_Q8_SQL.format(col="embedding")} AS v FROM embeddings
), scored AS (
  SELECT q.qid, c.vec_id,
         CAST(list_dot_product(q.qv, c.v) AS BIGINT) AS dot_q,
         CAST(list_dot_product(c.v, c.v) AS BIGINT) AS n2
  FROM q CROSS JOIN c
  WHERE c.vec_id <> q.qid
), ranked AS (
  SELECT qid, vec_id, dot_q, n2,
         row_number() OVER (
           PARTITION BY qid
           ORDER BY CAST(dot_q AS DOUBLE)
                    / sqrt(CAST(greatest(n2, 1) AS DOUBLE)) DESC,
                    vec_id) AS rnk
  FROM scored
)
SELECT qid, CAST(rnk AS BIGINT) AS rnk, vec_id, dot_q, n2
FROM ranked WHERE rnk <= 10
""",
)
def ann_int8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantized similarity search: int8 per-vector symmetric
    quantization, exact int64 dot products, top-10 per query ranked by
    the normalized score dot/√‖v‖² (cosine up to a per-query constant).

    The 100 TB rationale: int8 storage is 4× denser than float32 and the
    integer GEMM is SIMD-friendly. Every emitted column is an exact
    integer; the ranking key is ONE float division of two exact integers
    (sqrt and divide are correctly-rounded IEEE ops on bit-identical
    inputs → bit-identical on every engine — by construction, not by
    luck; contrast the decimal-round pitfalls in plans/numeric.py).
    Recall vs float cosine is regression-tested (test_round3_ops).
    """
    emb = _emb(spark, sf_dir)
    qids, qmat = _query_matrix(_emb_raw(spark, sf_dir))
    dots = _int8_dot_udf(qmat)
    qid_arr = F.array(*[F.lit(q) for q in qids])
    scored = (
        emb.select("vec_id", dots(F.col("embedding")).alias("r"))
        .select("vec_id", F.col("r.n2").alias("n2"), F.posexplode("r.ds").alias("qi", "dot_q"))
        .select(
            F.element_at(qid_arr, F.col("qi") + 1).alias("qid"),
            "vec_id",
            "dot_q",
            "n2",
        )
        .filter(F.col("vec_id") != F.col("qid"))
    )
    score = F.col("dot_q").cast("double") / F.sqrt(
        F.greatest(F.col("n2"), F.lit(1)).cast("double")
    )
    w = Window.partitionBy("qid").orderBy(score.desc(), "vec_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 10)
        .select(
            "qid", F.col("rnk").cast("long").alias("rnk"), "vec_id", "dot_q", "n2"
        )
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
    bucket = _bucket_udf()
    return (
        emb.select("vec_id", bucket(F.col("embedding")).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_vecs"), F.min("vec_id").alias("min_vec"))
    )


def write_lsh_index(emb: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Materialize the ANN scale path: the corpus written as parquet
    PARTITIONED BY LSH bucket.

    This is the layout the ann_lsh_* docstrings promise: once bucket is
    a partition column, a query's candidate restriction is DIRECTORY
    PRUNING — the scan never opens files outside the query's bucket, so
    search cost is O(bucket), not O(corpus), before any execution begins.
    One shuffle by bucket keeps one file per bucket per write.

    The on-disk partition value is ``b`` + the 8 sign bits ("b01010110"):
    the letter prefix keeps Spark's partition-column type inference from
    coercing all-digit values to integers (dropping leading zeros), so
    bucket stays a STRING on read and every comparison in
    :func:`search_lsh_index` is string = string with no implicit casts
    (ADVICE r5).

    ``mode="append"`` is the INCREMENTAL index maintenance path: a new
    embedding batch lands as one extra file per touched bucket (bucket
    assignment is a pure function of the vector, so old files never
    need rewriting), and search correctness is unaffected — the
    partition filter prunes directories, not files. Many small batches
    sprawl files per bucket; ``pipeline.compact.compact_sprawling(path,
    partition_col="bucket")`` is the matching maintenance loop.
    """
    bucket = _bucket_udf()
    (
        emb.select(
            "vec_id",
            "embedding",
            F.concat(F.lit("b"), bucket(F.col("embedding"))).alias("bucket"),
        )
        .repartition("bucket")
        .write.mode(mode)
        .partitionBy("bucket")
        .parquet(path)
    )


def search_lsh_index(
    spark: SparkSession, path: str, qids: list[int], qmat: np.ndarray, k: int = 5
) -> DataFrame:
    """Top-k per query over a :func:`write_lsh_index` layout.

    Query buckets are computed driver-side (8 sign bits of an 8×64
    matmul — microseconds), then pushed as a partition filter: the scan
    reads ONLY the matching bucket directories (PartitionFilters in the
    plan; asserted by pytest). Scoring reuses the Arrow matmul UDF on
    the pruned candidates and the same deterministic ranking as
    ann_lsh_topk — given identical inputs the results are identical,
    the plan just prunes at the source instead of joining.
    """
    qbits = (qmat @ _PLANES_MAT.T) >= 0  # (Q, 8)
    raw = spark.read.parquet(path)
    # back-compat: indexes written before the 'b' prefix carry all-digit
    # partition values that type inference coerced to INT (leading zeros
    # gone); probing those with 'b...' strings would match nothing and
    # silently return an empty top-k. Detect the layout from the read
    # schema and key accordingly.
    prefixed = dict(raw.dtypes).get("bucket") == "string"
    # (unprefixed path: '01010110' was inferred as DECIMAL int 1010110 —
    # int(bits) reproduces exactly that value)
    qbucket = {
        int(q): ("b" + "".join("1" if b else "0" for b in row))
        if prefixed
        else int("".join("1" if b else "0" for b in row))
        for q, row in zip(qids, qbits)
    }
    cos_all = _cos_matrix_udf(qmat)
    qid_arr = F.array(*[F.lit(q) for q in qids])
    bucket_arr = F.array(*[F.lit(qbucket[q]) for q in qids])
    emb = raw.filter(F.col("bucket").isin(list(set(qbucket.values()))))
    scored = (
        emb.select("vec_id", "bucket", cos_all(F.col("embedding")).alias("cs"))
        .select("vec_id", "bucket", F.posexplode("cs").alias("qi", "cos"))
        .filter(
            (F.col("bucket") == F.element_at(bucket_arr, F.col("qi") + 1))
            & (F.col("vec_id") != F.element_at(qid_arr, F.col("qi") + 1))
        )
        .select(
            F.element_at(qid_arr, F.col("qi") + 1).alias("qid"), "vec_id", "cos"
        )
    )
    return _rank_topk(scored, k)


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
                            ORDER BY CAST(round(cos * 1000000) AS BIGINT)
                                     DESC, vec_id) AS rnk
  FROM scored
)
SELECT qid, rnk, vec_id, CAST(round(cos * 10000) AS BIGINT) / 10000.0 AS cos_sim
FROM ranked WHERE rnk <= 5
""",
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5: search only the query's own LSH bucket,
    restrict-then-score (the ivf_topk probe-join shape).

    Stage order is the 100 TB plan: (1) bucket every corpus vector —
    one cheap sign-of-projection pass; (2) broadcast-join the 8 query
    buckets, keeping only same-bucket candidates (~N/2^planes rows);
    (3) compute cosines for the SURVIVORS ONLY via the Arrow matmul
    UDF. No cosine is ever computed for a vector outside the query's
    bucket — at scale, a bucket-partitioned corpus layout turns stage 2
    into partition pruning and stages 1-2 vanish from the read path.
    The broadcast join is map-side (corpus never shuffles; embeddings
    ride the scan into the post-join projection).
    """
    emb = _emb(spark, sf_dir)
    qids, qmat = _query_matrix(_emb_raw(spark, sf_dir))
    bucket = _bucket_udf()
    cos_all = _cos_matrix_udf(qmat)
    qid_arr = F.array(*[F.lit(q) for q in qids])

    b = emb.select("vec_id", "embedding", bucket(F.col("embedding")).alias("bucket"))
    qbuckets = b.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"), F.col("bucket").alias("qbucket")
    )
    cand = b.join(
        F.broadcast(qbuckets),
        (F.col("bucket") == F.col("qbucket")) & (F.col("vec_id") != F.col("qid")),
    )
    # Score survivors only: the matmul UDF still produces all 8 cosines
    # per row (one fused gemm — cheaper than 8 narrow UDFs), and the
    # candidate's own query's entry is selected by position.
    scored = cand.select(
        "qid",
        "vec_id",
        F.element_at(
            cos_all(F.col("embedding")),
            F.array_position(qid_arr, F.col("qid")).cast("int"),
        ).alias("cos"),
    )
    return _rank_topk(scored, 5)
