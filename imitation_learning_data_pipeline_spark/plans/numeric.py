"""Numeric layer: weighted parallel variance reduction (A3), elementwise
z-score normalization (F6), per-vector array statistics (F7).

A3 is the reference's numeric core (stats_refactored.py:9-44,161-201): a
driver-side Python loop there that combines per-episode (n, mean, std,
min, max) into global stats via S=Σn, mean=Σn·μ/S, var=Σn·(σ²+μ²)/S −
mean² (clamped ≥0). Here it is textbook partial+final aggregation: the
Spark plan computes *per-label partials first*, then combines them with
exactly that formula — the oracle computes global stats directly, so a
hash match proves the parallel-combine algebra, not just the arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vector import as_double, dot, zscore
from ..functions.rounding import quantize
from ..session import ensure_utc
from ..sources import load_table
from .registry import register


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.readers import spread

    ensure_utc(spark)
    return spread(load_table(spark, sf_dir, "embeddings"))


_EXPLODED = """
  SELECT vec_id, label,
         CAST(unnest(embedding) AS DOUBLE) AS x,
         CAST(unnest(range(len(embedding))) AS BIGINT) AS dim
  FROM embeddings
"""


@register(
    "agg_weighted_variance",
    oracle=f"""
WITH ex AS ({_EXPLODED})
SELECT dim, count(*) AS n,
       CAST(round(avg(x) * 10000) AS BIGINT) / 10000.0 AS mean_x,
       CAST(round(stddev_pop(x) * 10000) AS BIGINT) / 10000.0 AS std_x,
       CAST(round(min(x) * 10000) AS BIGINT) / 10000.0 AS min_x,
       CAST(round(max(x) * 10000) AS BIGINT) / 10000.0 AS max_x
FROM ex GROUP BY dim
""",
)
def agg_weighted_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    ex = emb.select(
        "label", F.posexplode(as_double("embedding")).alias("dim", "x")
    ).select(F.col("label"), F.col("dim").cast("long").alias("dim"), "x")

    # Stage 1 — per-label partials (the "per-episode stats" of the
    # reference). At scale each partial fits in a few KB regardless of row
    # count: the shuffle moves O(labels × dims) rows only.
    part = ex.groupBy("label", "dim").agg(
        F.count("*").alias("n"),
        F.avg("x").alias("mu"),
        F.stddev_pop("x").alias("sd"),
        F.min("x").alias("mn"),
        F.max("x").alias("mx"),
    )

    # Stage 2 — weighted combine (stats_refactored.py:29-44 formula).
    s = F.sum("n")
    mean = F.sum(F.col("n") * F.col("mu")) / s
    ex2 = F.sum(F.col("n") * (F.col("sd") * F.col("sd") + F.col("mu") * F.col("mu"))) / s
    var = F.greatest(ex2 - mean * mean, F.lit(0.0))  # clamp ≥0, :40
    return part.groupBy("dim").agg(
        s.cast("long").alias("n"),
        quantize(mean, 4).alias("mean_x"),
        quantize(F.sqrt(var), 4).alias("std_x"),
        quantize(F.min("mn"), 4).alias("min_x"),
        quantize(F.max("mx"), 4).alias("max_x"),
    )


@register(
    "vector_zscore",
    oracle=f"""
WITH ex AS ({_EXPLODED}),
st AS (
  SELECT dim,
         CAST(round(avg(x) * 1024) AS BIGINT) AS mu_i,
         CAST(round(stddev_pop(x) * 1024) AS BIGINT) AS sd_i
  FROM ex GROUP BY dim
)
SELECT e.vec_id, e.dim,
       CAST(round(((e.x - st.mu_i / 1024.0)
                   / (CASE WHEN st.sd_i = 0 THEN 1.0 ELSE st.sd_i / 1024.0 END))
                  * 1000) AS BIGINT) AS z_milli
FROM ex e JOIN st USING (dim)
""",
)
def vector_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6: elementwise z-score with σ==0 guard, vectors kept intact.

    The normalization itself is a higher-order `zip_with` over the whole
    array (align_transform_refactored.py:51-78 did this with a per-row
    Python lambda; here it's JVM codegen). Global per-dim stats are
    reduced to two literal-sized arrays and broadcast-joined onto every
    row — at 100 TB the stats side is still just one row.

    Cross-engine determinism (rounds 1-2 failed the driver hash on this
    query while passing locally): decimal ``round(x, k)`` of a float is
    NOT bit-portable — Spark rounds via BigDecimal shortest-decimal
    re-interpretation while DuckDB computes ``round(x*10^k)/10^k`` in
    floating point, so quotients near a 0.0005 boundary flip between
    engines. Robustness by construction instead:

    * stats are quantized to BINARY fractions — ``round(stat*1024)`` as a
      BIGINT divided by 1024.0 is exact in IEEE double on every engine, so
      both sides normalize with bit-identical mu/sd;
    * the output is an INTEGER, ``CAST(round(z*1000) AS BIGINT)`` — IEEE
      ops on bit-identical inputs are bit-identical, and round-to-integer
      agrees between Spark HALF_UP and DuckDB half-away-from-zero at
      every value including exact .5 (both round away from zero).
    """
    emb = _emb(spark, sf_dir)
    ex = emb.select(F.posexplode(as_double("embedding")).alias("dim", "x"))
    stats = (
        ex.groupBy("dim")
        .agg(
            (F.round(F.avg("x") * 1024).cast("long").cast("double") / 1024.0).alias("mu"),
            (F.round(F.stddev_pop("x") * 1024).cast("long").cast("double") / 1024.0).alias("sd"),
        )
        .groupBy()
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "mu"))), lambda s: s.mu
            ).alias("mean_arr"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "sd"))), lambda s: s.sd
            ).alias("std_arr"),
        )
    )
    normalized = emb.crossJoin(F.broadcast(stats)).select(
        "vec_id",
        zscore("embedding", F.col("mean_arr"), F.col("std_arr")).alias("zvec"),
    )
    return normalized.select(
        "vec_id",
        F.posexplode(
            F.transform("zvec", lambda z: F.round(z * 1000).cast("long"))
        ).alias("dim", "z_milli"),
    ).select("vec_id", F.col("dim").cast("long").alias("dim"), "z_milli")


@register(
    "vector_stats",
    oracle="""
SELECT vec_id,
       CAST(round(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                       CAST(embedding AS DOUBLE[]))) * 10000) AS BIGINT)
         / 10000.0 AS l2_norm,
       CAST(round(list_aggregate(CAST(embedding AS DOUBLE[]), 'avg') * 10000)
            AS BIGINT) / 10000.0 AS mean_v,
       CAST(round(list_aggregate(CAST(embedding AS DOUBLE[]), 'min') * 10000)
            AS BIGINT) / 10000.0 AS min_v,
       CAST(round(list_aggregate(CAST(embedding AS DOUBLE[]), 'max') * 10000)
            AS BIGINT) / 10000.0 AS max_v,
       len(embedding) AS width
FROM embeddings
""",
)
def vector_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 + vector-width probe (validate_one.py:52-61 → just F.size here)."""
    emb = _emb(spark, sf_dir)
    v = as_double("embedding")
    mean_v = F.aggregate(v, F.lit(0.0), lambda a, x: a + x) / F.size(v)
    return emb.select(
        "vec_id",
        quantize(F.sqrt(dot("embedding", "embedding")), 4).alias("l2_norm"),
        quantize(mean_v, 4).alias("mean_v"),
        quantize(F.array_min(v), 4).alias("min_v"),
        quantize(F.array_max(v), 4).alias("max_v"),
        F.size(v).cast("long").alias("width"),
    )
