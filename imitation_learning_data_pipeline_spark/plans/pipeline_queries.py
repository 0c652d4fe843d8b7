"""The five reference pipeline stages re-expressed as oracle-checkable
queries over the driver tables (discover / validate / align / materialize;
stats is numeric.agg_weighted_variance).

The real LeRobot-shaped stage implementations live in
``imitation_learning_data_pipeline_spark.pipeline`` and are covered by pytest
goldens; these queries prove the same *plan shapes* against the DuckDB
oracle on the driver's synthetic tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.hashing import cents, split_assign
from ..functions.rounding import quantize
from ..session import ensure_utc
from ..sources import load_table
from .registry import register


# --- discover: fingerprint diff + deletions in ONE plan ---------------------
# Reference: discover_refactored.py:79-170 (steps 5-7: left join diff, anti
# join deletions, relaxed union). Orders stand in for the episode manifest.

@register(
    "pipeline_discover_status",
    oracle="""
WITH cur AS (
  SELECT o_orderkey AS k,
         md5(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                  + CASE WHEN o_orderkey % 11 = 0 THEN 1 ELSE 0 END AS VARCHAR)) AS fp
  FROM orders WHERE o_orderkey % 5 <> 0
), prev AS (
  SELECT o_orderkey AS k,
         md5(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR)) AS fp
  FROM orders WHERE o_orderkey % 7 <> 0
), diffed AS (
  SELECT cur.k, cur.fp,
         CASE WHEN prev.k IS NULL THEN 'NEW'
              WHEN cur.fp = prev.fp THEN 'UNCHANGED'
              ELSE 'CHANGED' END AS status
  FROM cur LEFT JOIN prev ON cur.k = prev.k
), deleted AS (
  SELECT p.k, 'DELETED' AS status FROM prev p
  WHERE NOT EXISTS (SELECT 1 FROM cur c WHERE c.k = p.k)
)
SELECT k, fp, status FROM diffed
UNION ALL BY NAME
SELECT k, status FROM deleted
""",
)
def pipeline_discover_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-discover manifest merge: diff current scan against the
    previous manifest, classify NEW/UNCHANGED/CHANGED, append DELETED
    tombstones. One job: left join + anti join + unionByName — the Delta
    MERGE shape without requiring Delta."""
    ensure_utc(spark)
    orders = load_table(spark, sf_dir, "orders")
    fp_cur = F.md5(
        (
            cents("o_totalprice")
            + F.when(F.col("o_orderkey") % 11 == 0, 1).otherwise(0)
        ).cast("string")
    )
    cur = orders.filter(F.col("o_orderkey") % 5 != 0).select(
        F.col("o_orderkey").alias("k"), fp_cur.alias("fp")
    )
    prev = orders.filter(F.col("o_orderkey") % 7 != 0).select(
        F.col("o_orderkey").alias("k"),
        F.md5(cents("o_totalprice").cast("string")).alias("fp"),
    )
    diffed = (
        cur.join(prev.withColumnRenamed("fp", "prev_fp"), "k", "left")
        .select(
            "k",
            "fp",
            F.when(F.col("prev_fp").isNull(), "NEW")
            .when(F.col("fp") == F.col("prev_fp"), "UNCHANGED")
            .otherwise("CHANGED")
            .alias("status"),
        )
    )
    deleted = prev.join(cur.select("k"), "k", "left_anti").select(
        "k", F.lit("DELETED").alias("status")
    )
    return diffed.unionByName(deleted, allowMissingColumns=True)


# --- validate: grouped one-pass checks + broadcast meta join ----------------
# Reference: validate_one.py:63-147 run per-episode in a loop; here ALL
# groups in one grouped aggregate + one broadcast join (SURVEY §3.2).

@register(
    "pipeline_validate_orders",
    oracle="""
WITH per_line AS (
  SELECT l_orderkey,
         count(*) AS n_lines,
         min(l_linenumber) AS min_ln,
         max(l_linenumber) AS max_ln,
         CAST(count(DISTINCT l_linenumber) AS BIGINT) AS n_distinct_ln,
         max(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) = 1 AS any_null_qty
  FROM lineitem GROUP BY l_orderkey
)
SELECT o.o_orderkey AS okey,
       coalesce(p.n_lines, 0) AS n_lines,
       p.l_orderkey IS NOT NULL AS has_lines,
       coalesce(p.min_ln = 1 AND p.max_ln = p.n_lines
                AND p.n_distinct_ln = p.n_lines, FALSE) AS contiguous_lines,
       coalesce(NOT p.any_null_qty, FALSE) AS no_null_qty,
       coalesce(p.l_orderkey IS NOT NULL
                AND p.min_ln = 1 AND p.max_ln = p.n_lines
                AND p.n_distinct_ln = p.n_lines
                AND NOT p.any_null_qty, FALSE) AS ok
FROM orders o LEFT JOIN per_line p ON o.o_orderkey = p.l_orderkey
""",
)
def pipeline_validate_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_utc(spark)
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    per_line = li.groupBy("l_orderkey").agg(
        F.count("*").alias("n_lines"),
        F.min("l_linenumber").alias("min_ln"),
        F.max("l_linenumber").alias("max_ln"),
        F.countDistinct("l_linenumber").alias("n_distinct_ln"),
        (F.max(F.when(F.col("l_quantity").isNull(), 1).otherwise(0)) == 1).alias(
            "any_null_qty"
        ),
    )
    contiguous = (
        (F.col("min_ln") == 1)
        & (F.col("max_ln") == F.col("n_lines"))
        & (F.col("n_distinct_ln") == F.col("n_lines"))
    )
    j = orders.select("o_orderkey").join(
        per_line, orders.o_orderkey == per_line.l_orderkey, "left"
    )
    has = F.col("l_orderkey").isNotNull()
    return j.select(
        F.col("o_orderkey").alias("okey"),
        F.coalesce(F.col("n_lines"), F.lit(0)).alias("n_lines"),
        has.alias("has_lines"),
        F.coalesce(contiguous, F.lit(False)).alias("contiguous_lines"),
        F.coalesce(~F.col("any_null_qty"), F.lit(False)).alias("no_null_qty"),
        F.coalesce(
            has & contiguous & ~F.col("any_null_qty"), F.lit(False)
        ).alias("ok"),
    )


# --- align & transform: dedup keep-first → reindex → z-score ----------------
# Reference: align_transform_refactored.py:82-136 — the whole per-episode
# chain as ONE window+agg plan over all groups at once. Events stand in for
# frames (user_id ≙ episode, event_id ≙ frame_index, value ≙ state).

@register(
    "pipeline_align_events",
    oracle="""
WITH frames AS (
  SELECT user_id, event_id, ts, value, 0 AS src FROM events
  UNION ALL
  SELECT user_id, event_id, ts, value, 1 AS src FROM events WHERE event_id % 10 = 0
), deduped AS (
  SELECT * FROM (
    SELECT user_id, event_id, ts, value, src,
           row_number() OVER (PARTITION BY user_id, event_id ORDER BY src) AS rn
    FROM frames
  ) WHERE rn = 1
), stats AS (
  SELECT user_id, avg(value) AS mu, stddev_pop(value) AS sd
  FROM deduped GROUP BY user_id
)
SELECT d.user_id, d.event_id, d.src,
       row_number() OVER (PARTITION BY d.user_id ORDER BY d.ts, d.event_id) - 1
         AS new_index,
       CAST(round((d.value - s.mu) / (CASE WHEN s.sd = 0 THEN 1 ELSE s.sd END)
            * 10000) AS BIGINT) / 10000.0 AS z
FROM deduped d JOIN stats s ON d.user_id = s.user_id
""",
)
def pipeline_align_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clean/dedup/reindex/normalize in one plan.

    Keep-first dedup uses an explicit provenance tag (src) as the order
    key — "first occurrence" must be a deterministic property of the
    data, not of partition iteration order (SURVEY §7.5 item 1).
    All three window/agg stages share the user_id hash partitioning, so
    the plan needs only one exchange of the fact rows.
    """
    ensure_utc(spark)
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "value"
    )
    frames = ev.withColumn("src", F.lit(0)).unionByName(
        ev.filter(F.col("event_id") % 10 == 0).withColumn("src", F.lit(1))
    )
    # One explicit exchange serves the whole chain: hash-partitioning by
    # user_id alone satisfies the (user_id, event_id) clustering the
    # dedup window needs (subset rule), the reindex window, and the
    # stats aggregation — audited 5 exchanges → fewer with this pin.
    frames = frames.repartition("user_id")
    w_dedup = Window.partitionBy("user_id", "event_id").orderBy("src")
    deduped = (
        frames.withColumn("rn", F.row_number().over(w_dedup))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    stats = deduped.groupBy("user_id").agg(
        F.avg("value").alias("mu"), F.stddev_pop("value").alias("sd")
    )
    w_idx = Window.partitionBy("user_id").orderBy("ts", "event_id")
    z = (F.col("value") - F.col("mu")) / F.when(
        F.col("sd") == 0, 1.0
    ).otherwise(F.col("sd"))
    return (
        deduped.join(F.broadcast(stats), "user_id")
        .select(
            "user_id",
            "event_id",
            "src",
            (F.row_number().over(w_idx) - 1).alias("new_index"),
            quantize(z, 4).alias("z"),
        )
    )


# --- materialize: deterministic split + dataset index -----------------------
# Reference: materialize_refactored.py:57-154 (hash split F5, index agg;
# the partitionBy write itself is exercised in pipeline/ + pytest).

@register(
    "pipeline_materialize_index",
    oracle="""
WITH assigned AS (
  SELECT o_orderkey, o_orderstatus,
         CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
         CASE
           WHEN ('0x' || substr(md5('42' || '|' || CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
                / 4294967296.0 < 0.8 THEN 'train'
           WHEN ('0x' || substr(md5('42' || '|' || CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
                / 4294967296.0 < 0.9 THEN 'val'
           ELSE 'test' END AS split
  FROM orders
)
SELECT split, o_orderstatus AS status, count(*) AS n,
       CAST(sum(price_cents) AS BIGINT) AS total_cents
FROM assigned GROUP BY split, o_orderstatus
""",
)
def pipeline_materialize_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_utc(spark)
    orders = load_table(spark, sf_dir, "orders")
    assigned = orders.select(
        "o_orderstatus",
        cents("o_totalprice").alias("price_cents"),
        split_assign("o_orderkey", seed="42").alias("split"),
    )
    return assigned.groupBy(
        "split", F.col("o_orderstatus").alias("status")
    ).agg(
        F.count("*").alias("n"),
        F.sum("price_cents").alias("total_cents"),
    )
