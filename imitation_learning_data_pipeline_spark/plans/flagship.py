"""Flagship plan: per-user validation summary over the events stream.

Mirrors the reference's one-pass per-episode validation aggregate
(validate_one.py:89-100: count, min/max, lag-based monotonicity flags)
fused with the meta lookup join (validate_one.py:48-50 — a per-key filter
loop there, ONE broadcast join here). Scan → window → group-agg → join in
a single Catalyst plan.

Scale notes: the lag window and the groupBy share the same partitioning
key (user_id), so Catalyst reuses one hash-partition exchange for both;
the dimension side is explicitly broadcast — zero shuffle for the join at
any fact-table scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..session import ensure_utc
from ..sources import load_table
from .registry import register

_ORACLE = """
WITH lagged AS (
  SELECT user_id, ts, event_type, value,
         lag(ts) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_ts
  FROM events
), agg AS (
  SELECT user_id,
         count(*) AS n_events,
         count(DISTINCT event_type) AS n_types,
         strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS first_ts,
         strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_ts,
         round(sum(value), 2) AS total_value,
         (min(CASE WHEN prev_ts IS NULL OR ts >= prev_ts THEN 1 ELSE 0 END) = 1)
           AS ts_monotonic
  FROM lagged
  GROUP BY user_id
)
SELECT a.user_id, a.n_events, a.n_types, a.first_ts, a.last_ts,
       a.total_value, a.ts_monotonic, c.c_name, c.c_mktsegment
FROM agg a
LEFT JOIN customer c ON a.user_id = c.c_custkey
"""


@register("flagship_user_activity", oracle=_ORACLE)
def flagship_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_utc(spark)
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")

    # Monotonicity is checked against the *storage* order (event_id), like
    # the reference checks timestamp order against frame order
    # (validate_one.py:94: timestamp.diff() >= 0, first row null-tolerant).
    w = Window.partitionBy("user_id").orderBy("event_id")
    agg = (
        ev.withColumn("prev_ts", F.lag("ts").over(w))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("event_type").alias("n_types"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("first_ts"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
            F.round(F.sum("value"), 2).alias("total_value"),
            (
                F.min(
                    F.when(
                        F.col("prev_ts").isNull() | (F.col("ts") >= F.col("prev_ts")), 1
                    ).otherwise(0)
                )
                == 1
            ).alias("ts_monotonic"),
        )
    )
    dim = cust.select(
        F.col("c_custkey").alias("user_id"), "c_name", "c_mktsegment"
    )
    return agg.join(F.broadcast(dim), "user_id", "left")
