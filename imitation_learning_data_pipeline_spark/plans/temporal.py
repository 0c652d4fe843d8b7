"""Temporal operators Spark has no single built-in for: as-of join and
gap-based sessionization — both expressed as compositions of window
functions (SURVEY custom-operator preference (a): built-in composition
before any UDF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..session import ensure_utc
from ..sources import load_table
from .registry import register


@register(
    "asof_join_last_click",
    oracle="""
SELECT p.event_id, p.user_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       strftime((SELECT max(c.ts) FROM events c
                 WHERE c.user_id = p.user_id
                   AND c.event_type = 'click'
                   AND c.ts < p.ts), '%Y-%m-%d %H:%M:%S') AS last_click_ts
FROM events p WHERE p.event_type = 'purchase'
""",
)
def asof_join_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: latest click strictly before each purchase, per user.

    Not a correlated per-row scan (the oracle's formulation) — the Spark
    plan merges both event streams once, sorted per user, and carries the
    running last-click timestamp with a window max. One exchange on
    user_id; linear, scales to any fact size.
    """
    ensure_utc(spark)
    ev = load_table(spark, sf_dir, "events")
    # Strict "<" semantics on timestamp ties: purchases sort BEFORE clicks
    # at the same ts, so the preceding-rows frame can never see a same-ts
    # click (the oracle's c.ts < p.ts). A when()-guard on the carried max
    # would be wrong here — it would null out the genuinely-earlier click
    # whenever a same-ts click wins the max.
    kind = F.when(F.col("event_type") == "purchase", 0).otherwise(1)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", kind, "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last_click = F.max(
        F.when(F.col("event_type") == "click", F.col("ts"))
    ).over(w)
    return (
        ev.withColumn("last_click", last_click)
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
            F.date_format("last_click", "yyyy-MM-dd HH:mm:ss").alias("last_click_ts"),
        )
    )


_RANGE_US = 600 * 1_000_000  # 10-minute lookback, in microseconds


@register(
    "range_join_prior_views",
    oracle=f"""
SELECT c.event_id,
       CAST(count(v.ts) AS BIGINT) AS n_prior_views
FROM events c
LEFT JOIN events v
  ON v.user_id = c.user_id
 AND v.event_type = 'view'
 AND epoch_us(v.ts) <= epoch_us(c.ts)
 AND epoch_us(v.ts) > epoch_us(c.ts) - {_RANGE_US}
WHERE c.event_type = 'click'
GROUP BY c.event_id
""",
)
def range_join_prior_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: for every click, count same-user views in
    the preceding 10 minutes — the classic feature-engineering interval
    join Spark has no native operator for.

    NOT the oracle's inequality join (which Catalyst can only execute as
    a per-user cross product — O(clicks×views) per user, a scale-killer
    for hot users): the window predicate is banded into an equi-join.
    Each view is exploded to its two candidate 10-minute buckets
    [b, b+1]; clicks join on (user_id, bucket) — any view inside a
    click's lookback window lands in one of those buckets — and the
    exact interval predicate filters the ≤2× candidate surplus. Work is
    O(matches), shuffles are hash-partitioned on (user_id, bucket), and
    a hot bucket is splittable by AQE. Counts are exact integers; the
    left join keeps zero-view clicks.
    """
    ensure_utc(spark)
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("cts"),
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.unix_micros("ts").alias("vts")
    )
    # A view at vts matches clicks with cts ∈ [vts, vts + RANGE), i.e.
    # click buckets floor(vts/R) or floor(vts/R)+1.
    b0 = F.floor(F.col("vts") / _RANGE_US)
    views_banded = views.select(
        "user_id", "vts", F.explode(F.array(b0, b0 + 1)).alias("bucket")
    )
    cand = clicks.withColumn(
        "bucket", F.floor(F.col("cts") / _RANGE_US)
    ).join(views_banded, ["user_id", "bucket"]).filter(
        (F.col("vts") <= F.col("cts")) & (F.col("vts") > F.col("cts") - _RANGE_US)
    )
    counts = cand.groupBy("event_id").agg(F.count("*").alias("n_prior_views"))
    return (
        clicks.select("event_id")
        .join(counts, "event_id", "left")
        .select(
            "event_id",
            F.coalesce(F.col("n_prior_views"), F.lit(0)).cast("long").alias(
                "n_prior_views"
            ),
        )
    )


@register(
    "window_sessionize",
    oracle="""
WITH lagged AS (
  SELECT event_id, user_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
), flagged AS (
  SELECT event_id, user_id, ts,
         CASE WHEN prev_ts IS NULL
                OR epoch(ts) - epoch(prev_ts) > 1800 THEN 1 ELSE 0 END AS new_session
  FROM lagged
)
SELECT event_id, user_id,
       CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS BIGINT) AS session_id
FROM flagged
""",
)
def window_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): lag → gap flag →
    running sum. The batch dual of Structured Streaming's session_window."""
    ensure_utc(spark)
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w)
    flagged = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 1800), 1).otherwise(0),
    )
    running = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return flagged.select(
        "event_id",
        "user_id",
        F.sum("new_session").over(running).cast("long").alias("session_id"),
    )
