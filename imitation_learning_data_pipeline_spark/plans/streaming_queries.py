"""Driver-contract entries for the Structured Streaming operators.

Each runs the streaming plan to completion with Trigger.availableNow and
returns the final table (streaming/incremental.py), so the driver can
collect it like any batch result. The windowed aggregation is fully
oracle-checkable: with all data available and nothing late, event-time
windows equal batch hour-truncation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..session import ensure_utc
from ..streaming import (
    streaming_dedup_events,
    streaming_dedup_exact,
    streaming_event_counts,
    streaming_windowed_counts,
)
from .dedup import _CORPUS_SQL, _NORM_SQL
from .registry import register


@register(
    "streaming_dedup_exact",
    oracle=f"""
WITH corpus AS ({_CORPUS_SQL}),
hashed AS (SELECT doc_id, md5({_NORM_SQL}) AS content_hash FROM corpus)
SELECT content_hash, count(*) AS n_copies, min(doc_id) AS canonical_doc
FROM hashed GROUP BY content_hash HAVING count(*) > 1
""",
)
def q_streaming_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup as a stateful streaming aggregate — batch-oracle
    checked against the identical dedup_exact SQL."""
    ensure_utc(spark)
    return streaming_dedup_exact(spark, sf_dir)


@register(
    "streaming_dedup_events",
    oracle="""
SELECT DISTINCT event_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
       user_id, event_type
FROM events
""",
)
def q_streaming_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-bounded streaming dedup over a doubled event stream —
    library query (CONTRACT_EXCLUDE), hash-checked by the --all gate."""
    ensure_utc(spark)
    return streaming_dedup_events(spark, sf_dir)


@register(
    "streaming_event_counts",
    oracle="""
SELECT user_id, event_type, count(*) AS n, round(sum(value), 2) AS total_value
FROM events GROUP BY user_id, event_type
""",
)
def q_streaming_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_utc(spark)
    return streaming_event_counts(spark, sf_dir)


@register(
    "streaming_windowed_counts",
    oracle="""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, count(*) AS n
FROM events GROUP BY 1, 2
""",
)
def q_streaming_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_utc(spark)
    return streaming_windowed_counts(spark, sf_dir)


@register(
    "streaming_session_window",
    oracle="""
WITH lagged AS (
  SELECT user_id, ts, value, event_id,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
), flagged AS (
  SELECT user_id, ts, value, event_id,
         CASE WHEN prev_ts IS NULL
                OR epoch(ts) - epoch(prev_ts) >= 1800 THEN 1 ELSE 0 END AS new_s
  FROM lagged
), sessioned AS (
  SELECT user_id, ts, value,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_id
  FROM flagged
)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       count(*) AS n_events,
       round(sum(value), 2) AS session_value
FROM sessioned GROUP BY user_id, session_id
""",
)
def q_streaming_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful session windows (30-min gap) via the built-in
    F.session_window streaming aggregation — the engine merges/extends
    session state across micro-batches; with availableNow the result
    equals the batch gap-based sessionization the oracle computes."""
    from pyspark.sql import functions as F

    from ..streaming.incremental import _events_stream, run_stream_to_batch

    ensure_utc(spark)
    stream = _events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), F.col("user_id"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .select(
            "user_id",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            "n_events",
            "session_value",
        )
    )
    return run_stream_to_batch(agg, spark)
