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
from ..streaming import streaming_event_counts, streaming_windowed_counts
from .registry import register


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
