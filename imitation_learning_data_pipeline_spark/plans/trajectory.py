"""Trajectory windowing: episode event streams → fixed-length training windows.

The reference pipeline's whole purpose is turning recorded robot episodes
into training samples (discover → validate → align → materialize,
chunked by episode — e.g. ``materialize_refactored.py``'s episode
chunking). The missing last step of that story is the sample-extraction
transform every imitation-learning trainer needs: slice each ordered
trajectory into fixed-length, fixed-stride overlapping windows
(length L, stride S), so one long episode yields many training
subsequences.

Spark-first shape:

- ONE shuffle, on the episode key (``user_id`` here — the ``events``
  table is the stand-in trajectory stream), for the per-episode
  ``row_number``/``count`` window.
- Window membership is then a map-side EXPLODE: step ``idx`` belongs to
  windows ``w ∈ [ceil((idx-L+1)/S), floor(idx/S)]`` — an L/S-row
  ``sequence()`` per step, not a self-join and not a per-window
  re-scan. Output is O(n · L/S) rows.
- No global sort anywhere: ordering is per-episode only, so the plan
  scales with the number of episodes, not corpus size, and a 1000×
  corpus is 1000× partitions of the same per-episode work.

Full windows only (``w*S + L <= n``): trainers want constant-shape
samples; ragged tails are the caller's opt-in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import ensure_utc
from ..sources import load_table
from .registry import register

_L = 8  # window length (steps per training sample)
_S = 4  # stride (new window every S steps → L/S× overlap)


@register(
    "trajectory_windows",
    oracle=f"""
WITH e AS (
  SELECT user_id, event_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS idx,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM events
),
w AS (
  SELECT user_id, event_id, event_type, idx, n,
         unnest(range(
           CAST(greatest(0, floor((idx - {_L} + {_S}) / {_S}.0)) AS BIGINT),
           CAST(floor(idx / {_S}.0) AS BIGINT) + 1)) AS window_id
  FROM e
)
SELECT user_id, CAST(window_id AS BIGINT) AS window_id,
       CAST(idx - window_id * {_S} AS BIGINT) AS pos,
       event_id, event_type
FROM w
WHERE window_id * {_S} + {_L} <= n
""",
)
def trajectory_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slice each user's time-ordered event trajectory into length-{L},
    stride-{S} overlapping windows; one row per (window, position).

    ``ceil((idx-L+1)/S)`` is computed as ``floor((idx-L+S)/S)`` (the
    positive-divisor identity) so both engines evaluate the same
    double-precision floor; the ``greatest(0, ·)`` clamp makes the
    negative-numerator edge (idx < L-1) irrelevant to parity.
    """
    ensure_utc(spark)
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    per_ep = Window.partitionBy("user_id").orderBy("ts", "event_id")
    whole_ep = Window.partitionBy("user_id")
    base = events.select(
        "user_id",
        "event_id",
        "event_type",
        (F.row_number().over(per_ep) - 1).alias("idx"),
        F.count("*").over(whole_ep).alias("n"),
    )
    lo = F.greatest(
        F.lit(0).cast("long"),
        F.floor((F.col("idx") - _L + _S) / F.lit(float(_S))).cast("long"),
    )
    hi = F.floor(F.col("idx") / F.lit(float(_S))).cast("long")
    return (
        base.select(
            "user_id",
            "event_id",
            "event_type",
            "idx",
            "n",
            F.explode(F.sequence(lo, hi)).alias("window_id"),
        )
        .filter(F.col("window_id") * _S + _L <= F.col("n"))
        .select(
            "user_id",
            F.col("window_id").cast("long").alias("window_id"),
            (F.col("idx") - F.col("window_id") * _S).cast("long").alias("pos"),
            "event_id",
            "event_type",
        )
    )


@register(
    "trajectory_features",
    oracle=f"""
WITH e AS (
  SELECT user_id, event_id, event_type, value,
         epoch_ms(ts) AS ts_ms,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS idx,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM events
),
w AS (
  SELECT user_id, event_id, event_type, value, ts_ms, idx, n,
         unnest(range(
           CAST(greatest(0, floor((idx - {_L} + {_S}) / {_S}.0)) AS BIGINT),
           CAST(floor(idx / {_S}.0) AS BIGINT) + 1)) AS window_id
  FROM e
)
SELECT user_id, CAST(window_id AS BIGINT) AS window_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(round(CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS DOUBLE)
                  / count(*)) AS BIGINT) AS mean_value_e4,
       min(value) AS min_value,
       max(value) AS max_value,
       CAST(max(ts_ms) - min(ts_ms) AS BIGINT) AS span_ms,
       CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
FROM w
WHERE window_id * {_S} + {_L} <= n
GROUP BY user_id, window_id
""",
)
def trajectory_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-window feature vector over the trajectory slices: event
    count, mean/min/max of the action value, wall-clock span, and
    action-type diversity — the windowed summary a policy-training
    dataloader attaches to every sample.

    Same single-shuffle + map-side-explode derivation as
    :func:`trajectory_windows`; the feature aggregate re-groups on
    (user_id, window_id), whose first component is the existing
    partition key, so the second shuffle moves one row per window.
    Timestamps aggregate as epoch milliseconds, and the mean is the
    exact-integer recipe (per-row round(value*1e4) → exact long sum →
    one double division): a float SUM's addition order differs between
    engines, so "round the avg" is boundary-fragile — every aggregate
    here is arithmetic on exact integers instead.
    """
    ensure_utc(spark)
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    per_ep = Window.partitionBy("user_id").orderBy("ts", "event_id")
    whole_ep = Window.partitionBy("user_id")
    base = events.select(
        "user_id",
        "event_id",
        "event_type",
        "value",
        F.unix_millis("ts").alias("ts_ms"),
        (F.row_number().over(per_ep) - 1).alias("idx"),
        F.count("*").over(whole_ep).alias("n"),
    )
    lo = F.greatest(
        F.lit(0).cast("long"),
        F.floor((F.col("idx") - _L + _S) / F.lit(float(_S))).cast("long"),
    )
    hi = F.floor(F.col("idx") / F.lit(float(_S))).cast("long")
    return (
        base.select(
            "*", F.explode(F.sequence(lo, hi)).alias("window_id")
        )
        .filter(F.col("window_id") * _S + _L <= F.col("n"))
        .groupBy("user_id", F.col("window_id").cast("long").alias("window_id"))
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(
                F.sum(F.round(F.col("value") * 10000).cast("long")).cast("double")
                / F.count("*")
            )
            .cast("long")
            .alias("mean_value_e4"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            (F.max("ts_ms") - F.min("ts_ms")).cast("long").alias("span_ms"),
            F.count_distinct("event_type").cast("long").alias("n_types"),
        )
    )
