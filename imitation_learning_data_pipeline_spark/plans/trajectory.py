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

``slice_windows`` / ``window_features`` are generic over caller frames
(any episode key / ordering / carried columns — the reusable-API
pattern from plans/dedup.py); the two registered contract queries bind
them to the driver's ``events`` table.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import ensure_utc
from ..sources import load_table
from .registry import register

_L = 8  # window length (steps per training sample)
_S = 4  # stride (new window every S steps → L/S× overlap)


def _exploded(
    events: DataFrame,
    episode_col: str,
    order_cols: Sequence[str],
    length: int,
    stride: int,
    carry_cols: Sequence[str],
) -> DataFrame:
    """Rows (episode, carry..., idx, n, window_id) for every FULL
    window containing each step — the shared derivation."""
    per_ep = Window.partitionBy(episode_col).orderBy(*order_cols)
    whole_ep = Window.partitionBy(episode_col)
    base = events.select(
        F.col(episode_col),
        *[F.col(c) for c in carry_cols],
        (F.row_number().over(per_ep) - 1).alias("idx"),
        F.count("*").over(whole_ep).alias("n"),
    )
    lo = F.greatest(
        F.lit(0).cast("long"),
        F.floor((F.col("idx") - length + stride) / F.lit(float(stride))).cast("long"),
    )
    hi = F.floor(F.col("idx") / F.lit(float(stride))).cast("long")
    # stride > length leaves gaps: a step with idx mod S >= L belongs to
    # NO window, i.e. lo > hi — and F.sequence(lo, hi) would generate a
    # DESCENDING sequence there, not an empty one. Guard with an empty
    # array so explode drops the row.
    wins = F.when(lo <= hi, F.sequence(lo, hi)).otherwise(
        F.array().cast("array<long>")
    )
    return base.select("*", F.explode(wins).alias("window_id")).filter(
        F.col("window_id") * stride + length <= F.col("n")
    )


def slice_windows(
    events: DataFrame,
    episode_col: str = "user_id",
    order_cols: Sequence[str] = ("ts", "event_id"),
    length: int = _L,
    stride: int = _S,
    carry_cols: Sequence[str] = ("event_id", "event_type"),
) -> DataFrame:
    """Generic trajectory slicer: one row per (episode, window,
    position) carrying ``carry_cols``. ``ceil((idx-L+1)/S)`` is
    computed as ``floor((idx-L+S)/S)`` (positive-divisor identity) so
    engines agree on the double floor; the ``greatest(0, ·)`` clamp
    covers the negative-numerator edge."""
    w = _exploded(events, episode_col, order_cols, length, stride, carry_cols)
    return w.select(
        episode_col,
        F.col("window_id").cast("long").alias("window_id"),
        (F.col("idx") - F.col("window_id") * stride).cast("long").alias("pos"),
        *carry_cols,
    )


def window_features(
    events: DataFrame,
    episode_col: str = "user_id",
    order_cols: Sequence[str] = ("ts", "event_id"),
    value_col: str = "value",
    ts_col: str = "ts",
    type_col: str = "event_type",
    length: int = _L,
    stride: int = _S,
) -> DataFrame:
    """Generic per-window feature aggregate: count, exact-integer mean
    (per-row round(value*1e4) → exact long sum → one division — a
    rounded float avg is boundary-fragile across engines), min/max,
    wall-clock span in epoch ms, and type diversity."""
    carried = events.select(
        "*", F.unix_millis(ts_col).alias("__ts_ms")
    )
    w = _exploded(
        carried, episode_col, order_cols, length, stride,
        [value_col, type_col, "__ts_ms"],
    )
    return w.groupBy(
        episode_col, F.col("window_id").cast("long").alias("window_id")
    ).agg(
        F.count("*").cast("long").alias("n_events"),
        F.round(
            F.sum(F.round(F.col(value_col) * 10000).cast("long")).cast("double")
            / F.count("*")
        )
        .cast("long")
        .alias("mean_value_e4"),
        F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"),
        (F.max("__ts_ms") - F.min("__ts_ms")).cast("long").alias("span_ms"),
        F.count_distinct(type_col).cast("long").alias("n_types"),
    )


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
    """Driver-table binding of :func:`slice_windows` (L=8, S=4)."""
    ensure_utc(spark)
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    return slice_windows(events)


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
    """Driver-table binding of :func:`window_features` — the windowed
    summary a policy-training dataloader attaches to every sample."""
    ensure_utc(spark)
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    return window_features(events)
