"""Window-function plans (SURVEY §2.6 W1-W5 + ranking/running extras).

The reference has no window API but four of its operators have exactly
window semantics: in-episode sort (W1), keep-first dedup (W2), lag-based
monotonicity (W3), reindex 0..N−1 (W4), first/last per group (W5). All
map to `Window.partitionBy(user_id).orderBy(ts, event_id)` here — one
hash-partition exchange per query, reused across window + agg stages.

Every ordering includes the unique `event_id` tiebreaker: "first
occurrence" must be well-defined under shuffling (SURVEY §7.5 item 1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .. import cache
from ..session import ensure_utc
from ..sources import load_table
from .registry import register


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_utc(spark)
    return load_table(spark, sf_dir, "events")


def bucket_ranked(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "r",
    n_buckets: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Exact global ``row_number()`` over ``order_cols`` WITHOUT an
    unpartitioned window (which plans an ``Exchange SinglePartition`` —
    one task sorts the whole frame; the r10 verdict's AUC bottleneck).

    Two-pass bucket rank with PLAN-LITERAL boundaries: approxQuantile
    boundaries of the LEADING sort column are collected once at build
    time and baked into the plan as literals, so the bucket id is a
    pure function of the ROW — unlike ``repartitionByRange``, whose
    bucket membership depends on a per-execution boundary SAMPLE, a
    recompute (cache eviction, task retry, late materialization) can
    never shift rows across buckets under the driver-baked offsets.
    All rows tying on the leading column share a bucket by
    construction, and the within-bucket window orders by the FULL key,
    so bucket-ascending + local row_number + cumulative offset IS the
    global rank — bit-identical to ``row_number().over(
    Window.orderBy(*order_cols))`` whenever the key is total (include
    a unique tiebreaker, the registry O2 rule). NULL leading keys get
    bucket −1 (Spark's nulls-first ascending order).

    Returns ``(ranked, cached)``: ``ranked`` carries ``rank_col``;
    ``cached`` is the persisted bucketed frame — a pure OPTIMIZATION
    (the counts pass and the final ranked read share one
    materialization); because bucket ids are row-pure, eviction or
    recompute is harmless to correctness. ``cached.unpersist()`` after
    consuming ``ranked`` releases the cache. Fuse your reduction over
    ``ranked`` (see ``quality_model.rank_auc``) rather than
    checkpointing the full ranked corpus when all you need is an
    aggregate of the ranks.

    The leading sort column must be numeric (approxQuantile); skewed
    leading-column ties degrade bucket balance, never correctness.
    """
    spark = df.sparkSession
    n = int(n_buckets or spark.conf.get("spark.sql.shuffle.partitions", "32"))
    keys = [F.col(c) for c in order_cols]
    c1 = order_cols[0]
    # Persist the INPUT before the boundary probe (VERDICT r11 #3): the
    # approxQuantile pass and the bucket fill otherwise each scan the
    # raw upstream chain — harmless on a table read, a full extra pass
    # when the input is an unmaterialized funnel. One cache serves
    # probe + fill; it is dropped as soon as the bucketed frame is
    # materialized by the counts pass (pytest-proven single scan via a
    # counting UDF upstream).
    # respect a caller-managed cache: persist() on an already-persisted
    # frame is a no-op, so OUR unpersist in the finally would evict the
    # CALLER's cache (Spark's cache manager keys on the analyzed plan)
    # — e.g. a pin()ned stage inside a curation composite would then
    # recompute in every downstream branch. Only manage the cache we
    # actually created.
    from pyspark.storagelevel import StorageLevel

    caller_cached = df.storageLevel != StorageLevel.NONE
    src = df if caller_cached else df.persist()
    try:
        if n > 1:
            try:
                qs = [i / n for i in range(1, n)]
                bounds = sorted(set(src.stat.approxQuantile(c1, qs, 0.001)))
            except Exception as exc:  # non-numeric leading column
                raise TypeError(
                    f"bucket_ranked: leading sort column {c1!r} must be "
                    f"numeric (approxQuantile boundary probe failed: {exc})"
                ) from exc
        else:
            bounds = []
        bucket = F.lit(0)
        for b in bounds:
            bucket = bucket + (F.col(c1) > F.lit(b)).cast("int")
        bucket = F.when(F.col(c1).isNull(), F.lit(-1)).otherwise(bucket)
        parted = (
            src.withColumn("__b", bucket.cast("int"))
            .repartition(max(len(bounds) + 1, 1), F.col("__b"))
            .persist()
        )
        # materializes `parted` (reading the input CACHE, not upstream)
        counts = parted.groupBy("__b").agg(F.count("*").alias("__cnt")).collect()
    finally:
        if not caller_cached:
            src.unpersist()
    cum, offset_rows = 0, []
    for r in sorted(counts, key=lambda r: r["__b"]):
        offset_rows.append((r["__b"], cum))
        cum += r["__cnt"]
    if not offset_rows:
        offset_rows = [(0, 0)]
    offsets = spark.createDataFrame(offset_rows, "__b int, __off long")
    w = Window.partitionBy("__b").orderBy(*keys)
    ranked = (
        parted.join(F.broadcast(offsets), "__b")
        .withColumn(rank_col, (F.row_number().over(w) + F.col("__off")).cast("long"))
        .drop("__b", "__off")
    )
    return ranked, parted


# --- W2: dedup keep-first (align_transform_refactored.py:108-110) -----------

@register(
    "window_dedup_first",
    oracle="""
SELECT event_id, user_id, event_type
FROM (
  SELECT event_id, user_id, event_type,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS rn
  FROM events
) WHERE rn = 1
""",
)
def window_dedup_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "event_type")
    )


# --- W3: lag-based monotonicity flags (validate_one.py:93-94) ---------------

@register(
    "window_lag_monotonic",
    oracle="""
WITH lagged AS (
  SELECT user_id, value, ts,
         lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_v,
         lag(ts)    OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
)
SELECT user_id,
       (min(CASE WHEN prev_v IS NULL OR value > prev_v THEN 1 ELSE 0 END) = 1)
         AS value_strictly_increasing,
       (min(CASE WHEN prev_ts IS NULL OR ts >= prev_ts THEN 1 ELSE 0 END) = 1)
         AS ts_non_decreasing,
       count(*) AS n
FROM lagged GROUP BY user_id
""",
)
def window_lag_monotonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Strict-vs-weak asymmetry mirrors the reference: frame_index strictly
    # increasing, timestamp only non-decreasing (validate_one.py:93-94).
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = ev.select(
        "user_id",
        "value",
        "ts",
        F.lag("value").over(w).alias("prev_v"),
        F.lag("ts").over(w).alias("prev_ts"),
    )
    ok = lambda cond: F.min(F.when(cond, 1).otherwise(0)) == 1  # noqa: E731
    return lagged.groupBy("user_id").agg(
        ok(F.col("prev_v").isNull() | (F.col("value") > F.col("prev_v"))).alias(
            "value_strictly_increasing"
        ),
        ok(F.col("prev_ts").isNull() | (F.col("ts") >= F.col("prev_ts"))).alias(
            "ts_non_decreasing"
        ),
        F.count("*").alias("n"),
    )


# --- W1+W4: sort within group + reindex 0..N−1 ------------------------------

@register(
    "window_reindex",
    oracle="""
SELECT event_id, user_id,
       row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
         AS new_index
FROM events
""",
)
def window_reindex(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Reference: int_range(0, len) overwrite after sort
    # (align_transform_refactored.py:111).
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id", "user_id", (F.row_number().over(w) - 1).alias("new_index")
    )


# --- W5: first/last per group (validate_one.py:96-97) -----------------------

@register(
    "window_first_last",
    oracle="""
SELECT user_id,
       arg_min(event_id, ts ORDER BY ts, event_id) AS first_event,
       arg_max(event_id, ts ORDER BY ts, event_id) AS last_event,
       round(arg_min(value, ts ORDER BY ts, event_id), 4) AS first_value,
       round(arg_max(value, ts ORDER BY ts, event_id), 4) AS last_value
FROM events GROUP BY user_id
""",
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    # min_by/max_by with a composite (ts, event_id) order key packed into a
    # struct — ties on ts resolved by event_id, same as the oracle's
    # ORDER BY inside arg_min/arg_max.
    ev = _events(spark, sf_dir)
    key = F.struct(F.col("ts"), F.col("event_id"))
    return ev.groupBy("user_id").agg(
        F.min_by("event_id", key).alias("first_event"),
        F.max_by("event_id", key).alias("last_event"),
        F.round(F.min_by("value", key), 4).alias("first_value"),
        F.round(F.max_by("value", key), 4).alias("last_value"),
    )


# --- running aggregate (engine capability; frames/rowsBetween) --------------

@register(
    "window_running_sum",
    oracle="""
SELECT event_id, user_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
         AS running_value
FROM events
""",
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id", "user_id", F.round(F.sum("value").over(w), 4).alias("running_value")
    )


# --- merged contract suites --------------------------------------------------
# The driver caps CORRECTNESS at 50 queries (registration order), so the
# contract surface exposes the W1-W5 + frame/ranking coverage as two merged
# plans; the granular single-op queries above stay in the library registry
# for API users and local checks.


@register(
    "window_frame_suite",
    oracle="""
SELECT event_id, user_id,
       row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
         AS new_index,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
         AS running_value,
       rank()   OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rnk,
       ntile(4) OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS quartile
FROM events
""",
)
def window_frame_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1+W4 reindex, running-sum frame, and ranking in one plan.

    Both window specs hash-partition on user_id, so Catalyst reuses a
    single exchange; the ts-ordered and value-ordered sorts each run once
    over the same partitioning."""
    ev = _events(spark, sf_dir)
    w_ts = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_idx = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_val = Window.partitionBy("user_id").orderBy(F.col("value").desc(), "event_id")
    return ev.select(
        "event_id",
        "user_id",
        (F.row_number().over(w_idx) - 1).alias("new_index"),
        F.round(F.sum("value").over(w_ts), 4).alias("running_value"),
        F.rank().over(w_val).alias("rnk"),
        F.ntile(4).over(w_val).alias("quartile"),
    )


@register(
    "window_group_order_suite",
    oracle="""
WITH lagged AS (
  SELECT user_id, value, ts, event_id,
         lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_v,
         lag(ts)    OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
)
SELECT user_id,
       (min(CASE WHEN prev_v IS NULL OR value > prev_v THEN 1 ELSE 0 END) = 1)
         AS value_strictly_increasing,
       (min(CASE WHEN prev_ts IS NULL OR ts >= prev_ts THEN 1 ELSE 0 END) = 1)
         AS ts_non_decreasing,
       count(*) AS n,
       arg_min(event_id, ts ORDER BY ts, event_id) AS first_event,
       arg_max(event_id, ts ORDER BY ts, event_id) AS last_event,
       round(arg_min(value, ts ORDER BY ts, event_id), 4) AS first_value,
       round(arg_max(value, ts ORDER BY ts, event_id), 4) AS last_value
FROM lagged GROUP BY user_id
""",
)
def window_group_order_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 lag-monotonicity flags + W5 first/last per group, one exchange:
    the lag window and the grouped min_by/max_by aggregation share the
    user_id hash partitioning (validate_one.py:89-100's one-pass shape)."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = ev.select(
        "user_id",
        "value",
        "ts",
        "event_id",
        F.lag("value").over(w).alias("prev_v"),
        F.lag("ts").over(w).alias("prev_ts"),
    )
    ok = lambda cond: F.min(F.when(cond, 1).otherwise(0)) == 1  # noqa: E731
    key = F.struct(F.col("ts"), F.col("event_id"))
    return lagged.groupBy("user_id").agg(
        ok(F.col("prev_v").isNull() | (F.col("value") > F.col("prev_v"))).alias(
            "value_strictly_increasing"
        ),
        ok(F.col("prev_ts").isNull() | (F.col("ts") >= F.col("prev_ts"))).alias(
            "ts_non_decreasing"
        ),
        F.count("*").alias("n"),
        F.min_by("event_id", key).alias("first_event"),
        F.max_by("event_id", key).alias("last_event"),
        F.round(F.min_by("value", key), 4).alias("first_value"),
        F.round(F.max_by("value", key), 4).alias("last_value"),
    )


# --- ranking functions (engine capability, §2.11 absence in reference) ------

@register(
    "window_rank_ntile",
    oracle="""
SELECT event_id, user_id,
       rank()  OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rnk,
       ntile(4) OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS quartile
FROM events
""",
)
def window_rank_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.col("value").desc(), "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.rank().over(w).alias("rnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "window_global_rank",
    oracle="""
SELECT event_id,
       CAST(row_number() OVER (ORDER BY value, event_id) AS BIGINT) AS r
FROM events
""",
)
def window_global_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Library row for :func:`bucket_ranked` (the r10 verdict's
    distributed-AUC core): the exact global row_number over the events
    table WITHOUT an unpartitioned window, hash-checked against DuckDB
    computing the single-sort form. The offsets collect happens at plan
    build (metadata-sized — one row per bucket); bucket boundaries are
    plan literals, so the returned lazy frame stays valid however late
    the harness materializes it — recompute cannot shift bucket
    membership under the baked offsets."""
    ensure_utc(spark)
    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    # This contract wrapper returns a LAZY frame and cannot unpersist
    # synchronously, so the bucketed cache is registered with the plan
    # registry: the next top-level plan evicts it (ADVICE r11 — the
    # bare discard leaked one events-sized cache per invocation).
    # Eviction is correctness-safe: bucket ids are plan literals, so a
    # recompute cannot shift rank assignments.
    cache.begin_plan()
    ranked, cached = bucket_ranked(ev, ["value", "event_id"], rank_col="r")
    cache.pin(cached)
    return ranked.select("event_id", F.col("r").cast("long").alias("r"))
