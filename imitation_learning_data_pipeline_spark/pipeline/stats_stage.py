"""Stats stage: weighted parallel variance reduction to global stats.

Reference: steps/stats_refactored.py — a streaming Python loop applying
S=Σn, mean=Σn·μ/S, var=Σn·(σ²+μ²)/S − mean² (clamped ≥0) per feature/dim
(_init_acc/_acc/_finalize, :9-44). Here both levels are plain Spark
aggregations:

  episode_feature_stats : frames → per-(episode, feature) n/mean/std/min/max
                          vectors (what episodes_stats.jsonl stores)
  combine_global_stats  : those partials → global stats document
                          (what global_stats.json stores)

The combine is exactly the reference's formula — so the pair is a
distributed-algebra identity test: combining per-episode partials must
equal direct global aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURES = ["action", "observation.state"]  # core/constants.py:13-16


def _explode_features(frames: DataFrame, features: list[str]) -> DataFrame:
    # ONE scan for all features (optimization r15): the former
    # union-of-selects shape scanned `frames` once PER feature — half
    # the stage_chain stats stage's scan tasks were a second pass over
    # the same rows. An array-of-structs explode emits the identical
    # (episode, feature, dim, x) row multiset from a single pass; the
    # downstream per-(episode, feature, dim) aggregates see the same
    # rows grouped the same way, so every statistic is bit-identical
    # (pinned by tests/test_pipeline_stages's combine-vs-direct identity
    # and value assertions).
    fz = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(feat).alias("feature"),
                    F.col(f"`{feat}`").cast("array<double>").alias("vals"),
                )
                for feat in features
            ]
        )
    ).alias("fz")
    return frames.select("episode_index", fz).select(
        "episode_index",
        F.col("fz.feature").alias("feature"),
        F.posexplode("fz.vals").alias("dim", "x"),
    )


def episode_feature_stats(
    frames: DataFrame, features: list[str] | None = None
) -> DataFrame:
    """Per-episode per-feature stats vectors (episodes_stats.jsonl shape:
    robot_data/README.md:62-79). Arrays are rebuilt ordered by dim."""
    ex = _explode_features(frames, features or FEATURES)
    per_dim = ex.groupBy("episode_index", "feature", "dim").agg(
        F.count("*").alias("n"),
        F.avg("x").alias("mu"),
        F.stddev_pop("x").alias("sd"),
        F.min("x").alias("mn"),
        F.max("x").alias("mx"),
    )
    arr = lambda c: F.transform(  # noqa: E731
        F.array_sort(F.collect_list(F.struct("dim", F.col(c).alias("v")))),
        lambda s: s.v,
    )
    return per_dim.groupBy("episode_index", "feature").agg(
        F.max("n").alias("count"),
        arr("mu").alias("mean"),
        arr("sd").alias("std"),
        arr("mn").alias("min"),
        arr("mx").alias("max"),
    )


def combine_global_stats(
    episode_stats: DataFrame, validated_ids: DataFrame | None = None
) -> DataFrame:
    """Weighted combine of per-episode stats → one row per feature.

    ``validated_ids`` (episode_index) filters via a semi join — the
    reference's validated-set membership check (stats_refactored.py:
    48-78,172-174, J4). Episodes with count == 0 are skipped, like
    stats_refactored.py:188-190.
    """
    es = episode_stats.filter(F.col("count") > 0)
    if validated_ids is not None:
        es = es.join(validated_ids.select("episode_index"), "episode_index", "left_semi")

    ex = es.select(
        "feature",
        F.col("count").alias("n"),
        F.posexplode(F.arrays_zip("mean", "std", "min", "max")).alias("dim", "z"),
    ).select(
        "feature",
        "n",
        "dim",
        F.col("z.mean").alias("mu"),
        F.col("z.std").alias("sd"),
        F.col("z.min").alias("mn"),
        F.col("z.max").alias("mx"),
    )
    s = F.sum("n")
    mean = F.sum(F.col("n") * F.col("mu")) / s
    ex2 = F.sum(F.col("n") * (F.col("sd") * F.col("sd") + F.col("mu") * F.col("mu"))) / s
    var = F.greatest(ex2 - mean * mean, F.lit(0.0))  # clamp, stats_refactored.py:40
    per_dim = ex.groupBy("feature", "dim").agg(
        s.alias("n"),
        mean.alias("mu"),
        F.sqrt(var).alias("sd"),
        F.min("mn").alias("mn"),
        F.max("mx").alias("mx"),
    )
    arr = lambda c: F.transform(  # noqa: E731
        F.array_sort(F.collect_list(F.struct("dim", F.col(c).alias("v")))),
        lambda st: st.v,
    )
    return per_dim.groupBy("feature").agg(
        F.max("n").cast("long").alias("count"),
        arr("mu").alias("mean"),
        arr("sd").alias("std"),
        arr("mn").alias("min"),
        arr("mx").alias("max"),
    )
