"""Heterogeneous-shape ingest of pre-existing per-episode stats sidecars.

Reference: steps/stats_refactored.py:80-201 re-ingests
``meta/episodes_stats.jsonl`` whose per-feature dicts come from multiple
toolchains with drifting shapes (robot_data/README.md:88):

  - ``count`` may be a scalar or a per-dim list (first element wins,
    _extract_count :95-118);
  - alias fallbacks ``frame_count`` / ``frames`` / ``count_total``;
  - ``mean``/``std``/``min``/``max`` may be scalars (→ 1-dim vectors) or
    lists (_as_float_list :81-93);
  - the episode frame count n comes from ``action``, else
    ``observation.state``, else any feature that yields one
    (:178-190) — and that ONE n weights every feature of the episode;
  - episodes with no usable n are skipped (:188-190); features whose
    vectors are missing or width-misaligned are skipped per episode
    (_extract_vectors :121-135).

Spark shape: the JSONL is read as distributed text and every coercion is
a JVM expression (get_json_object + from_json + try_cast + coalesce) —
no schema unification fight with spark.read.json (SURVEY §7.5 item 4),
no Python in the row path. ANSI mode (Spark 4 default) makes plain casts
throw on malformed input, so every speculative coercion uses try_cast.

Output matches stats_stage.episode_feature_stats (episode_index, feature,
count, mean, std, min, max), so combine_global_stats consumes either
frames-derived or sidecar-ingested partials interchangeably.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .stats_stage import FEATURES

_COUNT_ALIASES = ["frame_count", "frames", "count_total"]  # :113-117


def _feature_path(feature: str) -> str:
    # Bracket form handles the dotted `observation.state` key.
    return f"$.stats['{feature}']"


def _extract_count(feat_json: Column) -> Column:
    """count scalar → count[0] → alias fallbacks, as a long (or null)."""
    c_raw = F.get_json_object(feat_json, "$.count")
    c_scalar = c_raw.try_cast("double").try_cast("long")
    c_first = (
        F.element_at(F.from_json(c_raw, "array<double>"), 1).try_cast("long")
    )
    fallbacks = [
        F.get_json_object(feat_json, f"$.{k}").try_cast("double").try_cast("long")
        for k in _COUNT_ALIASES
    ]
    return F.coalesce(c_scalar, c_first, *fallbacks)


def _float_list(feat_json: Column, key: str) -> Column:
    """JSON field → array<double>; scalar values become 1-dim vectors."""
    raw = F.get_json_object(feat_json, f"$.{key}")
    arr = F.from_json(raw, "array<double>")
    scalar = raw.try_cast("double")
    return F.when(arr.isNotNull(), arr).when(
        scalar.isNotNull(), F.array(scalar)
    )


def read_episode_stats_jsonl(
    spark: SparkSession,
    path: str,
    features: list[str] | None = None,
) -> DataFrame:
    """episodes_stats.jsonl → (episode_index, feature, count, mean, std,
    min, max) rows, with the reference's full coercion/skip semantics."""
    features = list(features or FEATURES)
    raw = spark.read.text(path).filter(F.trim("value") != "")

    feat_jsons = {
        feat: F.get_json_object("value", _feature_path(feat)) for feat in features
    }
    # One n per EPISODE: action → observation.state → any feature, first
    # usable (> 0) wins (:178-190). coalesce skips nulls; nullify non-
    # positive candidates so they fall through like the reference's loop.
    pos = lambda c: F.when(c > 0, c)  # noqa: E731
    # The reference ALWAYS consults stats['action'] then
    # stats['observation.state'] for n, regardless of which features were
    # requested (stats_refactored.py ref = st.get('action') or
    # st.get('observation.state')) — so the leads are probed even when
    # absent from `features`, then the requested features fall back in
    # order. Otherwise `--features other.feat` would weight (or skip)
    # episodes differently from the reference.
    lead_jsons = {
        lead: feat_jsons.get(lead, F.get_json_object("value", _feature_path(lead)))
        for lead in ("action", "observation.state")
    }
    n_candidates = [pos(_extract_count(j)) for j in lead_jsons.values()]
    n_candidates += [
        pos(_extract_count(feat_jsons[f]))
        for f in features
        if f not in ("action", "observation.state")
    ]

    base = raw.select(
        F.get_json_object("value", "$.episode_index").try_cast("long").alias(
            "episode_index"
        ),
        F.coalesce(*n_candidates).alias("n"),
        *[feat_jsons[f].alias(f"__j_{i}") for i, f in enumerate(features)],
    ).filter(F.col("episode_index").isNotNull() & F.col("n").isNotNull())

    per_feature = []
    for i, feat in enumerate(features):
        j = F.col(f"__j_{i}")
        per_feature.append(
            base.select(
                "episode_index",
                F.lit(feat).alias("feature"),
                F.col("n").alias("count"),
                _float_list(j, "mean").alias("mean"),
                _float_list(j, "std").alias("std"),
                _float_list(j, "min").alias("min"),
                _float_list(j, "max").alias("max"),
            )
        )
    out = per_feature[0]
    for p in per_feature[1:]:
        out = out.unionByName(p)

    # _extract_vectors alignment guard (:121-135): all four present and
    # the same width, else the feature is skipped for that episode.
    widths_ok = (
        F.col("mean").isNotNull()
        & F.col("std").isNotNull()
        & F.col("min").isNotNull()
        & F.col("max").isNotNull()
        & (F.size("std") == F.size("mean"))
        & (F.size("min") == F.size("mean"))
        & (F.size("max") == F.size("mean"))
    )
    return out.filter(widths_ok)
