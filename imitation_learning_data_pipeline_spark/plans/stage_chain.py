"""End-to-end five-stage pipeline chain as a single bench entry.

Drives the real ``pipeline`` stage functions — discover (binaryFile
listing + fingerprint diff), validate (grouped one-pass checks +
broadcast meta), stats (weighted parallel variance), align (window chain
+ z-score), materialize (hash split + partitioned zstd write) — over a
synthetic LeRobot tree at bench scale (reference: the whole
scripts/neura.py DAG, discover >> validate >> stats >> align_transform >>
materialize).

Registered rows-only (oracle=None): the chain reads/writes local files
and its manifest URIs/timestamps are host-dependent, so it is excluded
from the 50-query contract surface (CONTRACT_EXCLUDE) and exists for
``bench.py`` and regression coverage of the stage composition itself.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..pipeline import (
    align_transform,
    combine_global_stats,
    discover,
    episode_feature_stats,
    materialize,
    validate_episodes,
)
from ..pipeline.synthetic import ensure_lerobot_tree
from ..session import ensure_utc
from .registry import register


def _fixture_root(sf_dir: str) -> tuple[str, int]:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else 0.01
    n_eps = max(20, int(1020 * sf))
    root = f"/tmp/ilp_stage_fixture_sf{sf}"
    return ensure_lerobot_tree(root, n_episodes=n_eps), n_eps


@register("pipeline_stage_chain", oracle=None)
def pipeline_stage_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """discover → validate → stats → align → materialize, one run.

    Returns one row per stage with its output cardinality — enough for
    the rows-only gate to catch a stage dropping or duplicating data.
    """
    ensure_utc(spark)
    root, _ = _fixture_root(sf_dir)

    manifest = discover(spark, root)
    manifest.persist()
    n_manifest = manifest.count()

    # One in-memory copy serves validate and stats (the tree would
    # otherwise be re-scanned per stage). align instead gets a fresh
    # file-backed read: an InMemoryRelation hides the `_metadata` column,
    # and align's keep-first ordering wants the exact storage coordinate.
    frames = spark.read.parquet(f"{root}/data/*").persist()
    meta = spark.read.json(f"{root}/meta/episodes.jsonl")
    report = validate_episodes(frames, meta)
    report.persist()
    n_validated = report.filter(F.col("ok")).count()

    stats_df = combine_global_stats(
        episode_feature_stats(frames),
        validated_ids=report.filter(F.col("ok")).select("episode_index"),
    )
    stats_rows = stats_df.collect()
    global_stats = {
        r["feature"]: {"mean": list(r["mean"]), "std": list(r["std"])}
        for r in stats_rows
    }

    aligned = align_transform(spark.read.parquet(f"{root}/data/*"), global_stats)
    out_dir = os.path.join(root, "out")
    index = materialize(aligned, out_dir)
    # One action for both index stats — a second action would re-run the
    # index plan (it is not persisted; at 100 TB that is a re-listing).
    idx_row = index.agg(
        F.count("*").alias("n"), F.sum("rows").alias("s")
    ).collect()[0]
    n_index, n_frames_out = idx_row["n"], idx_row["s"] or 0

    manifest.unpersist()
    report.unpersist()
    frames.unpersist()
    return spark.createDataFrame(
        [
            ("manifest_rows", int(n_manifest)),
            ("validated_ok_episodes", int(n_validated)),
            ("stats_features", len(stats_rows)),
            ("index_rows", int(n_index)),
            ("materialized_frames", int(n_frames_out)),
        ],
        "stage string, n long",
    )
