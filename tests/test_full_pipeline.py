"""End-to-end: discover → validate → stats → align → materialize on the
LeRobot-shaped fixture — the reference's whole DAG
(airflow/dags/neura_pipeline_dag.py:135 chain) as one Spark session run."""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import functions as F


def test_five_stage_chain(spark, lerobot_fixture, frames, episodes_meta, tmp_path):
    from imitation_learning_data_pipeline_spark.pipeline import (
        align_transform,
        combine_global_stats,
        discover,
        episode_feature_stats,
        materialize,
        validate_episodes,
    )
    from imitation_learning_data_pipeline_spark.pipeline.outputs import (
        write_validation_outputs,
    )

    # 1. discover
    manifest = discover(spark, str(lerobot_fixture))
    assert manifest.filter(F.col("status") == "NEW").count() == 18

    # 2. validate (+ sink bundle K2/K5/K6)
    report = validate_episodes(frames, episodes_meta)
    out_dir = str(tmp_path / "validate_out")
    summary = write_validation_outputs(report, out_dir)
    assert summary["total"] == 19
    assert summary["ok"] >= 10
    assert os.path.exists(f"{out_dir}/summary.yaml")
    assert spark.read.json(f"{out_dir}/failures.jsonl").count() == summary["fail"]

    # 3. stats over validated episodes only (semi join)
    validated = report.filter(F.col("ok")).select("episode_index")
    es = episode_feature_stats(frames)
    g = {r.feature: r for r in combine_global_stats(es, validated).collect()}
    stats_doc = {
        feat: {"mean": list(r.mean), "std": list(r.std)} for feat, r in g.items()
    }

    # 4. align/transform with those stats
    aligned = align_transform(frames, global_stats=stats_doc)
    # Normalized action over validated episodes ≈ standard normal.
    vec = (
        aligned.join(validated, "episode_index", "left_semi")
        .select(F.explode("action").alias("x"))
        .agg(F.avg("x").alias("mu"), F.stddev_pop("x").alias("sd"))
        .collect()[0]
    )
    assert abs(vec.mu) < 0.15
    assert abs(vec.sd - 1.0) < 0.15

    # 5. materialize
    out2 = str(tmp_path / "dataset")
    index = materialize(aligned, out2)
    back = spark.read.parquet(f"{out2}/data")
    assert back.count() == aligned.count()
    assert index.agg(F.sum("rows")).collect()[0][0] == aligned.count()
    # Hive layout on disk
    assert any(p.startswith("split=") for p in os.listdir(f"{out2}/data"))


def test_media_probe_works_without_ffprobe(spark, lerobot_fixture):
    """Without ffprobe the probe falls back to the pure-Python MP4 box
    parser (round 5, un-degrading S9): the fixture's minimal-but-real
    MP4s probe ok with real frame counts; with ffprobe present the
    headerless fixtures may fail per-file but the plan survives."""
    from imitation_learning_data_pipeline_spark.operators.media_probe import (
        ffprobe_available,
        probe_videos,
    )
    from imitation_learning_data_pipeline_spark.pipeline.discover import list_videos

    vids = list_videos(spark, str(lerobot_fixture))
    out = probe_videos(vids).collect()
    assert len(out) == vids.select("video_uri").distinct().count()
    if not ffprobe_available():
        assert all(r.ok for r in out)
        assert all(r.nb_frames and abs(r.avg_fps - 30.0) < 0.01 for r in out)
    else:
        # sample-data-free mp4s -> ffprobe may fail per-file, plan survives
        assert all(r.error is not None or r.ok for r in out)
