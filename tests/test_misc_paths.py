"""Coverage for small previously-untested paths: spread() sizing, video
link modes, the fixed (non-parity) reindex ordering."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


class TestSpreadSizing:
    def test_small_file_gets_few_partitions(self, spark):
        from imitation_learning_data_pipeline_spark.sources.readers import (
            load_table,
            spread,
        )

        docs = load_table(spark, SF_DIR, "documents")  # ~tens of KB
        parts = spread(docs).rdd.getNumPartitions()
        # sized by bytes (32 KiB/task), never the full defaultParallelism
        assert 1 <= parts < spark.sparkContext.defaultParallelism

    def test_cap_at_default_parallelism(self, spark):
        from imitation_learning_data_pipeline_spark.sources.readers import (
            load_table,
            spread,
        )

        docs = load_table(spark, SF_DIR, "documents")
        parts = spread(docs, bytes_per_task=1).rdd.getNumPartitions()
        assert parts == spark.sparkContext.defaultParallelism

    def test_non_file_frame_falls_back_to_cap(self, spark):
        from imitation_learning_data_pipeline_spark.sources.readers import spread

        df = spark.range(10)
        assert (
            spread(df).rdd.getNumPartitions()
            == spark.sparkContext.defaultParallelism
        )


class TestLinkVideos:
    @pytest.fixture()
    def placed_index(self, spark, lerobot_fixture, tmp_path):
        from imitation_learning_data_pipeline_spark.pipeline import (
            align_transform,
            materialize,
        )

        frames = spark.read.parquet(str(lerobot_fixture / "data" / "chunk-000"))
        aligned = align_transform(frames)
        index = materialize(aligned, str(tmp_path / "out"))
        return index.collect(), str(lerobot_fixture / "videos"), str(tmp_path / "out")

    @pytest.mark.parametrize("mode", ["symlink", "hardlink", "copy", "manifest"])
    def test_link_modes(self, placed_index, tmp_path, mode):
        from imitation_learning_data_pipeline_spark.pipeline.materialize import link_videos

        rows, vroot, out = placed_index
        dest = str(tmp_path / f"dest_{mode}")
        placed = link_videos(rows, vroot, dest, mode=mode)
        assert placed  # episodes with videos exist
        src, arrow, dst = placed[0].partition(" -> ")
        assert os.path.exists(src)
        if mode == "manifest":
            assert not os.path.exists(dst)  # manifest-only places nothing
        else:
            assert os.path.exists(dst)
            if mode == "symlink":
                assert os.path.islink(dst)
            elif mode == "hardlink":
                assert os.stat(dst).st_ino == os.stat(src).st_ino
            else:  # copy
                assert not os.path.islink(dst)
                assert os.path.getsize(dst) == os.path.getsize(src)


class TestSplitStability:
    def test_splits_never_move_when_data_grows(self, spark):
        """The F5 contract: split is a pure function of (key, seed), so
        re-running materialize on a grown dataset never moves an existing
        episode between splits (unlike randomSplit)."""
        from imitation_learning_data_pipeline_spark.functions.hashing import split_assign

        small = spark.range(1000).select("id", split_assign("id").alias("s"))
        grown = spark.range(5000).select("id", split_assign("id").alias("s"))
        moved = (
            small.alias("a")
            .join(grown.alias("b"), "id")
            .filter(F.col("a.s") != F.col("b.s"))
            .count()
        )
        assert moved == 0


class TestReindexModes:
    def test_reindex_after_clean_has_no_gaps(self, spark, frames):
        """reindex_after_clean=True is the FIXED behaviour (null-drop
        before reindex): frame_index is gap-free. Parity mode (default)
        reindexes first, so the NaN-timestamp drop in ep 5 leaves a gap
        (SURVEY §8.3)."""
        from imitation_learning_data_pipeline_spark.pipeline import align_transform

        ep5 = F.col("episode_index") == 5

        fixed = (
            align_transform(frames, reindex_after_clean=True)
            .filter(ep5)
            .select("frame_index")
            .orderBy("frame_index")
            .collect()
        )
        fixed_idx = [r.frame_index for r in fixed]
        assert fixed_idx == list(range(len(fixed_idx)))  # contiguous

        parity = (
            align_transform(frames)
            .filter(ep5)
            .select("frame_index")
            .orderBy("frame_index")
            .collect()
        )
        parity_idx = [r.frame_index for r in parity]
        assert len(parity_idx) == len(fixed_idx)
        assert parity_idx != list(range(len(parity_idx)))  # the gap survives
