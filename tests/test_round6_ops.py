"""Round-6 fixes: compaction skew split, swap crash-safety, LSH
multi-probe recall, and bench/CLI hygiene regressions from the r5
verdict punch list."""

from __future__ import annotations

import os

import pytest
from conftest import SF_DIR


def _parquet_files(d: str) -> list[str]:
    return [f for f in os.listdir(d) if f.endswith(".parquet")]


class TestCompactionSkew:
    def test_big_partition_splits_into_target_sized_files(self, spark, tmp_path):
        """r5 verdict What's-wrong #1: a skewed Hive partition must
        compact into ~ceil(bytes/target) files through multiple tasks,
        not funnel into one task / one oversized file."""
        from pyspark.sql import functions as F

        from imitation_learning_data_pipeline_spark.pipeline.compact import compact

        p = str(tmp_path / "skew")
        # part=big ~9x the bytes of part=small; sha2 payload defeats
        # compression so on-disk size tracks row count
        (
            spark.range(0, 10_000)
            .withColumn("part", F.when(F.col("id") % 10 == 0, "small").otherwise("big"))
            .withColumn("payload", F.sha2(F.col("id").cast("string"), 256))
            .repartition(20)
            .write.partitionBy("part")
            .parquet(p)
        )
        big_bytes = sum(
            os.path.getsize(os.path.join(p, "part=big", f))
            for f in _parquet_files(os.path.join(p, "part=big"))
        )
        target = big_bytes // 4  # expect ~4-5 slices in the big partition
        r = compact(spark, p, target_bytes=target, partition_col="part")
        big_after = _parquet_files(os.path.join(p, "part=big"))
        small_after = _parquet_files(os.path.join(p, "part=small"))
        assert len(big_after) > 1, "big partition must split, not funnel into one file"
        assert len(big_after) <= 8  # ~ceil(bytes/target), not sprawl
        assert len(small_after) <= 2
        back = spark.read.parquet(p)
        assert back.count() == 10_000
        assert back.filter(F.col("part") == "small").count() == 1_000

    def test_leftover_tmp_and_old_dirs_are_cleaned(self, spark, tmp_path):
        """A crashed prior run strands __compact_tmp/__compact_old;
        the next run must clear both and still succeed."""
        from imitation_learning_data_pipeline_spark.pipeline.compact import compact

        p = str(tmp_path / "t")
        spark.range(0, 1000).repartition(8).write.parquet(p)
        for leftover in (f"{p}__compact_tmp", f"{p}__compact_old"):
            os.makedirs(leftover)
            with open(os.path.join(leftover, "stale.parquet"), "w") as f:
                f.write("junk from a crashed run")
        r = compact(spark, p, target_bytes=1 << 30)
        assert r["files_after"] == 1
        assert not os.path.exists(f"{p}__compact_tmp")
        assert not os.path.exists(f"{p}__compact_old")
        assert spark.read.parquet(p).count() == 1000

    def test_unpartitioned_round_trip_still_green(self, spark, tmp_path):
        from imitation_learning_data_pipeline_spark.pipeline.compact import compact

        p = str(tmp_path / "u")
        spark.range(0, 4000).repartition(40).write.parquet(p)
        r = compact(spark, p, target_bytes=1 << 30)
        assert r["files_before"] == 40
        assert r["files_after"] == 1
        back = spark.read.parquet(p)
        assert back.count() == 4000
        assert back.agg({"id": "sum"}).collect()[0][0] == 4000 * 3999 // 2
