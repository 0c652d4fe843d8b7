"""Scale-pattern artifacts: bucketed co-located joins and salted joins.

These assert PHYSICAL PLAN properties, not just results — the point of
bucketing is the absent Exchange; the point of salting is the spread
partitioning — because at 100 TB the plan shape IS the feature.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class TestBucketedJoin:
    @pytest.fixture(scope="class")
    def bucketed_tables(self, spark, tmp_path_factory):
        """Write orders/lineitem-shaped tables bucketed by join key.

        bucketBy co-locates equal keys in equal bucket files, so a join
        of two tables bucketed the same way needs NO shuffle — the
        pre-paid exchange, amortized over every future join.
        """
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        orders = spark.range(1000).select(
            F.col("id").alias("o_orderkey"),
            (F.col("id") % 7).alias("o_custkey"),
            (F.rand(42) * 100).alias("o_totalprice"),
        )
        li = (
            spark.range(4000)
            .select(
                (F.col("id") % 1000).alias("l_orderkey"),
                (F.col("id") % 5 + 1).alias("l_linenumber"),
                (F.rand(7) * 10).alias("l_quantity"),
            )
        )
        (
            orders.write.mode("overwrite")
            .bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .saveAsTable("b_orders")
        )
        (
            li.write.mode("overwrite")
            .bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .saveAsTable("b_lineitem")
        )
        yield "b_orders", "b_lineitem"
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")

    def test_bucketed_join_has_no_exchange(self, spark, bucketed_tables):
        t_orders, t_li = bucketed_tables
        # disable broadcast so the join would otherwise shuffle both sides
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = spark.table(t_orders).join(
                spark.table(t_li),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            plan = _physical_plan(j)
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan  # bucket layout replaces the shuffle
            # and the result is still right
            assert j.count() == 4000
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    def test_unbucketed_join_does_exchange(self, spark, bucketed_tables):
        """Control: the same join over plain frames shuffles."""
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            a = spark.range(1000).select(F.col("id").alias("o_orderkey"))
            b = spark.range(4000).select((F.col("id") % 1000).alias("l_orderkey"))
            plan = _physical_plan(
                a.join(b, F.col("o_orderkey") == F.col("l_orderkey"))
            )
            assert "Exchange" in plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


class TestPartitionPruning:
    def test_split_filter_prunes_partitions(self, spark, lerobot_fixture, tmp_path):
        """K4's read-side payoff: filtering the materialized
        split=/chunk= layout on a partition column reaches the scan as a
        partition filter — only matching directories are read."""
        from imitation_learning_data_pipeline_spark.pipeline import (
            align_transform,
            materialize,
        )

        frames = spark.read.parquet(str(lerobot_fixture / "data" / "chunk-000"))
        out = str(tmp_path / "out")
        materialize(align_transform(frames), out)

        back = spark.read.parquet(f"{out}/data")
        pruned = back.filter(F.col("split") == "train")
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "split" in plan.split(
            "PartitionFilters"
        )[1].split("]")[0]
        # (inputFiles() lists the relation pre-pruning, so the plan's
        # PartitionFilters entry above is the authoritative evidence)
        assert {r.split for r in pruned.select("split").distinct().collect()} == {
            "train"
        }


class TestSaltedJoin:
    def test_salted_join_matches_plain_join(self, spark):
        from imitation_learning_data_pipeline_spark.functions.skew import salted_join

        # skewed probe: 90% of rows share key 0
        probe = spark.range(10_000).select(
            F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 100).alias("k"),
            F.col("id").alias("payload"),
        )
        build = spark.range(100).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("dim")
        )
        plain = probe.join(build, "k").select("k", "payload", "dim")
        salted = salted_join(probe, build, ["k"], n_salts=8).select(
            "k", "payload", "dim"
        )
        assert sorted(plain.collect()) == sorted(salted.collect())

        # and the hot key really fans out across salts inside the join
        from imitation_learning_data_pipeline_spark.functions.skew import (
            SALT_COL,
            salt_probe,
        )

        hot_salts = (
            salt_probe(probe, 8)
            .filter(F.col("k") == 0)
            .select(SALT_COL)
            .distinct()
            .count()
        )
        assert hot_salts == 8

    def test_salt_spreads_hot_key(self, spark):
        from imitation_learning_data_pipeline_spark.functions.skew import (
            SALT_COL,
            salt_probe,
        )

        hot = spark.range(8_000).select(F.lit(0).alias("k"), F.col("id").alias("p"))
        n_salts = 8
        spread_counts = (
            salt_probe(hot, n_salts, key="p")
            .groupBy(SALT_COL)
            .count()
            .collect()
        )
        # all salts used, and no salt holds more than ~2x its fair share
        assert len(spread_counts) == n_salts
        assert max(r["count"] for r in spread_counts) < 2 * 8_000 / n_salts
