"""Round-7 hardening tests.

Covers the round-6 verdict punch list: oracle type safety (the
``mixture_token_budget`` HUGEINT regression class), single-writer guards
for maintenance ops, merge schema-evolution stance, Bloom-decontam
oracle equivalence, clustered-layout merge locality, and sketch-profile
accuracy bounds.
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo/tools")

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


class TestOracleTypeSafety:
    """No oracle may emit a DuckDB type that pandas materializes lossily.

    DuckDB sums BIGINT into HUGEINT; pandas turns HUGEINT into float64, so
    the driver hashes ``1435.0`` against Spark's ``1435`` and fails even
    when every value matches (the round-6 ``mixture_token_budget`` red
    row). Binding types is lazy — this sweeps all registered oracles
    without executing any of them.
    """

    def test_no_oracle_emits_hugeint_or_decimal(self):
        import duckdb

        from check_contract import oracle_type_violations
        from imitation_learning_data_pipeline_spark.plans import ORACLES

        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * "
                f"FROM read_parquet('{SF_DIR}/{t}.parquet')"
            )
        violations = {}
        for name, sql in ORACLES.items():
            bad = oracle_type_violations(con.sql(sql))
            if bad:
                violations[name] = bad
        assert not violations, (
            "oracles emitting driver-unsafe types (wrap the projection in "
            f"CAST(... AS BIGINT/DOUBLE)): {violations}"
        )

    def test_detector_catches_bare_sum(self):
        import duckdb

        from check_contract import oracle_type_violations

        con = duckdb.connect()
        rel = con.sql("SELECT sum(x) AS s FROM (VALUES (CAST(1 AS BIGINT))) t(x)")
        assert oracle_type_violations(rel) == ["s:HUGEINT"]
        rel_ok = con.sql(
            "SELECT CAST(sum(x) AS BIGINT) AS s "
            "FROM (VALUES (CAST(1 AS BIGINT))) t(x)"
        )
        assert oracle_type_violations(rel_ok) == []


class TestMaintenanceLock:
    """Single-writer guard (round-6 verdict item 2): merge_into and
    compact take a create-exclusive sibling lock; a second maintenance
    op on the same path raises instead of double-applying, and a crashed
    holder's lock can be taken over by age."""

    def _write_table(self, spark, p):
        spark.range(0, 100).selectExpr("id", "id AS val").repartition(
            4
        ).write.parquet(p)

    def test_merge_on_locked_path_raises(self, spark, tmp_path):
        from imitation_learning_data_pipeline_spark.pipeline.merge import (
            ConcurrentMaintenanceError,
            merge_into,
        )

        p = str(tmp_path / "t")
        self._write_table(spark, p)
        with open(p + "__maintenance_lock", "w") as fh:
            fh.write('{"op": "merge_into", "pid": 1}')
        upd = spark.createDataFrame([(1, -1)], ["id", "val"])
        with pytest.raises(ConcurrentMaintenanceError, match="maintenance"):
            merge_into(spark, p, upd, key="id")
        # table untouched, foreign lock not stolen
        assert spark.read.parquet(p).count() == 100
        import os

        assert os.path.exists(p + "__maintenance_lock")

    def test_compact_on_locked_path_raises(self, spark, tmp_path):
        from imitation_learning_data_pipeline_spark.pipeline.compact import (
            ConcurrentMaintenanceError,
            compact,
        )

        p = str(tmp_path / "c")
        self._write_table(spark, p)
        with open(p + "__maintenance_lock", "w") as fh:
            fh.write('{"op": "compact", "pid": 1}')
        with pytest.raises(ConcurrentMaintenanceError):
            compact(spark, p)

    def test_lock_released_after_success_and_failure(self, spark, tmp_path):
        import os

        from imitation_learning_data_pipeline_spark.pipeline.merge import merge_into

        p = str(tmp_path / "rel")
        self._write_table(spark, p)
        upd = spark.createDataFrame([(1, -1)], ["id", "val"])
        merge_into(spark, p, upd, key="id")
        assert not os.path.exists(p + "__maintenance_lock")
        # a failing merge (bad schema) must also release the lock
        bad = spark.createDataFrame([(1,)], ["id"])
        with pytest.raises(ValueError):
            merge_into(spark, p, bad, key="id")
        assert not os.path.exists(p + "__maintenance_lock")
        # and the path is immediately lockable again
        merge_into(spark, p, upd, key="id")

    def test_stale_lock_takeover(self, spark, tmp_path):
        import os

        from imitation_learning_data_pipeline_spark.pipeline.merge import (
            ConcurrentMaintenanceError,
            merge_into,
        )

        p = str(tmp_path / "st")
        self._write_table(spark, p)
        lock = p + "__maintenance_lock"
        with open(lock, "w") as fh:
            fh.write('{"op": "merge_into", "pid": 1}')
        os.utime(lock, (1_000_000, 1_000_000))  # ancient mtime
        upd = spark.createDataFrame([(1, -1)], ["id", "val"])
        # without stale_lock_s: still refuses
        with pytest.raises(ConcurrentMaintenanceError):
            merge_into(spark, p, upd, key="id")
        # with takeover window: crashed lock is broken, merge proceeds
        stats = merge_into(spark, p, upd, key="id", stale_lock_s=3600)
        assert stats["rows_matched"] == 1
        assert not os.path.exists(lock)

    def test_release_lock_helper(self, spark, tmp_path):
        from imitation_learning_data_pipeline_spark.pipeline.merge import (
            release_lock,
        )

        p = str(tmp_path / "rl")
        self._write_table(spark, p)
        assert release_lock(spark, p) is False
        with open(p + "__maintenance_lock", "w") as fh:
            fh.write("{}")
        assert release_lock(spark, p) is True
        assert release_lock(spark, p) is False


class TestStandaloneRecover:
    def test_recover_completes_crashed_commit(self, spark, tmp_path):
        """recover(spark, path) finishes a journaled commit without
        requiring another merge (ADVICE r6: a one-shot pipeline crash
        otherwise leaves duplicate-visible keys indefinitely)."""
        import json
        import os

        from imitation_learning_data_pipeline_spark.pipeline.merge import recover

        p = str(tmp_path / "cr")
        spark.range(0, 100).selectExpr("id", "id AS val").repartition(
            4
        ).write.parquet(p)
        files = sorted(
            f
            for f in os.listdir(p)
            if f.endswith(".parquet") and not f.startswith("_")
        )
        victim = os.path.join(p, files[0])
        victim_rows = {
            (r["id"], r["val"]) for r in spark.read.parquet(victim).collect()
        }
        tmp = p + "__merge_tmp"
        staged_rows = [(i, -7 if i == 7 else v) for (i, v) in victim_rows]
        spark.createDataFrame(staged_rows, ["id", "val"]).coalesce(
            1
        ).write.parquet(tmp)
        staged_file = next(
            f
            for f in os.listdir(tmp)
            if f.endswith(".parquet") and not f.startswith("_")
        )
        with open(os.path.join(p, "__merge_pending.json"), "w") as fh:
            json.dump({"add": [staged_file], "delete": [victim]}, fh)

        assert recover(spark, p) is True
        base = {(i, i) for i in range(100)}
        if (7, 7) in victim_rows:
            base = (base - {(7, 7)}) | {(7, -7)}
        got = {(r["id"], r["val"]) for r in spark.read.parquet(p).collect()}
        assert got == base
        assert not os.path.exists(os.path.join(p, "__merge_pending.json"))
        assert not os.path.exists(tmp)
        assert not os.path.exists(p + "__maintenance_lock")
        # idempotent no-op when clean
        assert recover(spark, p) is False


class TestMergeSchemaEvolution:
    def test_extra_columns_raise_by_default(self, spark, tmp_path):
        from imitation_learning_data_pipeline_spark.pipeline.merge import merge_into

        p = str(tmp_path / "se")
        spark.range(0, 50).selectExpr("id", "id AS val").write.parquet(p)
        upd = spark.createDataFrame([(1, -1, "x")], ["id", "val", "note"])
        with pytest.raises(ValueError, match="allow_new_columns"):
            merge_into(spark, p, upd, key="id")
        assert spark.read.parquet(p).columns == ["id", "val"]

    def test_missing_columns_raise(self, spark, tmp_path):
        from imitation_learning_data_pipeline_spark.pipeline.merge import merge_into

        p = str(tmp_path / "sm")
        spark.range(0, 50).selectExpr("id", "id AS val").write.parquet(p)
        upd = spark.createDataFrame([(1,)], ["id"])
        with pytest.raises(ValueError, match="missing target columns"):
            merge_into(spark, p, upd, key="id")

    def test_allow_new_columns_widens_schema(self, spark, tmp_path):
        from imitation_learning_data_pipeline_spark.pipeline.merge import merge_into

        p = str(tmp_path / "sw")
        spark.range(0, 100).selectExpr("id", "id AS val").repartition(
            4
        ).write.parquet(p)
        upd = spark.createDataFrame(
            [(7, -7, "updated"), (500, -500, "inserted")], ["id", "val", "note"]
        )
        stats = merge_into(spark, p, upd, key="id", allow_new_columns=True)
        assert stats["rows_matched"] == 1 and stats["rows_inserted"] == 1
        # evolved table: untouched files keep the old schema → mergeSchema
        df = spark.read.option("mergeSchema", "true").parquet(p)
        assert set(df.columns) == {"id", "val", "note"}
        rows = {(r["id"], r["val"], r["note"]) for r in df.collect()}
        assert (7, -7, "updated") in rows
        assert (500, -500, "inserted") in rows
        # survivors in the rewritten file carry null for the new column
        assert (8, 8, None) in rows
        assert len(rows) == 101


class TestCompactSprawling:
    """Selective maintenance compaction: only sprawling partitions
    rewrite — cost ∝ sprawl, untouched partitions keep bytes/mtimes."""

    def _build(self, spark, p):
        from pyspark.sql import functions as F

        # split=a: 40 micro-files (sprawled); split=b: 1 file (healthy)
        (
            spark.range(0, 4000)
            .select(F.col("id"), F.lit("a").alias("split"))
            .repartition(40)
            .write.partitionBy("split")
            .parquet(p)
        )
        (
            spark.range(4000, 5000)
            .select(F.col("id"), F.lit("b").alias("split"))
            .coalesce(1)
            .write.mode("append")
            .partitionBy("split")
            .parquet(p)
        )

    @staticmethod
    def _dir_state(d):
        import os

        out = {}
        for root, _, names in os.walk(d):
            for n in names:
                if n.endswith(".parquet"):
                    fp = os.path.join(root, n)
                    out[fp] = (os.path.getsize(fp), os.path.getmtime(fp))
        return out

    def test_only_sprawled_partition_rewrites(self, spark, tmp_path):
        import os

        from imitation_learning_data_pipeline_spark.pipeline.compact import (
            compact_sprawling,
        )

        p = str(tmp_path / "t")
        self._build(spark, p)
        healthy_before = self._dir_state(os.path.join(p, "split=b"))
        stats = compact_sprawling(
            spark, p, target_bytes=64 * 1024 * 1024, partition_col="split"
        )
        assert stats["selected"] == ["split=a"]
        assert stats["partitions_total"] == 2
        assert stats["files_before"] == 40 and stats["files_after"] == 1
        # healthy partition byte-and-mtime identical
        assert self._dir_state(os.path.join(p, "split=b")) == healthy_before
        # data intact, layout intact
        df = spark.read.parquet(p)
        assert df.count() == 5000
        assert {r["split"] for r in df.select("split").distinct().collect()} == {
            "a", "b",
        }
        # idempotent: second maintenance pass selects nothing
        stats2 = compact_sprawling(
            spark, p, target_bytes=64 * 1024 * 1024, partition_col="split"
        )
        assert stats2["partitions_selected"] == 0

    def test_explicit_partition_list_and_flat_raise(self, spark, tmp_path):
        import pytest as _pytest

        from imitation_learning_data_pipeline_spark.pipeline.compact import (
            compact_sprawling,
        )

        p = str(tmp_path / "t2")
        self._build(spark, p)
        stats = compact_sprawling(
            spark, p, partition_col="split", partitions=["split=b"]
        )
        assert stats["selected"] == ["split=b"]
        with _pytest.raises(ValueError, match="no such partitions"):
            compact_sprawling(
                spark, p, partition_col="split", partitions=["split=zzz"]
            )
        flat = str(tmp_path / "flat")
        spark.range(0, 10).write.parquet(flat)
        with _pytest.raises(ValueError, match="no first-level"):
            compact_sprawling(spark, flat)

    def test_multilevel_inner_layout_preserved(self, spark, tmp_path):
        import os

        from pyspark.sql import functions as F

        from imitation_learning_data_pipeline_spark.pipeline.compact import (
            compact_sprawling,
        )

        p = str(tmp_path / "ml")
        (
            spark.range(0, 2000)
            .select(
                "id",
                F.lit("train").alias("split"),
                (F.col("id") % 2).cast("string").alias("chunk"),
            )
            .repartition(20)
            .write.partitionBy("split", "chunk")
            .parquet(p)
        )
        stats = compact_sprawling(
            spark, p, partition_col=["split", "chunk"]
        )
        assert stats["selected"] == ["split=train"]
        # inner chunk= level survives the rewrite
        inner = sorted(os.listdir(os.path.join(p, "split=train")))
        assert [d for d in inner if d.startswith("chunk=")] == [
            "chunk=0", "chunk=1",
        ]
        df = spark.read.parquet(p)
        assert df.count() == 2000
        assert set(df.columns) == {"id", "split", "chunk"}

    def test_respects_maintenance_lock(self, spark, tmp_path):
        import pytest as _pytest

        from imitation_learning_data_pipeline_spark.pipeline.compact import (
            ConcurrentMaintenanceError,
            compact_sprawling,
        )

        p = str(tmp_path / "lk")
        self._build(spark, p)
        with open(p + "__maintenance_lock", "w") as fh:
            fh.write("{}")
        with _pytest.raises(ConcurrentMaintenanceError):
            compact_sprawling(spark, p, partition_col="split")


class TestExpectations:
    """Declarative one-pass expectations: null-as-violation semantics,
    single-scan plan, and rule outcomes."""

    def test_rule_outcomes_and_null_semantics(self, spark):
        from pyspark.sql import functions as F

        from imitation_learning_data_pipeline_spark.plans.profile import (
            check_expectations,
        )

        df = spark.createDataFrame(
            [(1, "a", 10), (2, None, 20), (3, "c", None), (4, "d", -5)],
            "id long, name string, score long",
        )
        out = {
            r["rule"]: (r["n_violations"], r["pass"])
            for r in check_expectations(
                df,
                [
                    ("id_positive", "id > 0"),
                    ("name_not_null", "name IS NOT NULL"),
                    # score NULL → predicate NULL → violation
                    ("score_nonneg", "score >= 0"),
                    # opt-out of null-as-violation
                    ("score_nonneg_lenient", "coalesce(score >= 0, true)"),
                    ("always", F.lit(True)),
                ],
            ).collect()
        }
        assert out["id_positive"] == (0, True)
        assert out["name_not_null"] == (1, False)
        assert out["score_nonneg"] == (2, False)  # NULL + (-5)
        assert out["score_nonneg_lenient"] == (1, False)  # only -5
        assert out["always"] == (0, True)

    def test_single_scan_plan(self, spark):
        """50 rules must still be ONE aggregate over one scan — no
        per-rule passes."""
        import io
        from contextlib import redirect_stdout

        from imitation_learning_data_pipeline_spark.plans.profile import (
            check_expectations,
        )

        df = spark.range(0, 10).selectExpr("id", "id * 2 AS v")
        rules = [(f"r{i}", f"v >= {i}") for i in range(50)]
        plan_df = check_expectations(df, rules)
        buf = io.StringIO()
        with redirect_stdout(buf):
            plan_df.explain("formatted")
        plan = buf.getvalue()
        assert plan.count("Scan ") + plan.count("Range ") <= 2  # one source
        assert len(plan_df.collect()) == 50

    def test_empty_rules_raise(self, spark):
        from imitation_learning_data_pipeline_spark.plans.profile import (
            check_expectations,
        )

        with pytest.raises(ValueError, match="no rules"):
            check_expectations(spark.range(1), [])


class TestProfileDrift:
    def _profile(self, spark, df, cols):
        from imitation_learning_data_pipeline_spark.plans.profile import (
            merge_profiles,
            profile_estimates,
            profile_frame_sketch,
        )

        return profile_estimates(merge_profiles(profile_frame_sketch(df, cols)))

    def test_drift_flags(self, spark):
        from pyspark.sql import functions as F

        from imitation_learning_data_pipeline_spark.plans.profile import (
            profile_drift,
        )

        base_df = spark.range(0, 10_000).select(
            F.col("id").alias("k"),
            (F.col("id") % 100).alias("cat"),
            F.lit("x").alias("stable"),
        )
        # current: same volume, but cat collapses to 3 values (cardinality
        # crash) and stable gains 20% nulls (null-rate jump)
        cur_df = spark.range(0, 10_000).select(
            F.col("id").alias("k"),
            (F.col("id") % 3).alias("cat"),
            F.when(F.col("id") % 5 == 0, None).otherwise(F.lit("x")).alias(
                "stable"
            ),
        )
        base = self._profile(spark, base_df, ["k", "cat", "stable"])
        cur = self._profile(spark, cur_df, ["k", "cat", "stable"])
        out = {
            r["column_name"]: r for r in profile_drift(base, cur).collect()
        }
        assert out["k"]["drifted"] is False  # proportional, no nulls
        assert out["cat"]["drifted"] is True  # cardinality crash
        assert out["stable"]["drifted"] is True  # null-rate jump
        assert abs(out["stable"]["null_rate_delta"] - 0.2) < 0.001
        assert not out["k"]["column_added_or_dropped"]

    def test_added_and_dropped_columns_flag(self, spark):
        from pyspark.sql import functions as F

        from imitation_learning_data_pipeline_spark.plans.profile import (
            profile_drift,
        )

        b_df = spark.range(0, 100).select(
            F.col("id").alias("k"), F.lit("x").alias("old_col")
        )
        c_df = spark.range(0, 100).select(
            F.col("id").alias("k"), F.lit("y").alias("new_col")
        )
        base = self._profile(spark, b_df, ["k", "old_col"])
        cur = self._profile(spark, c_df, ["k", "new_col"])
        out = {
            r["column_name"]: r for r in profile_drift(base, cur).collect()
        }
        assert out["old_col"]["column_added_or_dropped"] is True
        assert out["old_col"]["drifted"] is True
        assert out["new_col"]["column_added_or_dropped"] is True
        assert out["k"]["drifted"] is False


class TestStreamingMergeUpsert:
    """foreachBatch CDC upsert into a parquet table via merge_into:
    checkpointed arrivals, within-batch last-version-wins, bootstrap,
    and no-op replay convergence."""

    def _run(self, spark, ingest, target, ckpt, order_col=None):
        from pyspark.sql import types as T

        from imitation_learning_data_pipeline_spark.streaming.incremental import (
            run_streaming_merge_stream,
        )

        schema = T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("val", T.StringType()),
                T.StructField("seq", T.LongType()),
            ]
        )
        stream = spark.readStream.schema(schema).parquet(str(ingest))
        run_streaming_merge_stream(
            stream, target, key="id", checkpoint=ckpt, order_col=order_col
        )

    def _state(self, spark, target):
        return {
            r["id"]: (r["val"], r["seq"])
            for r in spark.read.parquet(target).collect()
        }

    def test_arrivals_bootstrap_update_replay(self, spark, tmp_path):
        ingest = tmp_path / "in"
        target = str(tmp_path / "t")
        ckpt = str(tmp_path / "ck")

        def write(rows, n):
            spark.createDataFrame(
                rows, "id long, val string, seq long"
            ).coalesce(1).write.mode("append").parquet(str(ingest))

        # arrival 1: bootstrap
        write([(1, "a", 1), (2, "b", 1), (3, "c", 1)], 1)
        self._run(spark, ingest, target, ckpt, order_col="seq")
        assert self._state(spark, target) == {
            1: ("a", 1), 2: ("b", 1), 3: ("c", 1),
        }

        # arrival 2: update id 2 (two versions in one batch — last
        # wins), insert id 4
        write([(2, "stale", 2), (2, "fresh", 3), (4, "d", 2)], 2)
        self._run(spark, ingest, target, ckpt, order_col="seq")
        assert self._state(spark, target) == {
            1: ("a", 1), 2: ("fresh", 3), 3: ("c", 1), 4: ("d", 2),
        }

        # arrival 3: no new data — replay is a no-op, state unchanged
        self._run(spark, ingest, target, ckpt, order_col="seq")
        assert self._state(spark, target) == {
            1: ("a", 1), 2: ("fresh", 3), 3: ("c", 1), 4: ("d", 2),
        }
        # no duplicate keys ever
        dups = (
            spark.read.parquet(target)
            .groupBy("id")
            .count()
            .filter("count > 1")
            .count()
        )
        assert dups == 0

    def test_fresh_checkpoint_replay_converges(self, spark, tmp_path):
        """At-least-once worst case: the WHOLE feed replays against the
        already-merged table (new checkpoint, same target) — merge's
        key-idempotence converges to the same state."""
        ingest = tmp_path / "in2"
        target = str(tmp_path / "t2")
        spark.createDataFrame(
            [(1, "a", 1), (2, "b", 1)], "id long, val string, seq long"
        ).coalesce(1).write.mode("append").parquet(str(ingest))
        self._run(spark, ingest, target, str(tmp_path / "ck_a"), order_col="seq")
        before = self._state(spark, target)
        self._run(spark, ingest, target, str(tmp_path / "ck_b"), order_col="seq")
        assert self._state(spark, target) == before


class TestShardExport:
    """Deterministic shuffled shard export: reproducible permutation,
    one file per shard, file order == plan order."""

    def test_plan_is_deterministic_and_balanced(self, spark):
        from imitation_learning_data_pipeline_spark.plans.sampling import (
            shard_plan,
        )

        docs = spark.range(0, 5000).selectExpr("id AS doc_id")
        p1 = shard_plan(docs, n_shards=8).collect()
        p2 = shard_plan(docs, n_shards=8).collect()
        assert sorted(map(tuple, p1)) == sorted(map(tuple, p2))
        by_shard = {}
        for r in p1:
            by_shard.setdefault(r["shard"], []).append(r["shard_rank"])
        assert set(by_shard) == set(range(8))
        # ranks are a contiguous 1..k permutation per shard
        for s, ranks in by_shard.items():
            assert sorted(ranks) == list(range(1, len(ranks) + 1))
        # md5 uniformity: no shard more than 2x the mean
        sizes = [len(v) for v in by_shard.values()]
        assert max(sizes) < 2 * (5000 / 8)

    def test_export_matches_plan_order(self, spark, tmp_path):
        import os

        from imitation_learning_data_pipeline_spark.plans.sampling import (
            export_shards,
            shard_plan,
        )

        docs = spark.range(0, 2000).selectExpr("id AS doc_id", "id * 2 AS val")
        out = str(tmp_path / "shards")
        export_shards(docs, out, n_shards=4)
        shard_dirs = sorted(d for d in os.listdir(out) if d.startswith("shard="))
        assert shard_dirs == [f"shard={i}" for i in range(4)]
        plan = shard_plan(docs.select("doc_id"), n_shards=4).collect()
        expect = {}
        for r in plan:
            expect.setdefault(r["shard"], []).append(
                (r["shard_rank"], r["doc_id"])
            )
        for s, pairs in expect.items():
            files = [
                f
                for f in os.listdir(os.path.join(out, f"shard={s}"))
                if f.endswith(".parquet")
            ]
            assert len(files) == 1  # one file per shard
            got = [
                r["doc_id"]
                for r in spark.read.parquet(
                    os.path.join(out, f"shard={s}", files[0])
                ).collect()
            ]
            want = [d for _, d in sorted(pairs)]
            assert got == want  # file row order == plan order
            # carried columns survive
        total = spark.read.parquet(out)
        assert total.count() == 2000
        assert set(total.columns) == {"doc_id", "val", "shard"}

    def test_reexport_is_byte_stable(self, spark, tmp_path):
        import hashlib
        import os

        from imitation_learning_data_pipeline_spark.plans.sampling import (
            export_shards,
        )

        docs = spark.range(0, 1000).selectExpr("id AS doc_id")

        def digest(root):
            out = {}
            for d in sorted(os.listdir(root)):
                if not d.startswith("shard="):
                    continue
                h = hashlib.md5()
                for f in sorted(os.listdir(os.path.join(root, d))):
                    if f.endswith(".parquet"):
                        with open(os.path.join(root, d, f), "rb") as fh:
                            h.update(fh.read())
                out[d] = h.hexdigest()
            return out

        a, b = str(tmp_path / "a"), str(tmp_path / "b")
        export_shards(docs, a, n_shards=4)
        export_shards(docs, b, n_shards=4)
        assert digest(a) == digest(b)


class TestZorderWrite:
    """Z-order layout: every file covers a small rectangle of the key
    space, so min/max footers prune on BOTH columns — vs cluster_write
    where the second column's per-file range is the full domain."""

    N = 40_000
    FILES = 16

    def _df(self, spark):
        from pyspark.sql import functions as F

        # two independent-ish uniform columns
        return spark.range(0, self.N).select(
            F.col("id"),
            (F.xxhash64(F.col("id")) % 10_000).alias("a"),
            (F.xxhash64(F.col("id"), F.lit(1)) % 10_000).alias("b"),
        )

    @staticmethod
    def _file_ranges(spark, path, col):
        import os

        out = []
        for f in sorted(os.listdir(path)):
            if f.endswith(".parquet") and not f.startswith(("_", ".")):
                row = (
                    spark.read.parquet(os.path.join(path, f))
                    .selectExpr(f"min({col}) AS lo", f"max({col}) AS hi")
                    .collect()[0]
                )
                out.append(row["hi"] - row["lo"])
        return out

    def test_both_columns_prune(self, spark, tmp_path):
        from imitation_learning_data_pipeline_spark.pipeline.merge import (
            cluster_write,
            zorder_write,
        )

        df = self._df(spark)
        zpath = str(tmp_path / "z")
        cpath = str(tmp_path / "c")
        zorder_write(df, zpath, by=["a", "b"], n_files=self.FILES)
        cluster_write(df, cpath, by="a", n_files=self.FILES)

        global_span = 20_000  # a, b ∈ (-10000, 10000)
        z_a = self._file_ranges(spark, zpath, "a")
        z_b = self._file_ranges(spark, zpath, "b")
        c_b = self._file_ranges(spark, cpath, "b")
        # z-order: 16 files ≈ 4×4 grid → per-file span ~1/4 of global
        # in BOTH dims (allow slack for quantile/edge effects)
        assert sum(z_a) / len(z_a) < 0.45 * global_span
        assert sum(z_b) / len(z_b) < 0.45 * global_span
        # single-column clustering: b spans ~the whole domain per file
        assert sum(c_b) / len(c_b) > 0.8 * global_span
        # nothing lost
        assert spark.read.parquet(zpath).count() == self.N

    def test_rejects_one_column_and_strings(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from imitation_learning_data_pipeline_spark.pipeline.merge import (
            zorder_write,
        )

        df = self._df(spark).withColumn("s", F.lit("x"))
        with pytest.raises(ValueError, match="2\\+ columns"):
            zorder_write(df, str(tmp_path / "x"), by=["a"], n_files=4)
        with pytest.raises(ValueError, match="non-numeric"):
            zorder_write(df, str(tmp_path / "y"), by=["a", "s"], n_files=4)


class TestClusteredMergeLocality:
    """r6 verdict item 6: lock in SCALING.md's layout claim — a
    contiguous-key-range MERGE touches ~all files of a hash-scattered
    layout but ~1 file of a cluster_write (range-clustered) layout."""

    N_ROWS = 10_000
    N_FILES = 20

    def _updates(self, spark):
        # contiguous key range 100..149 — the shape of a late-arriving
        # correction batch for one ingest window
        return spark.range(100, 150).selectExpr("id", "-id AS val")

    def test_touched_files_hash_vs_clustered(self, spark, tmp_path):
        from imitation_learning_data_pipeline_spark.pipeline.merge import (
            cluster_write,
            merge_into,
        )

        base = spark.range(0, self.N_ROWS).selectExpr("id", "id AS val")

        hashed = str(tmp_path / "hashed")
        base.repartition(self.N_FILES).write.parquet(hashed)
        clustered = str(tmp_path / "clustered")
        cluster_write(base, clustered, by="id", n_files=self.N_FILES)

        s_hash = merge_into(spark, hashed, self._updates(spark), key="id")
        s_clus = merge_into(spark, clustered, self._updates(spark), key="id")

        # hash layout scatters 50 contiguous keys across ~every file
        assert s_hash["files_touched"] >= self.N_FILES - 2
        # range-clustered layout: 50 contiguous keys of 10k over 20
        # files (~500 keys/file) live in 1 file (2 if straddling a cut)
        assert s_clus["files_touched"] <= 2
        assert s_hash["rows_matched"] == s_clus["rows_matched"] == 50

        # identical final content on both layouts
        expect = {(i, -i if 100 <= i < 150 else i) for i in range(self.N_ROWS)}
        for p in (hashed, clustered):
            got = {(r["id"], r["val"]) for r in spark.read.parquet(p).collect()}
            assert got == expect


class TestSketchProfileAccuracy:
    """r6 verdict item 7: stated error invariants for the mergeable
    profile — HLL relative error within 3·1.04/√(2^lgK) of exact, and
    merged per-batch profiles estimate EXACTLY like one whole-corpus
    profile (HLL register union is lossless for set union)."""

    # Spark's hll_sketch_agg default lgConfigK = 12
    _REL_ERR = 3 * 1.04 / (2 ** 12) ** 0.5

    def _corpus(self, spark):
        from pyspark.sql import functions as F

        return spark.range(0, 30_000).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 997).alias("bucket"),
            F.concat(F.lit("s"), (F.col("id") % 5000).cast("string")).alias("tag"),
        )

    def test_estimate_within_hll_error_bound(self, spark):
        from imitation_learning_data_pipeline_spark.plans.profile import (
            profile_estimates,
            profile_frame_sketch,
        )

        df = self._corpus(spark)
        est = {
            r["column_name"]: r
            for r in profile_estimates(
                profile_frame_sketch(df, ["doc_id", "bucket", "tag"])
            ).collect()
        }
        exact = {"doc_id": 30_000, "bucket": 997, "tag": 5000}
        for c, n in exact.items():
            rel = abs(est[c]["n_distinct_est"] - n) / n
            assert rel <= self._REL_ERR, f"{c}: rel err {rel:.4f} > bound"
        # counts and numeric extremes are exact, not estimated
        assert est["doc_id"]["n_rows"] == 30_000
        assert est["doc_id"]["min_val"] == "0"
        assert est["doc_id"]["max_val"] == "29999"

    def test_merged_batches_equal_whole_corpus(self, spark):
        from pyspark.sql import functions as F

        from imitation_learning_data_pipeline_spark.plans.profile import (
            merge_profiles,
            profile_estimates,
            profile_frame_sketch,
        )

        df = self._corpus(spark)
        cols = ["doc_id", "bucket", "tag"]
        whole = profile_estimates(
            merge_profiles(profile_frame_sketch(df, cols))
        ).collect()

        batches = [
            profile_frame_sketch(df.filter(F.col("doc_id") % 3 == i), cols)
            for i in range(3)
        ]
        unioned = batches[0].unionByName(batches[1]).unionByName(batches[2])
        merged = profile_estimates(merge_profiles(unioned)).collect()

        key = lambda rows: {
            r["column_name"]: (
                r["n_rows"], r["n_null"], r["n_distinct_est"],
                r["min_val"], r["max_val"],
            )
            for r in rows
        }
        assert key(merged) == key(whole)


def _cli(args):
    # in-process on the shared session (see conftest.run_cli) — a
    # fresh-interpreter subprocess per assertion re-paid ~20-25 s of
    # JVM startup + cold JIT without adding coverage
    from conftest import run_cli

    return run_cli(list(args))


class TestDedupCliStoreHardening:
    """ADVICE r6: explicit --batch-id (fixed-landing-path ingest), and
    legacy plain-layout stores are refused instead of corrupted."""

    def _docs(self, spark, path, ids_texts):
        spark.createDataFrame(ids_texts, ["doc_id", "text"]).write.mode(
            "overwrite"
        ).parquet(path)

    def test_legacy_layout_store_is_refused(self, spark, tmp_path):
        from imitation_learning_data_pipeline_spark.plans.dedup import (
            write_minhash_store,
        )

        store = str(tmp_path / "legacy_store")
        batch = str(tmp_path / "b1")
        text = "the quick brown fox jumps over the lazy dog " * 5
        self._docs(spark, batch, [(1, text), (2, text + " tail")])
        # legacy plain-append layout: no ingest_batch level
        docs = spark.read.parquet(batch)
        write_minhash_store(docs, store)
        r = _cli(
            [
                "dedup", "--input", batch, "--out", str(tmp_path / "out"),
                "--store", store, "--fold-into-store",
            ]
        )
        assert r.returncode != 0
        assert "legacy" in r.stderr and "ingest_batch" in r.stderr

    def test_explicit_batch_id_keeps_both_batches(self, spark, tmp_path):
        """Fixed landing path, two successive batches: without
        --batch-id the second fold would replace the first's state;
        with distinct ids both ingest_batch partitions survive."""
        import os

        landing = str(tmp_path / "landing")
        store = str(tmp_path / "store")
        t1 = "alpha beta gamma delta epsilon zeta eta theta " * 4
        t2 = "one two three four five six seven eight nine ten " * 4
        self._docs(spark, landing, [(1, t1), (2, t1 + " x")])
        r1 = _cli(
            [
                "dedup", "--input", landing, "--out", str(tmp_path / "o1"),
                "--store", store, "--fold-into-store", "--batch-id", "1",
            ]
        )
        assert r1.returncode == 0, r1.stderr[-2000:]
        # same path, NEW content — the documented foot-gun
        self._docs(spark, landing, [(3, t2), (4, t2 + " y")])
        r2 = _cli(
            [
                "dedup", "--input", landing, "--out", str(tmp_path / "o2"),
                "--store", store, "--fold-into-store", "--batch-id", "2",
            ]
        )
        assert r2.returncode == 0, r2.stderr[-2000:]
        parts = {
            d for d in os.listdir(f"{store}/sets") if d.startswith("ingest_batch=")
        }
        assert parts == {"ingest_batch=1", "ingest_batch=2"}
        # both batches' signatures visible to a third run
        sets = spark.read.parquet(f"{store}/sets")
        assert {r["doc_id"] for r in sets.select("doc_id").collect()} == {1, 2, 3, 4}


class TestTrajectoryTsColCli:
    def test_non_timestamp_order_leader_is_rejected(self, spark, tmp_path):
        ev = str(tmp_path / "ev")
        spark.createDataFrame(
            [(1, 10, 1.0, "a"), (1, 20, 2.0, "b")],
            ["user_id", "seq", "value", "event_type"],
        ).write.parquet(ev)
        r = _cli(
            [
                "trajectory", "--events", ev, "--out", str(tmp_path / "o"),
                "--order-by", "seq", "--features", "--length", "2",
                "--stride", "1",
            ]
        )
        assert r.returncode != 0
        assert "--ts-col" in r.stderr and "timestamp" in r.stderr

    def test_explicit_ts_col_over_non_ts_order(self, spark, tmp_path):
        import os

        from pyspark.sql import functions as F

        ev = str(tmp_path / "ev2")
        (
            spark.range(0, 20)
            .select(
                F.lit(1).alias("user_id"),
                F.col("id").alias("seq"),
                (F.col("id") * 1.0).alias("value"),
                F.lit("a").alias("event_type"),
                F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id")).alias("ts"),
            )
            .write.parquet(ev)
        )
        r = _cli(
            [
                "trajectory", "--events", ev, "--out", str(tmp_path / "o2"),
                "--order-by", "seq", "--ts-col", "ts", "--features",
                "--length", "4", "--stride", "2",
            ]
        )
        assert r.returncode == 0, r.stderr[-2000:]
        assert os.path.isdir(str(tmp_path / "o2" / "features"))


class TestShardsCli:
    def test_shards_roundtrip(self, spark, tmp_path):
        import json
        import os

        src = str(tmp_path / "src")
        out = str(tmp_path / "out")
        spark.range(0, 500).selectExpr("id AS doc_id", "id AS v").write.parquet(src)
        r = _cli(
            ["shards", "--input", src, "--out", out, "--n-shards", "4"]
        )
        assert r.returncode == 0, r.stderr[-2000:]
        stats = json.loads(r.stdout.strip().splitlines()[-1])
        assert stats["rows"] == 500
        dirs = sorted(d for d in os.listdir(out) if d.startswith("shard="))
        assert dirs == [f"shard={i}" for i in range(4)]

    def test_bad_id_col_rejected(self, spark, tmp_path):
        src = str(tmp_path / "s2")
        spark.range(0, 10).write.parquet(src)
        r = _cli(
            ["shards", "--input", src, "--out", str(tmp_path / "o2")]
        )
        assert r.returncode != 0
        assert "--id-col" in r.stderr


class TestExpectCli:
    def test_gate_pass_and_fail(self, spark, tmp_path):
        import json

        src = str(tmp_path / "d")
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, None)], "id long, name string"
        ).write.parquet(src)
        rules = tmp_path / "rules.json"
        rules.write_text(
            json.dumps(
                {"id_positive": "id > 0", "name_not_null": "name IS NOT NULL"}
            )
        )
        # report mode: exit 0 even with violations
        r = _cli(["expect", "--path", src, "--rules", str(rules)])
        assert r.returncode == 0, r.stderr[-2000:]
        lines = [json.loads(ln) for ln in r.stdout.strip().splitlines()]
        summary = lines[-1]
        assert summary["failed"] == 1
        by_rule = {d["rule"]: d for d in lines[:-1]}
        assert by_rule["id_positive"]["pass"] is True
        assert by_rule["name_not_null"]["n_violations"] == 1
        # gate mode: violations exit non-zero
        r2 = _cli(
            ["expect", "--path", src, "--rules", str(rules), "--fail-on-violation"]
        )
        assert r2.returncode == 1

    def test_malformed_rules_rejected(self, spark, tmp_path):
        import json

        src = str(tmp_path / "d2")
        spark.range(0, 3).write.parquet(src)
        rules = tmp_path / "bad.json"
        rules.write_text(json.dumps(["not", "a", "dict"]))
        r = _cli(["expect", "--path", src, "--rules", str(rules)])
        assert r.returncode != 0
        assert "JSON object" in r.stderr


class TestExpectGateOrchestration:
    def test_gate_task_wiring(self):
        from imitation_learning_data_pipeline_spark.cli import build_parser
        from imitation_learning_data_pipeline_spark.orchestration import (
            pipeline_tasks,
        )

        tasks = {
            t.task_id: t
            for t in pipeline_tasks(
                "/d", "/w", maintenance=True, expectations_rules="/w/rules.json"
            )
        }
        gate = tasks["expect_gate"]
        assert gate.upstream == ("materialize",)
        assert "--fail-on-violation" in gate.argv
        assert gate.ok_codes == (0,)  # a failing gate FAILS the task
        # compact moves downstream of the gate when one is configured
        assert tasks["compact"].upstream == ("expect_gate",)
        # without a gate, compact hangs off materialize as before
        no_gate = {
            t.task_id: t for t in pipeline_tasks("/d", "/w", maintenance=True)
        }
        assert "expect_gate" not in no_gate
        assert no_gate["compact"].upstream == ("materialize",)
        # gate argv parses against the real CLI tree
        parser = build_parser()
        ns = parser.parse_args(list(gate.argv))
        assert callable(ns.fn)

    def test_failing_gate_blocks_compact(self):
        from imitation_learning_data_pipeline_spark.orchestration import (
            pipeline_tasks,
            run_pipeline,
        )

        calls = []

        def runner(argv):
            calls.append(argv[0])
            return 1 if argv[0] == "expect" else 0

        result = run_pipeline(
            "/d",
            "/w",
            runner=runner,
            maintenance=True,
            expectations_rules="/w/rules.json",
            retry_delay_override_s=0,
        )
        assert result.ok is False
        assert result.statuses["expect_gate"] == "failed"
        assert result.statuses["compact"] == "upstream_failed"
        assert "compact" not in calls


class TestDriftCli:
    def test_drift_gate(self, spark, tmp_path):
        import json

        from pyspark.sql import functions as F

        base = str(tmp_path / "base")
        cur = str(tmp_path / "cur")
        spark.range(0, 5000).select(
            F.col("id").alias("k"), (F.col("id") % 100).alias("cat")
        ).write.parquet(base)
        # cat collapses to 2 values → drift
        spark.range(0, 5000).select(
            F.col("id").alias("k"), (F.col("id") % 2).alias("cat")
        ).write.parquet(cur)
        r = _cli(["drift", "--base", base, "--current", cur])
        assert r.returncode == 0, r.stderr[-2000:]
        lines = [json.loads(ln) for ln in r.stdout.strip().splitlines()]
        assert lines[-1]["drifted"] == 1
        by_col = {d["column_name"]: d for d in lines[:-1]}
        assert by_col["cat"]["drifted"] is True
        assert by_col["k"]["drifted"] is False
        r2 = _cli(
            ["drift", "--base", base, "--current", cur, "--fail-on-drift"]
        )
        assert r2.returncode == 1
        # identical datasets: clean report, exit 0 even with the gate
        r3 = _cli(
            ["drift", "--base", base, "--current", base, "--fail-on-drift"]
        )
        assert r3.returncode == 0, r3.stderr[-2000:]


class TestRecoverCli:
    def test_recover_verb_completes_journal(self, spark, tmp_path):
        import json
        import os

        p = str(tmp_path / "rc")
        spark.range(0, 40).selectExpr("id", "id AS val").repartition(
            2
        ).write.parquet(p)
        files = sorted(
            f
            for f in os.listdir(p)
            if f.endswith(".parquet") and not f.startswith("_")
        )
        victim = os.path.join(p, files[0])
        victim_rows = {
            (r["id"], r["val"]) for r in spark.read.parquet(victim).collect()
        }
        tmp = p + "__merge_tmp"
        spark.createDataFrame(
            sorted(victim_rows), ["id", "val"]
        ).coalesce(1).write.parquet(tmp)
        staged = next(
            f
            for f in os.listdir(tmp)
            if f.endswith(".parquet") and not f.startswith("_")
        )
        with open(os.path.join(p, "__merge_pending.json"), "w") as fh:
            json.dump({"add": [staged], "delete": [victim]}, fh)
        r = _cli(["recover", "--path", p])
        assert r.returncode == 0, r.stderr[-2000:]
        out = json.loads(r.stdout.strip().splitlines()[-1])
        assert out["journal_completed"] is True
        assert spark.read.parquet(p).count() == 40
        assert not os.path.exists(os.path.join(p, "__merge_pending.json"))
