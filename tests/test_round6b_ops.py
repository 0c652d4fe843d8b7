"""Round-6 session-2 operators: trajectory windowing, reservoir
sampling, mixture token budgeting, column profiling."""

from __future__ import annotations

from conftest import SF_DIR


class TestTrajectoryWindows:
    def test_constant_shape_and_window_count(self, spark):
        """Every emitted window has exactly L rows at positions 0..L-1,
        and each user yields floor((n-L)/S)+1 windows (0 if n < L)."""
        from imitation_learning_data_pipeline_spark.plans.trajectory import (
            _L,
            _S,
            trajectory_windows,
        )
        from imitation_learning_data_pipeline_spark.sources import load_table

        out = trajectory_windows(spark, SF_DIR).cache()
        shapes = (
            out.groupBy("user_id", "window_id")
            .count()
            .select("count")
            .distinct()
            .collect()
        )
        assert [r["count"] for r in shapes] == [_L]

        from pyspark.sql import functions as F

        per_user_windows = {
            r["user_id"]: r["n_w"]
            for r in out.groupBy("user_id")
            .agg(F.countDistinct("window_id").alias("n_w"))
            .collect()
        }
        per_user_events = {
            r["user_id"]: r["n"]
            for r in load_table(spark, SF_DIR, "events")
            .groupBy("user_id")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        for uid, n in per_user_events.items():
            expect = (n - _L) // _S + 1 if n >= _L else 0
            assert per_user_windows.get(uid, 0) == expect, uid
        out.unpersist()

    def test_positions_are_contiguous_slices(self, spark):
        """Window w's events are exactly trajectory steps
        [w*S, w*S+L): reconstructing idx = w*S + pos from two adjacent
        windows gives the same event_id for overlapping steps."""
        from pyspark.sql import functions as F

        from imitation_learning_data_pipeline_spark.plans.trajectory import (
            _S,
            trajectory_windows,
        )

        out = trajectory_windows(spark, SF_DIR).withColumn(
            "idx", F.col("window_id") * _S + F.col("pos")
        )
        # one event per (user, trajectory step): overlapping windows must
        # agree on which event sits at each step
        conflicting = (
            out.groupBy("user_id", "idx")
            .agg(F.countDistinct("event_id").alias("n_ids"))
            .filter(F.col("n_ids") > 1)
            .count()
        )
        assert conflicting == 0


class TestReservoirSample:
    def test_exact_k_per_group(self, spark):
        from pyspark.sql import functions as F

        from imitation_learning_data_pipeline_spark.plans.sampling import (
            _RESV_K,
            sample_reservoir_pergroup,
        )
        from imitation_learning_data_pipeline_spark.sources import load_table

        out = sample_reservoir_pergroup(spark, SF_DIR).cache()
        n_l = {
            r["lang"]: r["n"]
            for r in load_table(spark, SF_DIR, "documents")
            .groupBy("lang")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        got = {
            r["lang"]: r["n"]
            for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
        }
        for lang, n in n_l.items():
            # prefilter keeps everything when n <= safety*k, so the
            # sample is exactly min(k, n) at test scale
            assert got.get(lang, 0) == min(_RESV_K, n), lang
        ranks = out.groupBy("lang").agg(F.max("sample_rank").alias("mx")).collect()
        for r in ranks:
            assert r["mx"] <= _RESV_K
        out.unpersist()

    def test_membership_is_stable_under_growth(self, spark, tmp_path):
        """Seeded-hash reservoirs re-rank but never re-hash: a doc's u
        is a pure function of doc_id, so the sample drifts only where
        new docs out-rank old ones (property, not partition luck)."""
        a = {
            (r["lang"], r["doc_id"])
            for r in __import__(
                "imitation_learning_data_pipeline_spark.plans.sampling",
                fromlist=["sample_reservoir_pergroup"],
            ).sample_reservoir_pergroup(spark, SF_DIR).collect()
        }
        b = {
            (r["lang"], r["doc_id"])
            for r in __import__(
                "imitation_learning_data_pipeline_spark.plans.sampling",
                fromlist=["sample_reservoir_pergroup"],
            ).sample_reservoir_pergroup(spark, SF_DIR).collect()
        }
        assert a == b


class TestMixtureTokenBudget:
    def test_epoch_cap_and_budget_identity(self, spark):
        from imitation_learning_data_pipeline_spark.plans.sampling import (
            _MAX_EPOCHS,
            mixture_token_budget,
        )

        rows = mixture_token_budget(spark, SF_DIR).collect()
        assert rows
        total = sum(r["n_tokens"] for r in rows)
        k = len(rows)
        share = total / k
        for r in rows:
            assert 0 < r["epochs_milli"] <= int(_MAX_EPOCHS * 1000)
            # planned = min(cap*n_tokens, equal share), up to rounding
            expect = min(_MAX_EPOCHS * r["n_tokens"], share)
            assert abs(r["planned_tokens"] - expect) <= 1, r
            # a source never contributes more than its repeat cap allows
            assert r["planned_tokens"] <= _MAX_EPOCHS * r["n_tokens"] + 1


class TestProfileDocuments:
    def test_documents_profile_invariants(self, spark):
        rows = {
            r["column_name"]: r
            for r in __import__(
                "imitation_learning_data_pipeline_spark.plans.profile",
                fromlist=["profile_documents"],
            ).profile_documents(spark, SF_DIR).collect()
        }
        n_rows = {r["n_rows"] for r in rows.values()}
        assert len(n_rows) == 1
        (n,) = n_rows
        doc = rows["doc_id"]
        assert doc["n_null"] == 0 and doc["n_distinct"] == n  # key candidate
        for r in rows.values():
            assert r["n_distinct"] + r["n_null"] <= n + (1 if r["n_null"] else 0)
            assert len(r["min_val"]) <= 32 and len(r["max_val"]) <= 32

    def test_profile_frame_exact_on_synthetic(self, spark):
        from imitation_learning_data_pipeline_spark.plans.profile import profile_frame

        df = spark.createDataFrame(
            [(1, "aa"), (2, None), (3, "zz"), (4, "aa")], ["k", "v"]
        )
        got = {r["column_name"]: r for r in profile_frame(df, ["k", "v"]).collect()}
        assert got["k"]["n_null"] == 0
        assert got["k"]["n_distinct"] == 4
        assert got["k"]["min_val"] == "1" and got["k"]["max_val"] == "4"
        assert got["v"]["n_null"] == 1
        assert got["v"]["n_distinct"] == 2
        assert got["v"]["min_val"] == "aa" and got["v"]["max_val"] == "zz"

    def test_profile_frame_approx_mode_drops_expand(self, spark):
        """exact_distinct=False must swap count_distinct for
        approx_count_distinct — no Expand node in the plan."""
        from imitation_learning_data_pipeline_spark.plans.profile import profile_frame

        df = spark.range(100).selectExpr("id AS k", "CAST(id % 7 AS STRING) AS v")
        plan = (
            profile_frame(df, ["k", "v"], exact_distinct=False)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Expand" not in plan
        exact_plan = (
            profile_frame(df, ["k", "v"], exact_distinct=True)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Expand" in exact_plan


class TestMergeInto:
    @staticmethod
    def _files(d: str) -> dict[str, int]:
        import os

        out = {}
        for root, _, names in os.walk(d):
            for n in names:
                if n.endswith(".parquet") and not n.startswith(("_", ".")):
                    p = os.path.join(root, n)
                    out[os.path.relpath(p, d)] = os.path.getsize(p)
        return out

    def test_unpartitioned_merge_rewrites_only_touched_files(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from imitation_learning_data_pipeline_spark.pipeline.merge import merge_into

        p = str(tmp_path / "t")
        (
            spark.range(0, 1000)
            .withColumn("val", F.sha2(F.col("id").cast("string"), 256))
            .repartition(10)
            .write.parquet(p)
        )
        before = self._files(p)
        assert len(before) == 10

        upd = spark.createDataFrame(
            [(5, "five"), (17, "seventeen"), (2000, "new-a"), (2001, "new-b")],
            ["id", "val"],
        )
        stats = merge_into(spark, p, upd, key="id")
        assert stats["rows_matched"] == 2
        assert stats["rows_inserted"] == 2
        # the two matched ids live in <= 2 of the 10 files
        assert 1 <= stats["files_touched"] <= 2

        after = self._files(p)
        untouched_before = {
            k: v for k, v in before.items() if k in after
        }
        # every surviving original file is byte-identical in size
        assert untouched_before == {k: after[k] for k in untouched_before}
        assert len(before) - stats["files_touched"] == len(untouched_before)

        got = {(r["id"], r["val"]) for r in spark.read.parquet(p).collect()}
        import hashlib

        expect = {
            (i, hashlib.sha256(str(i).encode()).hexdigest())
            for i in range(1000)
            if i not in (5, 17)
        } | {(5, "five"), (17, "seventeen"), (2000, "new-a"), (2001, "new-b")}
        assert got == expect

    def test_partitioned_merge_preserves_partition_routing(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from imitation_learning_data_pipeline_spark.pipeline.merge import merge_into

        p = str(tmp_path / "pt")
        (
            spark.range(0, 200)
            .withColumn("part", F.when(F.col("id") % 2 == 0, "even").otherwise("odd"))
            .withColumn("val", F.col("id").cast("string"))
            .repartition(4)
            .write.partitionBy("part")
            .parquet(p)
        )
        upd = spark.createDataFrame(
            [(10, "even", "updated"), (9999, "odd", "inserted")],
            ["id", "part", "val"],
        )
        stats = merge_into(spark, p, upd, key="id", partition_by=["part"])
        assert stats["rows_matched"] == 1 and stats["rows_inserted"] == 1

        df = spark.read.parquet(p)
        got = {(r["id"], r["part"], r["val"]) for r in df.collect()}
        assert (10, "even", "updated") in got
        assert (9999, "odd", "inserted") in got
        assert (10, "even", "10") not in got
        assert len(got) == 201
        # partition routing survived the file-level moves
        evens = {r["part"] for r in df.filter(F.col("id") % 2 == 0).collect()}
        assert evens == {"even"}

    def test_all_new_keys_is_pure_append(self, spark, tmp_path):
        from imitation_learning_data_pipeline_spark.pipeline.merge import merge_into

        p = str(tmp_path / "ap")
        spark.range(0, 100).selectExpr("id", "id * 2 AS val").write.parquet(p)
        before = self._files(p)
        upd = spark.createDataFrame([(500, 1000), (501, 1002)], ["id", "val"])
        stats = merge_into(spark, p, upd, key="id")
        assert stats["files_touched"] == 0
        assert stats["rows_matched"] == 0 and stats["rows_inserted"] == 2
        after = self._files(p)
        assert set(before) <= set(after)  # originals untouched
        assert spark.read.parquet(p).count() == 102

    def test_rerun_converges(self, spark, tmp_path):
        from imitation_learning_data_pipeline_spark.pipeline.merge import merge_into

        p = str(tmp_path / "re")
        spark.range(0, 100).selectExpr("id", "id * 2 AS val").write.parquet(p)
        upd = spark.createDataFrame([(7, -1), (300, -3)], ["id", "val"])
        merge_into(spark, p, upd, key="id")
        first = {(r["id"], r["val"]) for r in spark.read.parquet(p).collect()}
        stats = merge_into(spark, p, upd, key="id")
        # retry replaces the same keys again, inserts nothing new
        assert stats["rows_matched"] == 2 and stats["rows_inserted"] == 0
        second = {(r["id"], r["val"]) for r in spark.read.parquet(p).collect()}
        assert first == second == {
            (i, i * 2) for i in range(100) if i != 7
        } | {(7, -1), (300, -3)}


class TestMergeCli:
    def test_cli_merge_roundtrip(self, tmp_path, spark):
        import json

        from conftest import run_cli

        p = str(tmp_path / "cli_t")
        u = str(tmp_path / "cli_u")
        spark.range(0, 50).selectExpr("id", "id AS val").write.parquet(p)
        spark.createDataFrame([(3, -3), (99, -99)], ["id", "val"]).write.parquet(u)
        r = run_cli(["merge", "--path", p, "--updates", u, "--key", "id"])
        assert r.returncode == 0, r.stderr[-2000:]
        stats = json.loads(r.stdout.strip().splitlines()[-1])
        assert stats["rows_matched"] == 1 and stats["rows_inserted"] == 1
        got = {(x["id"], x["val"]) for x in spark.read.parquet(p).collect()}
        assert (3, -3) in got and (99, -99) in got and len(got) == 51


class TestStreamingTrajectoryWindows:
    """applyInPandasWithState trajectory slicer: emits each completed
    window exactly once across checkpointed arrivals, matching the
    batch operator on the full event prefix."""

    def test_two_arrivals_match_batch_operator(self, spark, tmp_path):
        import pandas as pd
        from pyspark.sql import types as T

        from imitation_learning_data_pipeline_spark.streaming.incremental import (
            streaming_trajectory_windows,
        )

        ingest = tmp_path / "in"
        ingest.mkdir()
        ckpt = str(tmp_path / "ckpt")
        sink = str(tmp_path / "sink")
        schema = T.StructType(
            [
                T.StructField("user_id", T.LongType()),
                T.StructField("ts", T.TimestampType()),
                T.StructField("event_id", T.LongType()),
                T.StructField("event_type", T.StringType()),
            ]
        )

        def _mk(rows):
            df = pd.DataFrame(
                rows, columns=["user_id", "ts_s", "event_id", "event_type"]
            )
            df["ts"] = pd.to_datetime(df.pop("ts_s"), unit="s", utc=True)
            return df[["user_id", "ts", "event_id", "event_type"]]

        def _run():
            stream = spark.readStream.schema(schema).parquet(str(ingest))
            out = streaming_trajectory_windows(stream, length=4, stride=2)
            q = (
                out.writeStream.foreachBatch(
                    lambda df, bid: df.write.mode("append").parquet(sink)
                )
                .outputMode("append")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        # arrival 1: user 1 has 5 events (windows 0 complete), user 2 has 3
        rows1 = [(1, t, 100 + t, f"e{t}") for t in range(5)] + [
            (2, t, 200 + t, f"f{t}") for t in range(3)
        ]
        _mk(rows1).to_parquet(
            ingest / "b1.parquet", index=False, coerce_timestamps="us"
        )
        _run()
        got1 = {
            (r["user_id"], r["window_id"], r["pos"], r["event_id"])
            for r in spark.read.parquet(sink).collect()
        }
        # user 1: window 0 covers idx 0..3 — complete. window 1 needs idx 2..5.
        assert (1, 0, 0, 100) in got1 and (1, 0, 3, 103) in got1
        assert not any(u == 2 for (u, _, _, _) in got1)

        # arrival 2: user 1 +3 events (windows 1,2 complete), user 2 +2
        # (window 0 completes from events spanning BOTH arrivals)
        rows2 = [(1, t, 100 + t, f"e{t}") for t in range(5, 8)] + [
            (2, t, 200 + t, f"f{t}") for t in range(3, 5)
        ]
        _mk(rows2).to_parquet(
            ingest / "b2.parquet", index=False, coerce_timestamps="us"
        )
        _run()

        got = spark.read.parquet(sink)
        # cross-arrival window: user 2's window 0 mixes events from both files
        u2 = {
            (r["pos"], r["event_id"])
            for r in got.filter("user_id = 2 AND window_id = 0").collect()
        }
        assert u2 == {(0, 200), (1, 201), (2, 202), (3, 203)}

        # exactly-once: no duplicate (user, window, pos) rows
        assert (
            got.groupBy("user_id", "window_id", "pos").count().filter("count > 1").count()
            == 0
        )

        # parity with the batch operator at L=4,S=2 on the full prefix
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        all_events = spark.createDataFrame(_mk(rows1 + rows2), schema)
        per = Window.partitionBy("user_id").orderBy("ts", "event_id")
        whole = Window.partitionBy("user_id")
        base = all_events.select(
            "user_id",
            "event_id",
            (F.row_number().over(per) - 1).alias("idx"),
            F.count("*").over(whole).alias("n"),
        )
        L_, S_ = 4, 2
        lo = F.greatest(
            F.lit(0).cast("long"),
            F.floor((F.col("idx") - L_ + S_) / F.lit(float(S_))).cast("long"),
        )
        hi = F.floor(F.col("idx") / F.lit(float(S_))).cast("long")
        expect = {
            (r["user_id"], r["window_id"], r["idx"] - r["window_id"] * S_, r["event_id"])
            for r in base.select(
                "user_id", "event_id", "idx", "n",
                F.explode(F.sequence(lo, hi)).alias("window_id"),
            )
            .filter(F.col("window_id") * S_ + L_ <= F.col("n"))
            .collect()
        }
        got_set = {
            (r["user_id"], r["window_id"], r["pos"], r["event_id"])
            for r in got.collect()
        }
        assert got_set == expect


class TestLeakageSafeSplit:
    def test_near_dups_share_a_split(self, spark):
        from pyspark.sql import functions as F

        from imitation_learning_data_pipeline_spark.plans.sampling import (
            split_leakage_safe,
        )

        out = split_leakage_safe(spark, SF_DIR).cache()
        # every split_key (cluster canonical or singleton id) maps to ONE split
        assert (
            out.groupBy("split_key")
            .agg(F.countDistinct("split").alias("n"))
            .filter("n > 1")
            .count()
            == 0
        )
        # the corpus's planted near-dups (doc_id + 1_000_000 = upper-cased
        # copy) must sit in the same split as their originals
        planted = out.filter(F.col("doc_id") >= 1_000_000).filter(
            F.col("doc_id") < 2_000_000
        )
        pairs = planted.select(
            (F.col("doc_id") - 1_000_000).alias("doc_id"),
            F.col("split").alias("planted_split"),
        ).join(out.select("doc_id", "split"), "doc_id")
        mismatched = pairs.filter(F.col("split") != F.col("planted_split")).count()
        n_planted = planted.count()
        assert n_planted > 0 and mismatched == 0
        # all three splits are populated at this corpus size
        assert {r["split"] for r in out.select("split").distinct().collect()} == {
            "train",
            "val",
            "test",
        }
        out.unpersist()


class TestMergeableProfiles:
    def test_two_batch_fold_matches_whole(self, spark):
        from imitation_learning_data_pipeline_spark.plans.profile import (
            merge_profiles,
            profile_estimates,
            profile_frame,
            profile_frame_sketch,
        )

        whole = spark.range(0, 5000).selectExpr(
            "id", "CAST(id % 137 AS STRING) AS cat", "IF(id % 10 = 0, NULL, id) AS v"
        )
        b1 = whole.filter("id < 3000")
        b2 = whole.filter("id >= 3000")
        cols = ["id", "cat", "v"]
        folded = merge_profiles(
            profile_frame_sketch(b1, cols).unionByName(profile_frame_sketch(b2, cols))
        )
        got = {r["column_name"]: r for r in profile_estimates(folded).collect()}
        exact = {r["column_name"]: r for r in profile_frame(whole, cols).collect()}
        for c in cols:
            assert got[c]["n_rows"] == 5000
            assert got[c]["n_null"] == exact[c]["n_null"]
            assert got[c]["min_val"] == exact[c]["min_val"]
            assert got[c]["max_val"] == exact[c]["max_val"]
            # HLL at default lgConfigK=12: ~2% relative error
            err = abs(got[c]["n_distinct_est"] - exact[c]["n_distinct"]) / max(
                1, exact[c]["n_distinct"]
            )
            assert err < 0.05, (c, got[c]["n_distinct_est"], exact[c]["n_distinct"])

    def test_fold_is_order_insensitive(self, spark):
        from imitation_learning_data_pipeline_spark.plans.profile import (
            merge_profiles,
            profile_estimates,
            profile_frame_sketch,
        )

        a = spark.range(0, 1000).selectExpr("id", "CAST(id AS STRING) AS s")
        b = spark.range(500, 1500).selectExpr("id", "CAST(id AS STRING) AS s")
        cols = ["id", "s"]
        ab = profile_estimates(
            merge_profiles(
                profile_frame_sketch(a, cols).unionByName(profile_frame_sketch(b, cols))
            )
        ).collect()
        ba = profile_estimates(
            merge_profiles(
                profile_frame_sketch(b, cols).unionByName(profile_frame_sketch(a, cols))
            )
        ).collect()
        key = lambda rows: {
            r["column_name"]: (r["n_rows"], r["n_null"], r["n_distinct_est"]) for r in rows
        }
        assert key(ab) == key(ba)
        # overlap dedups through the union: estimate ~1500, not 2000
        est = key(ab)["id"][2]
        assert abs(est - 1500) / 1500 < 0.05


class TestTrajectoryFeatures:
    def test_feature_invariants(self, spark):
        from imitation_learning_data_pipeline_spark.plans.trajectory import (
            _L,
            trajectory_features,
            trajectory_windows,
        )

        feats = trajectory_features(spark, SF_DIR).collect()
        assert feats
        for r in feats:
            assert r["n_events"] == _L  # full windows only
            assert r["min_value"] <= r["max_value"]
            assert (
                round(r["min_value"] * 10000) <= r["mean_value_e4"] <= round(r["max_value"] * 10000)
            )
            assert r["span_ms"] >= 0
            assert 1 <= r["n_types"] <= _L
        # one feature row per emitted window
        n_windows = (
            trajectory_windows(spark, SF_DIR)
            .select("user_id", "window_id")
            .distinct()
            .count()
        )
        assert len(feats) == n_windows


class TestProfileCli:
    # deliberately the suite's ONE remaining `python -m ...cli`
    # subprocess (module-entry smoke); every other CLI assertion runs
    # in-process via conftest.run_cli (r16 — suite-wall fix, VERDICT
    # r15 #6)
    def test_cli_profile_outputs_one_line_per_column(self, tmp_path, spark):
        import json
        import subprocess
        import sys

        p = str(tmp_path / "prof_t")
        spark.range(0, 200).selectExpr(
            "id", "IF(id % 4 = 0, NULL, CAST(id % 9 AS STRING)) AS c"
        ).write.parquet(p)
        r = subprocess.run(
            [
                sys.executable,
                "-m",
                "imitation_learning_data_pipeline_spark.cli",
                "profile",
                "--path",
                p,
            ],
            capture_output=True,
            text=True,
            cwd="/root/repo",
        )
        assert r.returncode == 0, r.stderr[-2000:]
        lines = [json.loads(x) for x in r.stdout.strip().splitlines() if x.startswith("{")]
        by_col = {x["column_name"]: x for x in lines}
        assert set(by_col) == {"id", "c"}
        assert by_col["id"]["n_distinct"] == 200 and by_col["id"]["n_null"] == 0
        assert by_col["c"]["n_null"] == 50 and by_col["c"]["n_distinct"] == 9


class TestStreamingIncrementalProfile:
    def test_profile_store_folds_across_arrivals(self, spark, tmp_path):
        import pandas as pd
        from pyspark.sql import types as T

        from imitation_learning_data_pipeline_spark.plans.profile import profile_frame
        from imitation_learning_data_pipeline_spark.streaming.incremental import (
            read_profile_store,
            run_incremental_profile_stream,
        )

        ingest = tmp_path / "in"
        ingest.mkdir()
        store = str(tmp_path / "store")
        ckpt = str(tmp_path / "ckpt")
        schema = T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("cat", T.StringType()),
            ]
        )

        def _run():
            stream = spark.readStream.schema(schema).parquet(str(ingest))
            run_incremental_profile_stream(stream, ["id", "cat"], store, ckpt)

        pd.DataFrame(
            {"id": range(0, 2000), "cat": [str(i % 50) for i in range(2000)]}
        ).to_parquet(ingest / "b1.parquet", index=False)
        _run()
        p1 = {r["column_name"]: r for r in read_profile_store(spark, store).collect()}
        assert p1["id"]["n_rows"] == 2000
        assert abs(p1["id"]["n_distinct_est"] - 2000) / 2000 < 0.05

        # arrival 2 overlaps 1000 ids: distinct grows to 3000, rows to 4000
        pd.DataFrame(
            {"id": range(1000, 3000), "cat": [str(i % 80) for i in range(2000)]}
        ).to_parquet(ingest / "b2.parquet", index=False)
        _run()
        p2 = {r["column_name"]: r for r in read_profile_store(spark, store).collect()}
        assert p2["id"]["n_rows"] == 4000
        assert abs(p2["id"]["n_distinct_est"] - 3000) / 3000 < 0.05
        assert p2["cat"]["n_distinct_est"] == 80 or abs(p2["cat"]["n_distinct_est"] - 80) <= 3

        # replay with no new data: store unchanged (exactly-once fold)
        _run()
        p3 = {r["column_name"]: r for r in read_profile_store(spark, store).collect()}
        assert p3["id"]["n_rows"] == 4000

        # the folded estimate tracks the exact whole-corpus profile
        whole = spark.createDataFrame(
            pd.concat(
                [
                    pd.DataFrame({"id": range(0, 2000), "cat": [str(i % 50) for i in range(2000)]}),
                    pd.DataFrame({"id": range(1000, 3000), "cat": [str(i % 80) for i in range(2000)]}),
                ]
            ),
            schema,
        )
        exact = {r["column_name"]: r for r in profile_frame(whole, ["id", "cat"]).collect()}
        assert p3["id"]["min_val"] == exact["id"]["min_val"]
        assert p3["id"]["max_val"] == exact["id"]["max_val"]
        assert p3["cat"]["n_null"] == exact["cat"]["n_null"] == 0


class TestClusterWrite:
    def test_files_cover_disjoint_ranges_and_merge_touches_one(self, spark, tmp_path):
        import pyarrow.parquet as pq
        import os

        from imitation_learning_data_pipeline_spark.pipeline.merge import (
            cluster_write,
            merge_into,
        )

        p = str(tmp_path / "cl")
        df = spark.range(0, 100_000).selectExpr("id", "sha2(string(id), 256) AS val")
        cluster_write(df, p, by="id", n_files=20)

        # per-file id ranges from parquet footer stats must be disjoint
        ranges = []
        for root, _, names in os.walk(p):
            for n in names:
                if not n.endswith(".parquet") or n.startswith(("_", ".")):
                    continue
                md = pq.ParquetFile(os.path.join(root, n)).metadata
                mins, maxs = [], []
                for rg in range(md.num_row_groups):
                    col = md.row_group(rg).column(0)
                    mins.append(col.statistics.min)
                    maxs.append(col.statistics.max)
                ranges.append((min(mins), max(maxs)))
        ranges.sort()
        assert len(ranges) == 20
        for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
            assert hi1 < lo2  # disjoint, ordered key ranges

        # a contiguous-key merge now touches ~1 file, not ~k.
        # repartitionByRange SAMPLES its cut points, so a 20-key run can
        # land exactly on a file boundary — allow the straddle (2), the
        # locality claim is "O(1) files, not O(n_files)"
        upd = spark.createDataFrame(
            [(i, "upd") for i in range(5000, 5020)], ["id", "val"]
        )
        stats = merge_into(spark, p, upd, key="id")
        assert stats["rows_matched"] == 20
        assert stats["files_touched"] <= 2


class TestTrajectoryCli:
    def test_cli_trajectory_windows_and_features(self, tmp_path, spark):
        import json

        from conftest import run_cli
        from pyspark.sql import functions as F

        src = str(tmp_path / "ev")
        out = str(tmp_path / "out")
        (
            spark.range(0, 40)
            .select(
                (F.col("id") % 4).alias("user_id"),
                F.timestamp_seconds(F.col("id")).alias("ts"),
                F.col("id").alias("event_id"),
                F.lit("t").alias("event_type"),
                (F.col("id") * 1.5).alias("value"),
            )
            .write.parquet(src)
        )
        r = run_cli(
            [
                "trajectory", "--events", src, "--out", out,
                "--length", "4", "--stride", "2", "--features",
            ]
        )
        assert r.returncode == 0, r.stderr[-2000:]
        summary = json.loads(r.stdout.strip().splitlines()[-1])
        # 4 users x 10 events each -> (10-4)//2+1 = 4 windows per user
        assert summary["windows"] == 16 and summary["features"] is True
        wins = spark.read.parquet(out + "/windows")
        assert wins.count() == 16 * 4
        feats = spark.read.parquet(out + "/features")
        assert feats.count() == 16
        assert {r["n_events"] for r in feats.collect()} == {4}


class TestSplitCli:
    def test_cli_split_pins_duplicates_together(self, tmp_path, spark):
        import json

        from conftest import run_cli
        from pyspark.sql import functions as F

        src = str(tmp_path / "docs")
        out = str(tmp_path / "splits")
        base = spark.range(0, 120).select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("some words repeated here for shingling purposes number "),
                F.col("id").cast("string"),
                F.lit(" and then more filler text tokens to shingle against"),
            ).alias("text"),
        )
        # plant exact copies of docs 0..19 under new ids
        dups = base.filter("doc_id < 20").select(
            (F.col("doc_id") + 1000).alias("doc_id"), "text"
        )
        base.unionByName(dups).write.parquet(src)
        r = run_cli(["split", "--path", src, "--out", out])
        assert r.returncode == 0, r.stderr[-2000:]
        counts = json.loads(r.stdout.strip().splitlines()[-1])["counts"]
        assert sum(counts.values()) == 140
        got = {r["doc_id"]: r["split"] for r in spark.read.parquet(out).collect()}
        for i in range(20):
            assert got[i] == got[i + 1000], i  # copy shares the original's split


class TestProfileAwkwardNames:
    def test_profile_handles_non_identifier_column_names(self, spark):
        from imitation_learning_data_pipeline_spark.plans.profile import profile_frame

        df = (
            spark.range(0, 10)
            .selectExpr("id AS `my col`", "CAST(id AS STRING) AS `a.b`")
        )
        got = {r["column_name"]: r for r in profile_frame(df, ["my col", "a.b"]).collect()}
        assert got["my col"]["n_distinct"] == 10
        assert got["a.b"]["n_null"] == 0


class TestReviewRegressions:
    """Fixes from the round-6 self-review."""

    def test_merged_minmax_is_numeric_not_lexicographic(self, spark):
        from imitation_learning_data_pipeline_spark.plans.profile import (
            merge_profiles,
            profile_estimates,
            profile_frame_sketch,
        )

        a = spark.range(0, 1000).selectExpr("id")  # max 999
        b = spark.range(1000, 5000).selectExpr("id")  # max 4999
        folded = profile_estimates(
            merge_profiles(
                profile_frame_sketch(a, ["id"]).unionByName(
                    profile_frame_sketch(b, ["id"])
                )
            )
        ).collect()[0]
        assert folded["max_val"] == "4999"  # '999' > '4999' as strings
        assert folded["min_val"] == "0"  # per-batch mins 0 and 1000

    def test_stride_gt_length_emits_no_garbage(self, spark):
        from pyspark.sql import functions as F

        from imitation_learning_data_pipeline_spark.plans.trajectory import (
            slice_windows,
        )

        events = spark.range(0, 12).select(
            F.lit(1).alias("user_id"),
            F.timestamp_seconds(F.col("id")).alias("ts"),
            F.col("id").alias("event_id"),
            F.lit("t").alias("event_type"),
        )
        out = slice_windows(events, length=2, stride=4).collect()
        # spaced windows: starts 0,4,8 → idx {0,1,4,5,8,9}; pos ∈ {0,1}
        assert len(out) == 6
        for r in out:
            assert 0 <= r["pos"] < 2
            assert r["event_id"] == r["window_id"] * 4 + r["pos"]

    def test_merge_refuses_partitioned_target_without_partition_by(
        self, spark, tmp_path
    ):
        import pytest as _pytest

        from pyspark.sql import functions as F

        from imitation_learning_data_pipeline_spark.pipeline.merge import merge_into

        p = str(tmp_path / "pt2")
        (
            spark.range(0, 50)
            .withColumn("part", F.when(F.col("id") % 2 == 0, "a").otherwise("b"))
            .write.partitionBy("part")
            .parquet(p)
        )
        upd = spark.createDataFrame([(2, "a")], ["id", "part"])
        with _pytest.raises(ValueError, match="Hive-partitioned"):
            merge_into(spark, p, upd, key="id")
        # layout untouched by the refused merge
        assert spark.read.parquet(p).count() == 50

    def test_merge_stats_with_duplicate_target_keys(self, spark, tmp_path):
        from imitation_learning_data_pipeline_spark.pipeline.merge import merge_into

        p = str(tmp_path / "dup")
        spark.range(0, 10).selectExpr("id", "id AS val").write.parquet(p)
        # duplicate key 5 in the target via append
        spark.createDataFrame([(5, 500)], ["id", "val"]).write.mode(
            "append"
        ).parquet(p)
        upd = spark.createDataFrame([(5, -5), (99, -99)], ["id", "val"])
        stats = merge_into(spark, p, upd, key="id")
        # key-based stats: 1 matched key, 1 inserted — never negative
        assert stats["rows_matched"] == 1 and stats["rows_inserted"] == 1
        rows = [
            (r["id"], r["val"]) for r in spark.read.parquet(p).filter("id = 5").collect()
        ]
        assert rows == [(5, -5)]  # BOTH old versions replaced by the one update

    def test_streaming_trajectory_null_event_type(self, spark, tmp_path):
        import pandas as pd
        from pyspark.sql import types as T

        from imitation_learning_data_pipeline_spark.streaming.incremental import (
            streaming_trajectory_windows,
        )

        ingest = tmp_path / "in"
        ingest.mkdir()
        sink = str(tmp_path / "sink")
        schema = T.StructType(
            [
                T.StructField("user_id", T.LongType()),
                T.StructField("ts", T.TimestampType()),
                T.StructField("event_id", T.LongType()),
                T.StructField("event_type", T.StringType()),
            ]
        )
        df = pd.DataFrame(
            {
                "user_id": [1] * 4,
                "ts": pd.to_datetime(range(4), unit="s", utc=True),
                "event_id": range(4),
                "event_type": ["a", None, "c", "d"],
            }
        )
        df.to_parquet(ingest / "b.parquet", index=False, coerce_timestamps="us")
        stream = spark.readStream.schema(schema).parquet(str(ingest))
        q = (
            streaming_trajectory_windows(stream, length=4, stride=4)
            .writeStream.foreachBatch(
                lambda d, b: d.write.mode("append").parquet(sink)
            )
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {r["pos"]: r["event_type"] for r in spark.read.parquet(sink).collect()}
        assert got == {0: "a", 1: None, 2: "c", 3: "d"}  # null stays null


class TestIncrementalDedupReviewFixes:
    """Second-review fixes: replay idempotence and store-aware accounting."""

    @staticmethod
    def _docs(spark, rows):
        return spark.createDataFrame(rows, ["doc_id", "text"])

    _TEXT = (
        "the quick brown fox jumps over the lazy dog while seven wizards "
        "brew strong potions under a pale winter moon tonight"
    )

    def test_replayed_batch_pairs_match_original(self, spark, tmp_path):
        """Crash-after-fold replay: excluding the batch's own partitions
        from the store read keeps the replay's pairs identical."""
        from imitation_learning_data_pipeline_spark.plans.dedup import (
            dedup_against_store,
            write_minhash_store,
        )

        store = str(tmp_path / "store")
        base = self._docs(spark, [(1, self._TEXT), (2, "completely different words here about gardens and rivers flowing calmly through green valleys today")])
        write_minhash_store(base, store, ingest_batch=100)

        batch = self._docs(spark, [(10, self._TEXT)])
        first = {
            (r["doc_a"], r["doc_b"])
            for r in dedup_against_store(batch, store, exclude_batch=200).collect()
        }
        assert first == {(1, 10)}
        # simulate crash-after-fold: batch 200's signatures are committed
        write_minhash_store(batch, store, ingest_batch=200)
        # replay: WITHOUT exclusion the batch would see itself in the store
        replog = {
            (r["doc_a"], r["doc_b"])
            for r in dedup_against_store(batch, store, exclude_batch=200).collect()
        }
        assert replog == first
        # re-fold replaces (not duplicates) its own partitions
        write_minhash_store(batch, store, ingest_batch=200)
        sets = spark.read.parquet(f"{store}/sets")
        assert sets.filter("doc_id = 10").count() == 1

    def test_cli_incremental_accounting_and_fold_idempotence(self, spark, tmp_path):
        import json

        from conftest import run_cli

        store = str(tmp_path / "s")
        out1 = str(tmp_path / "o1")
        out2 = str(tmp_path / "o2")
        b1 = str(tmp_path / "b1")
        b2 = str(tmp_path / "b2")
        self._docs(spark, [(5, self._TEXT)]).write.parquet(b1)
        # batch 2: doc 20 duplicates STORE doc 5; doc 21 is novel
        self._docs(
            spark,
            [(20, self._TEXT), (21, "unrelated fresh content about mountain trails and quiet snowfall covering ancient stone paths near the village")],
        ).write.parquet(b2)

        def run(inp, out):
            r = run_cli(
                ["dedup", "--input", inp, "--out", out,
                 "--store", store, "--fold-into-store"]
            )
            assert r.returncode == 0, r.stderr[-2000:]
            return json.loads(r.stdout.strip().splitlines()[-1])

        s1 = run(b1, out1)
        assert s1["n_kept"] == 1
        s2 = run(b2, out2)
        # doc 20 dropped (duplicate of store content), doc 21 kept —
        # and the stats agree with the keep/ dataset
        kept = {r["doc_id"] for r in spark.read.parquet(out2 + "/keep").collect()}
        assert kept == {21}
        assert s2["n_kept"] == 1 and s2["n_dropped"] == 1

        # re-running the same batch (crash recovery) converges: same
        # stats, store holds each doc exactly once
        s2b = run(b2, out2)
        assert (s2b["n_pairs"], s2b["n_kept"]) == (s2["n_pairs"], s2["n_kept"])
        sets = spark.read.parquet(f"{store}/sets")
        assert sets.groupBy("doc_id").count().filter("count > 1").count() == 0


class TestCompactReviewFixes:
    def test_type_inferred_partition_values_still_split(self, spark, tmp_path):
        """month='01' dirs read back as int 1; the slice map must match
        on the RAW directory token or the partition funnels to 1 file."""
        import os

        from pyspark.sql import functions as F

        from imitation_learning_data_pipeline_spark.pipeline.compact import compact

        p = str(tmp_path / "mo")
        (
            spark.range(0, 20_000)
            .withColumn("month", F.lit("01"))
            .withColumn("pay", F.sha2(F.col("id").cast("string"), 512))
            .repartition(10)
            .write.partitionBy("month")
            .parquet(p)
        )
        part_dir = os.path.join(p, "month=1") if os.path.isdir(
            os.path.join(p, "month=1")
        ) else os.path.join(p, "month=01")
        bytes_before = sum(
            os.path.getsize(os.path.join(part_dir, f))
            for f in os.listdir(part_dir)
            if f.endswith(".parquet")
        )
        target = max(1, bytes_before // 4)
        compact(spark, p, target_bytes=target, partition_col="month")
        part_dir = os.path.join(p, "month=1") if os.path.isdir(
            os.path.join(p, "month=1")
        ) else os.path.join(p, "month=01")
        files_after = [
            f for f in os.listdir(part_dir) if f.endswith(".parquet")
        ]
        assert len(files_after) >= 3  # split into ~4 slices, not 1 file
        assert spark.read.parquet(p).count() == 20_000

    def test_flat_dir_with_partition_col_does_not_funnel(self, spark, tmp_path):
        """First compaction of a non-hive layout with partition_col set
        must use byte-sized parallelism, not one task."""
        from pyspark.sql import functions as F

        from imitation_learning_data_pipeline_spark.pipeline.compact import compact

        p = str(tmp_path / "flat")
        (
            spark.range(0, 20_000)
            .withColumn("part", (F.col("id") % 3).cast("string"))
            .withColumn("pay", F.sha2(F.col("id").cast("string"), 512))
            .repartition(10)
            .write.parquet(p)  # flat — no partitionBy
        )
        stats = compact(spark, p, target_bytes=64 * 1024, partition_col="part")
        assert stats["files_after"] > 1  # not a single funneled file
        df = spark.read.parquet(p)
        assert df.count() == 20_000
        assert {str(v) for v in df.select("part").distinct().toPandas()["part"]} == {"0", "1", "2"}


class TestLshIndexBackCompat:
    def test_search_unprefixed_legacy_index(self, spark, tmp_path):
        """Indexes written before the 'b' prefix carry int-inferred
        bucket partitions; search must key them as ints, not return an
        empty top-k."""
        import numpy as np

        from imitation_learning_data_pipeline_spark.plans.similarity import (
            _PLANES_MAT,
            _bucket_udf,
            search_lsh_index,
            write_lsh_index,
        )
        from pyspark.sql import functions as F

        from imitation_learning_data_pipeline_spark.sources import load_table

        emb = load_table(spark, SF_DIR, "embeddings").limit(200)
        legacy = str(tmp_path / "legacy_idx")
        bucket = _bucket_udf()
        # the OLD layout: raw 8-digit bucket strings, no prefix — read
        # back with partition-type inference coercing them to ints
        (
            emb.select(
                "vec_id", "embedding", bucket(F.col("embedding")).alias("bucket")
            )
            .repartition("bucket")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(legacy)
        )
        assert dict(spark.read.parquet(legacy).dtypes)["bucket"] != "string"

        rows = emb.limit(4).collect()
        qids = [r["vec_id"] for r in rows]
        qmat = np.stack([np.array(r["embedding"], dtype=np.float64) for r in rows])
        legacy_hits = search_lsh_index(spark, legacy, qids, qmat, k=3).collect()
        assert len(legacy_hits) > 0  # silently-empty was the bug

        # parity: the new prefixed layout returns the same result set
        fresh = str(tmp_path / "fresh_idx")
        write_lsh_index(emb, fresh)
        fresh_hits = search_lsh_index(spark, fresh, qids, qmat, k=3).collect()
        key = lambda rs: {(r["qid"], r["rnk"], r["vec_id"]) for r in rs}
        assert key(legacy_hits) == key(fresh_hits)


class TestIncrementalComponents:
    def test_folds_equal_full_batch_cc(self, spark, tmp_path):
        """Three arrivals, including a bridge that merges two existing
        clusters: the store must equal connected_components over the
        union of all pairs ever folded."""
        from imitation_learning_data_pipeline_spark.plans.dedup import (
            connected_components,
            fold_components_into_store,
        )

        store = str(tmp_path / "cc")

        def fold(rows):
            return fold_components_into_store(
                spark, spark.createDataFrame(rows, ["doc_a", "doc_b"]), store
            )

        def snapshot():
            return {
                (r["doc_id"], r["cluster_id"])
                for r in spark.read.parquet(store).collect()
            }

        all_pairs = []

        def expect():
            return {
                (r["doc_id"], r["cluster_id"])
                for r in connected_components(
                    spark.createDataFrame(all_pairs, ["doc_a", "doc_b"])
                ).select("doc_id", "cluster_id").collect()
            }

        # arrival 1: two separate clusters {1,2} and {10,11}
        b1 = [(1, 2), (10, 11)]
        all_pairs += b1
        s = fold(b1)
        assert s.get("bootstrap") is True
        assert snapshot() == expect()

        # arrival 2: extend one cluster, add a new one {20,21}
        b2 = [(2, 3), (20, 21)]
        all_pairs += b2
        s = fold(b2)
        assert snapshot() == expect()

        # arrival 3: BRIDGE {1,2,3} and {10,11} via (3,10) — the merged
        # cluster must relabel to the global min (1), and untouched
        # cluster {20,21} must not be rewritten
        before = {
            f: m
            for f, m in (
                (r["doc_id"], r["cluster_id"])
                for r in spark.read.parquet(store).collect()
            )
        }
        b3 = [(3, 10)]
        all_pairs += b3
        s = fold(b3)
        got = snapshot()
        assert got == expect()
        assert (10, 1) in got and (11, 1) in got
        assert (20, 20) in got and (21, 20) in got
        assert s["n_touched_clusters"] == 1  # only the {10,11} root moved

    def test_untouched_cluster_files_not_rewritten(self, spark, tmp_path):
        """The copy-on-write property carries through: folding pairs
        that touch no existing cluster leaves prior files intact."""
        import os

        from imitation_learning_data_pipeline_spark.plans.dedup import (
            fold_components_into_store,
        )

        store = str(tmp_path / "cc2")
        fold_components_into_store(
            spark, spark.createDataFrame([(1, 2)], ["doc_a", "doc_b"]), store
        )
        files_before = {
            f: os.path.getsize(os.path.join(store, f))
            for f in os.listdir(store)
            if f.endswith(".parquet")
        }
        fold_components_into_store(
            spark, spark.createDataFrame([(50, 60)], ["doc_a", "doc_b"]), store
        )
        files_after = {
            f: os.path.getsize(os.path.join(store, f))
            for f in os.listdir(store)
            if f.endswith(".parquet")
        }
        for f, sz in files_before.items():
            assert files_after.get(f) == sz  # disjoint fold = pure append
        got = {
            (r["doc_id"], r["cluster_id"])
            for r in spark.read.parquet(store).collect()
        }
        assert got == {(1, 1), (2, 1), (50, 50), (60, 50)}


class TestStreamingComponentsStore:
    def test_stream_maintains_cluster_assignments(self, spark, tmp_path):
        import pandas as pd
        from pyspark.sql import types as T

        from imitation_learning_data_pipeline_spark.streaming.incremental import (
            run_incremental_dedup_stream,
        )

        ingest = tmp_path / "in"
        ingest.mkdir()
        mh_store = str(tmp_path / "mh")
        pairs = str(tmp_path / "pairs")
        cc_store = str(tmp_path / "cc")
        ckpt = str(tmp_path / "ck")
        schema = T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("text", T.StringType()),
            ]
        )
        text = (
            "galaxies rotate slowly while distant quasars flicker through "
            "cosmic dust lanes revealing ancient starlight patterns tonight"
        )
        other = (
            "a completely different manuscript describing medieval trade "
            "routes crossing mountain passes with salt and silk caravans"
        )

        def _run():
            stream = spark.readStream.schema(schema).parquet(str(ingest))
            run_incremental_dedup_stream(
                stream, mh_store, pairs, ckpt, components_store=cc_store
            )

        pd.DataFrame({"doc_id": [1, 2], "text": [text, other]}).to_parquet(
            ingest / "b1.parquet", index=False
        )
        _run()  # bootstrap batch: no store yet, no pairs between 1 and 2

        pd.DataFrame({"doc_id": [30], "text": [text]}).to_parquet(
            ingest / "b2.parquet", index=False
        )
        _run()  # 30 duplicates 1 → pair (1,30) → cluster store fold

        got = {
            (r["doc_id"], r["cluster_id"])
            for r in spark.read.parquet(cc_store).collect()
        }
        assert got == {(1, 1), (30, 1)}


class TestDedupComponentsStoreCli:
    def test_components_store_accumulates_across_runs(self, tmp_path, spark):
        import json

        from conftest import run_cli

        text = (
            "identical content for clustering across separate cli runs with "
            "plenty of words to shingle over and match reliably every time"
        )
        b1 = str(tmp_path / "b1")
        b2 = str(tmp_path / "b2")
        cc = str(tmp_path / "cc")
        spark.createDataFrame(
            [(1, text), (2, text)], ["doc_id", "text"]
        ).write.parquet(b1)
        spark.createDataFrame([(30, text)], ["doc_id", "text"]).write.parquet(b2)

        def run(inp, out, extra):
            r = run_cli(
                ["dedup", "--input", inp, "--out", out,
                 "--components-store", cc] + extra
            )
            assert r.returncode == 0, r.stderr[-2000:]
            return json.loads(r.stdout.strip().splitlines()[-1])

        store = str(tmp_path / "mh")
        run(b1, str(tmp_path / "o1"), ["--store", store, "--fold-into-store"])
        got1 = {
            (r["doc_id"], r["cluster_id"])
            for r in spark.read.parquet(cc).collect()
        }
        assert got1 == {(1, 1), (2, 1)}
        run(b2, str(tmp_path / "o2"), ["--store", store, "--fold-into-store"])
        got2 = {
            (r["doc_id"], r["cluster_id"])
            for r in spark.read.parquet(cc).collect()
        }
        assert got2 == {(1, 1), (2, 1), (30, 1)}  # joined the existing cluster


class TestMaintenanceTask:
    def test_compact_task_appends_after_materialize(self):
        from imitation_learning_data_pipeline_spark.orchestration import (
            pipeline_tasks,
            toposort,
        )

        base = pipeline_tasks("/d", "/w")
        assert [t.task_id for t in base] == [
            "discover", "validate", "stats", "align_transform", "materialize",
        ]
        with_maint = pipeline_tasks("/d", "/w", maintenance=True)
        order = [t.task_id for t in toposort(with_maint)]
        assert order[-1] == "compact"
        compact = with_maint[-1]
        assert compact.upstream == ("materialize",)
        assert "--partition-col" in compact.argv and "split,chunk" in compact.argv
        assert "/w/dataset/data" in compact.argv


class TestMergeCommitSafety:
    def test_hive_escaped_partition_values(self, spark, tmp_path):
        """Partition values that hive-escapes on disk (':' -> %3A) must
        merge cleanly — _metadata paths are double-encoded for them."""
        from imitation_learning_data_pipeline_spark.pipeline.merge import merge_into

        p = str(tmp_path / "esc")
        spark.createDataFrame(
            [(1, "a:b", "x"), (2, "a:b", "y"), (3, "plain", "z")],
            ["id", "part", "val"],
        ).write.partitionBy("part").parquet(p)
        upd = spark.createDataFrame([(1, "a:b", "updated")], ["id", "part", "val"])
        stats = merge_into(spark, p, upd, key="id", partition_by=["part"])
        assert stats["rows_matched"] == 1
        got = {(r["id"], r["part"], r["val"]) for r in spark.read.parquet(p).collect()}
        assert (1, "a:b", "updated") in got and (1, "a:b", "x") not in got
        assert len(got) == 3

    def test_partition_by_on_flat_target_refused(self, spark, tmp_path):
        import pytest as _pytest

        from imitation_learning_data_pipeline_spark.pipeline.merge import merge_into

        p = str(tmp_path / "flat")
        spark.range(0, 10).selectExpr("id", "'a' AS part").write.parquet(p)
        upd = spark.createDataFrame([(1, "a")], ["id", "part"])
        with _pytest.raises(ValueError, match="flat layout"):
            merge_into(spark, p, upd, key="id", partition_by=["part"])
        assert spark.read.parquet(p).count() == 10  # untouched

    def test_crashed_commit_is_completed_not_replayed(self, spark, tmp_path):
        """A journal left by a crash mid-commit is finished by the next
        merge: the staged file moves in, the journaled delete happens,
        and no survivor rows duplicate."""
        import json
        import os

        from imitation_learning_data_pipeline_spark.pipeline.merge import merge_into

        p = str(tmp_path / "cr")
        spark.range(0, 100).selectExpr("id", "id AS val").repartition(4).write.parquet(p)
        files = sorted(
            f for f in os.listdir(p) if f.endswith(".parquet") and not f.startswith("_")
        )
        victim = os.path.join(p, files[0])
        victim_rows = {
            (r["id"], r["val"])
            for r in spark.read.parquet(victim).collect()
        }
        # hand-build the crash state: a staged replacement for `victim`
        # (same rows, id 7 updated if present — emulate an interrupted
        # merge_into that had journaled but not finished)
        tmp = p + "__merge_tmp"
        staged_rows = [
            (i, -7 if i == 7 else v) for (i, v) in victim_rows
        ]
        spark.createDataFrame(staged_rows, ["id", "val"]).coalesce(1).write.parquet(tmp)
        staged_file = next(
            f for f in os.listdir(tmp) if f.endswith(".parquet") and not f.startswith("_")
        )
        with open(os.path.join(p, "__merge_pending.json"), "w") as fh:
            json.dump({"add": [staged_file], "delete": [victim]}, fh)

        # next merge on the path completes the journal, then applies itself
        upd = spark.createDataFrame([(9999, -1)], ["id", "val"])
        merge_into(spark, p, upd, key="id")
        got = {(r["id"], r["val"]) for r in spark.read.parquet(p).collect()}
        expect = {(i, i) for i in range(100) if i != 7 or (7, 7) not in victim_rows}
        expect = {(i, v) for (i, v) in expect}
        # exact: all originals, with 7 updated iff it lived in the victim
        base = {(i, i) for i in range(100)}
        if (7, 7) in victim_rows:
            base = (base - {(7, 7)}) | {(7, -7)}
        base |= {(9999, -1)}
        assert got == base
        # no duplicates anywhere
        assert spark.read.parquet(p).groupBy("id").count().filter("count > 1").count() == 0
        assert not os.path.exists(os.path.join(p, "__merge_pending.json"))
        assert not os.path.exists(tmp)


class TestCompactEncodingAndLayout:
    def test_escaped_partition_value_still_splits(self, spark, tmp_path):
        """part='a:b' lives on disk as part=a%3Ab; the slice probe must
        match it (url_decode of the doubly-encoded file_path token)."""
        import os

        from pyspark.sql import functions as F

        from imitation_learning_data_pipeline_spark.pipeline.compact import compact

        p = str(tmp_path / "esc")
        (
            spark.range(0, 20_000)
            .withColumn("part", F.lit("a:b"))
            .withColumn("pay", F.sha2(F.col("id").cast("string"), 512))
            .repartition(10)
            .write.partitionBy("part")
            .parquet(p)
        )
        part_dir = next(
            os.path.join(p, d) for d in os.listdir(p) if d.startswith("part=")
        )
        bytes_before = sum(
            os.path.getsize(os.path.join(part_dir, f))
            for f in os.listdir(part_dir)
            if f.endswith(".parquet")
        )
        compact(spark, p, target_bytes=max(1, bytes_before // 4), partition_col="part")
        part_dir = next(
            os.path.join(p, d) for d in os.listdir(p) if d.startswith("part=")
        )
        files = [f for f in os.listdir(part_dir) if f.endswith(".parquet")]
        assert len(files) >= 3  # split, not funneled to 1
        df = spark.read.parquet(p)
        assert df.count() == 20_000
        assert df.select("part").distinct().collect()[0]["part"] == "a:b"

    def test_multilevel_layout_preserved(self, spark, tmp_path):
        """Compacting a split=/chunk= tree with both levels named keeps
        both directory levels on disk."""
        import os

        from pyspark.sql import functions as F

        from imitation_learning_data_pipeline_spark.pipeline.compact import compact

        p = str(tmp_path / "ml")
        (
            spark.range(0, 5000)
            .withColumn("split", F.when(F.col("id") % 10 < 8, "train").otherwise("val"))
            .withColumn("chunk", (F.col("id") % 3).cast("string"))
            .repartition(8)
            .write.partitionBy("split", "chunk")
            .parquet(p)
        )
        compact(spark, p, target_bytes=1 << 30, partition_col=["split", "chunk"])
        # both levels survive as directories
        lvl1 = [d for d in os.listdir(p) if d.startswith("split=")]
        assert sorted(lvl1) == ["split=train", "split=val"]
        lvl2 = [
            d
            for d in os.listdir(os.path.join(p, "split=train"))
            if d.startswith("chunk=")
        ]
        assert len(lvl2) == 3
        assert spark.read.parquet(p).count() == 5000

    def test_flat_first_compaction_bounded_file_count(self, spark, tmp_path):
        """First hive-ification of a flat dir writes ~n files total, not
        n x n_values shreds."""
        import os

        from pyspark.sql import functions as F

        from imitation_learning_data_pipeline_spark.pipeline.compact import compact

        p = str(tmp_path / "fl")
        (
            spark.range(0, 30_000)
            .withColumn("part", (F.col("id") % 3).cast("string"))
            .withColumn("pay", F.sha2(F.col("id").cast("string"), 512))
            .repartition(10)
            .write.parquet(p)
        )
        stats = compact(spark, p, target_bytes=256 * 1024, partition_col="part")
        n_target = stats["bytes"] // (256 * 1024) + 1
        # bounded by ~n + n_values slack, nowhere near n x n_values
        assert stats["files_after"] <= n_target + 3 + 2
        assert spark.read.parquet(p).count() == 30_000
