"""Round-7c: snapshot isolation / time travel (pipeline/snapshot.py).

Coverage: pinned reads surviving copy-on-write merges and compaction
(flat, partitioned, sprawl-selective), vacuum GC with multi-snapshot
reference counting, unchanged no-snapshot maintenance behavior, error
paths, and the CLI verb.
"""

from __future__ import annotations

import json
import os

import pytest

from imitation_learning_data_pipeline_spark.pipeline.compact import (
    compact,
    compact_sprawling,
)
from imitation_learning_data_pipeline_spark.pipeline.merge import merge_into
from imitation_learning_data_pipeline_spark.pipeline.snapshot import (
    create_snapshot,
    drop_snapshot,
    list_snapshots,
    read_snapshot,
)


def _write(spark, path, n=1000, files=8):
    df = spark.range(n).selectExpr(
        "id AS k", "CAST(id * 10 AS DOUBLE) AS v", "concat('r', id) AS s"
    )
    df.repartition(files).write.parquet(path)


def _rows(df):
    return sorted((r["k"], r["v"], r["s"]) for r in df.collect())


def _retained_files(table):
    root = os.path.join(table, "_snapshots", "retained")
    out = []
    for dirpath, _dirs, files in os.walk(root):
        out += [os.path.join(dirpath, f) for f in files if f.endswith(".parquet")]
    return out


class TestSnapshotMerge:
    def test_snapshot_survives_merge(self, spark, tmp_path):
        t = str(tmp_path / "t")
        _write(spark, t)
        before = _rows(spark.read.parquet(t))
        info = create_snapshot(spark, t, "v1")
        assert info["n_files"] == 8
        upd = spark.range(50).selectExpr(
            "id AS k", "CAST(-1 AS DOUBLE) AS v", "'upd' AS s"
        )
        merge_into(spark, t, upd, key="k")
        now = _rows(spark.read.parquet(t))
        assert now != before and len(now) == len(before)
        # the pinned view is byte-stable history
        assert _rows(read_snapshot(spark, t, "v1")) == before
        assert len(_retained_files(t)) > 0

    def test_no_snapshot_means_plain_delete(self, spark, tmp_path):
        t = str(tmp_path / "t")
        _write(spark, t)
        upd = spark.range(5).selectExpr(
            "id AS k", "CAST(-1 AS DOUBLE) AS v", "'u' AS s"
        )
        merge_into(spark, t, upd, key="k")
        assert not os.path.exists(os.path.join(t, "_snapshots"))

    def test_two_snapshots_two_histories(self, spark, tmp_path):
        t = str(tmp_path / "t")
        _write(spark, t)
        s0 = _rows(spark.read.parquet(t))
        create_snapshot(spark, t, "v1")
        u1 = spark.range(20).selectExpr(
            "id AS k", "CAST(-1 AS DOUBLE) AS v", "'a' AS s"
        )
        merge_into(spark, t, u1, key="k")
        s1 = _rows(spark.read.parquet(t))
        create_snapshot(spark, t, "v2")
        u2 = spark.range(20, 40).selectExpr(
            "id AS k", "CAST(-2 AS DOUBLE) AS v", "'b' AS s"
        )
        merge_into(spark, t, u2, key="k")
        assert _rows(read_snapshot(spark, t, "v1")) == s0
        assert _rows(read_snapshot(spark, t, "v2")) == s1
        tags = [s["tag"] for s in list_snapshots(spark, t)]
        assert tags == ["v1", "v2"]


class TestSnapshotCompact:
    def test_snapshot_survives_full_compact(self, spark, tmp_path):
        t = str(tmp_path / "t")
        _write(spark, t, files=20)
        before = _rows(spark.read.parquet(t))
        create_snapshot(spark, t, "pin")
        stats = compact(spark, t, target_bytes=1 << 30)
        assert stats["files_after"] < stats["files_before"]
        assert _rows(spark.read.parquet(t)) == before
        assert _rows(read_snapshot(spark, t, "pin")) == before
        # the compacted live tree no longer holds the pinned files
        assert len(_retained_files(t)) == 20

    def test_snapshot_survives_partitioned_sprawl_compact(self, spark, tmp_path):
        t = str(tmp_path / "t")
        df = spark.range(2000).selectExpr(
            "CASE WHEN id % 2 = 0 THEN 'train' ELSE 'val' END AS split",
            "id AS k",
            "CAST(id AS DOUBLE) AS v",
            "concat('r', id) AS s",
        )
        df.where("split = 'train'").repartition(40).write.partitionBy(
            "split"
        ).parquet(t)
        df.where("split = 'val'").coalesce(1).write.mode("append").partitionBy(
            "split"
        ).parquet(t)
        before = sorted(
            (r["split"], r["k"], r["v"], r["s"])
            for r in spark.read.parquet(t).collect()
        )
        create_snapshot(spark, t, "pin")
        stats = compact_sprawling(
            spark, t, target_bytes=1 << 30, partition_col="split"
        )
        assert stats["partitions_selected"] == 1  # only the sprawled one
        got = sorted(
            (r["split"], r["k"], r["v"], r["s"])
            for r in read_snapshot(spark, t, "pin").collect()
        )
        assert got == before
        # retained rels keep their hive context
        assert any("split=train" in f for f in _retained_files(t))

    def test_snapshot_on_untouched_table_reads_live(self, spark, tmp_path):
        t = str(tmp_path / "t")
        _write(spark, t)
        before = _rows(spark.read.parquet(t))
        create_snapshot(spark, t, "pin")
        assert _rows(read_snapshot(spark, t, "pin")) == before
        assert _retained_files(t) == []


class TestSnapshotVacuum:
    def test_drop_gc_respects_other_snapshots(self, spark, tmp_path):
        t = str(tmp_path / "t")
        _write(spark, t)
        s0 = _rows(spark.read.parquet(t))
        create_snapshot(spark, t, "a")
        create_snapshot(spark, t, "b")
        upd = spark.range(1000).selectExpr(
            "id AS k", "CAST(-1 AS DOUBLE) AS v", "'u' AS s"
        )
        merge_into(spark, t, upd, key="k")  # replaces every file
        n_ret = len(_retained_files(t))
        assert n_ret == 8
        drop_snapshot(spark, t, "a")
        # b still references the same files: nothing GC'd
        assert len(_retained_files(t)) == n_ret
        assert _rows(read_snapshot(spark, t, "b")) == s0
        out = drop_snapshot(spark, t, "b")
        assert out["retained_deleted"] == n_ret
        assert _retained_files(t) == []

    def test_errors(self, spark, tmp_path):
        t = str(tmp_path / "t")
        _write(spark, t)
        with pytest.raises(FileNotFoundError):
            read_snapshot(spark, t, "nope")
        with pytest.raises(FileNotFoundError):
            drop_snapshot(spark, t, "nope")
        create_snapshot(spark, t, "v1")
        with pytest.raises(ValueError, match="already exists"):
            create_snapshot(spark, t, "v1")
        with pytest.raises(ValueError, match="invalid tag"):
            create_snapshot(spark, t, "../escape")

    def test_destroyed_table_raises_clearly(self, spark, tmp_path):
        t = str(tmp_path / "t")
        _write(spark, t)
        create_snapshot(spark, t, "pin")
        # a non-retention-aware full overwrite (the documented hazard)
        snap_dir = str(tmp_path / "saved")
        os.rename(os.path.join(t, "_snapshots"), snap_dir)
        spark.range(10).selectExpr(
            "id AS k", "CAST(0 AS DOUBLE) AS v", "'x' AS s"
        ).write.mode("overwrite").parquet(t)
        os.rename(snap_dir, os.path.join(t, "_snapshots"))
        with pytest.raises(IOError, match="gone from both"):
            read_snapshot(spark, t, "pin")


class TestSnapshotCli:
    def test_cli_roundtrip(self, spark, tmp_path, capsys):
        from imitation_learning_data_pipeline_spark.cli import main

        t = str(tmp_path / "t")
        _write(spark, t)
        before = _rows(spark.read.parquet(t))
        assert main(["snapshot", "--path", t, "--create", "v1"]) == 0
        upd_p = str(tmp_path / "u")
        spark.range(10).selectExpr(
            "id AS k", "CAST(-1 AS DOUBLE) AS v", "'u' AS s"
        ).write.parquet(upd_p)
        assert main(["merge", "--path", t, "--updates", upd_p, "--key", "k"]) == 0
        out_p = str(tmp_path / "export")
        capsys.readouterr()
        assert main(
            ["snapshot", "--path", t, "--read", "v1", "--out", out_p]
        ) == 0
        assert _rows(spark.read.parquet(out_p)) == before
        assert main(["snapshot", "--path", t, "--list"]) == 0
        lines = [
            json.loads(l)
            for l in capsys.readouterr().out.strip().splitlines()
            if l.startswith("{")
        ]
        assert any(d.get("tag") == "v1" for d in lines)
        assert main(["snapshot", "--path", t, "--drop", "v1"]) == 0
        assert _retained_files(t) == []


class TestDeleteFrom:
    def _file_state(self, table):
        out = {}
        for dirpath, _d, files in os.walk(table):
            if "_snapshots" in dirpath:
                continue
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(dirpath, f)
                    out[p] = (os.path.getsize(p), os.path.getmtime(p))
        return out

    def test_delete_rewrites_only_touched_files(self, spark, tmp_path):
        from imitation_learning_data_pipeline_spark.pipeline.merge import (
            cluster_write,
            delete_from,
        )

        t = str(tmp_path / "t")
        df = spark.range(1000).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
        # clustered layout: the deleted key range lives in few files
        cluster_write(df, t, "k", n_files=10)
        before = self._file_state(t)
        stats = delete_from(spark, t, "k >= 100 AND k < 150")
        assert stats["rows_deleted"] == 50
        assert stats["files_touched"] <= 2  # range-clustered locality
        after = self._file_state(t)
        untouched = [p for p in before if p in after]
        assert all(before[p] == after[p] for p in untouched)
        assert len(before) - len(untouched) == stats["files_touched"]
        got = sorted(r["k"] for r in spark.read.parquet(t).collect())
        assert got == [k for k in range(1000) if not (100 <= k < 150)]

    def test_null_predicate_rows_are_kept(self, spark, tmp_path):
        from imitation_learning_data_pipeline_spark.pipeline.merge import delete_from

        t = str(tmp_path / "t")
        spark.createDataFrame(
            [(1, "a"), (2, None), (3, "b")], "k long, s string"
        ).coalesce(1).write.parquet(t)
        stats = delete_from(spark, t, "s = 'a'")  # NULL for k=2 → kept
        assert stats["rows_deleted"] == 1
        assert sorted(r["k"] for r in spark.read.parquet(t).collect()) == [2, 3]

    def test_whole_file_delete_leaves_no_empty_file(self, spark, tmp_path):
        from imitation_learning_data_pipeline_spark.pipeline.merge import delete_from

        t = str(tmp_path / "t")
        df = spark.range(100).selectExpr("id AS k", "id % 2 AS p")
        # two files with disjoint p values: the p=0 file dies wholesale
        df.filter("p = 0").coalesce(1).write.parquet(t)
        df.filter("p = 1").coalesce(1).write.mode("append").parquet(t)
        n_before = len(self._file_state(t))
        stats = delete_from(spark, t, "p = 0")
        assert stats["rows_deleted"] == 50
        assert stats["files_added"] <= stats["files_touched"]
        assert sorted(r["k"] for r in spark.read.parquet(t).collect()) == list(
            range(1, 100, 2)
        )
        assert len(self._file_state(t)) < n_before

    def test_no_match_is_noop(self, spark, tmp_path):
        from imitation_learning_data_pipeline_spark.pipeline.merge import delete_from

        t = str(tmp_path / "t")
        spark.range(10).selectExpr("id AS k").write.parquet(t)
        before = self._file_state(t)
        stats = delete_from(spark, t, "k > 1000")
        assert stats == {"files_touched": 0, "files_added": 0, "rows_deleted": 0}
        assert self._file_state(t) == before

    def test_partitioned_layout_and_guards(self, spark, tmp_path):
        from imitation_learning_data_pipeline_spark.pipeline.merge import delete_from

        t = str(tmp_path / "t")
        df = spark.range(200).selectExpr(
            "id AS k", "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS split"
        )
        df.write.partitionBy("split").parquet(t)
        with pytest.raises(ValueError, match="Hive-partitioned"):
            delete_from(spark, t, "k < 10")
        stats = delete_from(spark, t, "k < 10", partition_by=["split"])
        assert stats["rows_deleted"] == 10
        left = spark.read.parquet(t)
        assert left.count() == 190
        assert left.select("split").distinct().count() == 2

    def test_snapshot_retention_on_delete(self, spark, tmp_path):
        from imitation_learning_data_pipeline_spark.pipeline.merge import delete_from

        t = str(tmp_path / "t")
        spark.range(100).selectExpr("id AS k").repartition(4).write.parquet(t)
        before = sorted(r["k"] for r in spark.read.parquet(t).collect())
        create_snapshot(spark, t, "pin")
        delete_from(spark, t, "k < 50")
        assert sorted(
            r["k"] for r in read_snapshot(spark, t, "pin").collect()
        ) == before
        assert sorted(r["k"] for r in spark.read.parquet(t).collect()) == list(
            range(50, 100)
        )

    def test_lock_respected(self, spark, tmp_path):
        from imitation_learning_data_pipeline_spark.pipeline.compact import (
            ConcurrentMaintenanceError,
        )
        from imitation_learning_data_pipeline_spark.pipeline.merge import delete_from

        t = str(tmp_path / "t")
        spark.range(10).selectExpr("id AS k").write.parquet(t)
        with open(t + "__maintenance_lock", "w") as fh:
            fh.write("{}")
        with pytest.raises(ConcurrentMaintenanceError):
            delete_from(spark, t, "k < 5")

    def test_cli(self, spark, tmp_path, capsys):
        from imitation_learning_data_pipeline_spark.cli import main

        t = str(tmp_path / "t")
        spark.range(100).selectExpr("id AS k").write.parquet(t)
        assert main(["delete", "--path", t, "--where", "k < 10"]) == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["rows_deleted"] == 10
        assert spark.read.parquet(t).count() == 90


class TestHistory:
    def test_ops_append_chronological_events(self, spark, tmp_path):
        from imitation_learning_data_pipeline_spark.pipeline.history import history
        from imitation_learning_data_pipeline_spark.pipeline.merge import (
            delete_from,
            merge_into,
        )

        t = str(tmp_path / "t")
        spark.range(200).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS v", "concat('r', id) AS s"
        ).repartition(4).write.parquet(t)
        assert history(spark, t) == []
        create_snapshot(spark, t, "pin")
        upd = spark.range(10).selectExpr(
            "id AS k", "CAST(-1 AS DOUBLE) AS v", "'u' AS s"
        )
        merge_into(spark, t, upd, key="k")
        delete_from(spark, t, "k >= 190")
        compact(spark, t, target_bytes=1 << 30)
        drop_snapshot(spark, t, "pin")
        ops = [e["op"] for e in history(spark, t)]
        assert ops == [
            "snapshot_create",
            "merge_into",
            "delete_from",
            "compact",
            "snapshot_drop",
        ]
        ev = history(spark, t)
        assert ev[1]["rows_matched"] == 10 and ev[1]["key"] == ["k"]
        assert ev[2]["rows_deleted"] == 10
        assert all("ts_utc" in e for e in ev)
        # the log survived compact's directory swap (carried back)
        assert ev[3]["files_after"] <= ev[3]["files_before"]

    def test_noop_delete_logs_nothing(self, spark, tmp_path):
        from imitation_learning_data_pipeline_spark.pipeline.history import history
        from imitation_learning_data_pipeline_spark.pipeline.merge import delete_from

        t = str(tmp_path / "t")
        spark.range(10).selectExpr("id AS k").write.parquet(t)
        delete_from(spark, t, "k > 100")
        assert history(spark, t) == []

    def test_cli(self, spark, tmp_path, capsys):
        from imitation_learning_data_pipeline_spark.cli import main
        from imitation_learning_data_pipeline_spark.pipeline.merge import delete_from

        t = str(tmp_path / "t")
        spark.range(10).selectExpr("id AS k").write.parquet(t)
        delete_from(spark, t, "k < 2")
        assert main(["history", "--path", t]) == 0
        lines = [
            json.loads(l)
            for l in capsys.readouterr().out.strip().splitlines()
            if l.startswith("{")
        ]
        assert [e["op"] for e in lines] == ["delete_from"]


class TestSnapshotOverwriteGuard:
    def test_clustered_overwrite_refused_with_live_snapshots(self, spark, tmp_path):
        from imitation_learning_data_pipeline_spark.pipeline.merge import (
            cluster_write,
            zorder_write,
        )

        t = str(tmp_path / "t")
        df = spark.range(100).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS a", "CAST(id % 7 AS DOUBLE) AS b"
        )
        cluster_write(df, t, "k", n_files=4)
        create_snapshot(spark, t, "pin")
        with pytest.raises(ValueError, match="live snapshots"):
            cluster_write(df, t, "k", n_files=4)
        with pytest.raises(ValueError, match="live snapshots"):
            zorder_write(df, t, ["a", "b"], n_files=4)
        # append mode is not a rewrite: allowed
        cluster_write(df, t, "k", n_files=1, mode="append")
        # vacuumed: overwrite allowed again
        drop_snapshot(spark, t, "pin")
        cluster_write(df, t, "k", n_files=4)


class TestDataCard:
    def test_card_contents(self, spark, tmp_path):
        from imitation_learning_data_pipeline_spark.pipeline.card import data_card
        from imitation_learning_data_pipeline_spark.pipeline.merge import merge_into

        t = str(tmp_path / "t")
        spark.createDataFrame(
            [(i, "web" if i % 4 else "code", float(i)) for i in range(200)],
            "doc_id long, source string, score double",
        ).repartition(4).write.parquet(t)
        create_snapshot(spark, t, "v1")
        merge_into(
            spark,
            t,
            spark.createDataFrame(
                [(0, "code", -1.0)], "doc_id long, source string, score double"
            ),
            key="doc_id",
        )
        card = data_card(spark, t, source_col="source", snapshot_tag="v1")
        assert card["n_rows"] == 200 and card["n_files"] >= 4
        assert {c["name"] for c in card["schema"]} == {"doc_id", "source", "score"}
        by_col = {c["name"]: c for c in card["columns"]}
        assert by_col["doc_id"]["n_null"] == 0
        assert abs(by_col["doc_id"]["n_distinct_approx"] - 200) <= 10
        mix = {m["source"]: m for m in card["mixture"]}
        assert mix["web"]["n_rows"] == 150 and mix["code"]["n_rows"] == 50
        assert mix["web"]["share_milli"] == 750
        assert [s["tag"] for s in card["snapshots"]] == ["v1"]
        assert [e["op"] for e in card["history_tail"]] == [
            "snapshot_create",
            "merge_into",
        ]
        assert card["snapshot_tag"] == "v1"

    def test_cli_writes_card_file(self, spark, tmp_path, capsys):
        from imitation_learning_data_pipeline_spark.cli import main

        t = str(tmp_path / "t")
        spark.range(50).selectExpr("id AS k").write.parquet(t)
        out = str(tmp_path / "card.json")
        assert main(["card", "--path", t, "--out", out]) == 0
        with open(out) as fh:
            card = json.load(fh)
        assert card["n_rows"] == 50
        assert card["columns"][0]["name"] == "k"


class TestLshIndexAppend:
    def test_append_batch_is_searchable_and_pruned(self, spark, tmp_path):
        """Incremental ANN maintenance: a second embedding batch appended
        to the bucket-partitioned index is found by search, old bucket
        files keep their bytes, and the scan still partition-prunes."""
        import numpy as np

        from imitation_learning_data_pipeline_spark.plans.similarity import (
            search_lsh_index,
            write_lsh_index,
        )

        rng = np.random.default_rng(11)
        def _emb(ids):
            rows = [
                (int(i), [float(x) for x in rng.standard_normal(64)]) for i in ids
            ]
            return spark.createDataFrame(
                rows, "vec_id long, embedding array<float>"
            )

        idx = str(tmp_path / "idx")
        write_lsh_index(_emb(range(100)), idx)
        state0 = {}
        for dirpath, _d, files in os.walk(idx):
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(dirpath, f)
                    state0[p] = (os.path.getsize(p), os.path.getmtime(p))
        write_lsh_index(_emb(range(100, 200)), idx, mode="append")
        # append never rewrites an existing file
        for p, st in state0.items():
            assert (os.path.getsize(p), os.path.getmtime(p)) == st
        back = spark.read.parquet(idx)
        assert back.count() == 200
        assert set(back.select("vec_id").toPandas().vec_id) == set(range(200))
        # search across both batches: exact self-bucket hit for a NEW
        # vector used as its own query
        probe = back.filter("vec_id = 150").collect()[0]
        qmat = np.array([probe["embedding"]], dtype=np.float64)
        qmat /= np.linalg.norm(qmat)
        res = search_lsh_index(spark, idx, [150], qmat, k=3)
        plan = res._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [" in plan and "bucket" in plan


class TestUpdateWhere:
    def test_update_rewrites_only_touched_files(self, spark, tmp_path):
        from imitation_learning_data_pipeline_spark.pipeline.merge import (
            cluster_write,
            update_where,
        )

        t = str(tmp_path / "t")
        df = spark.range(1000).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS v", "'raw' AS tag"
        )
        cluster_write(df, t, "k", n_files=10)
        before = TestDeleteFrom._file_state(self, t)
        stats = update_where(
            spark, t, "k >= 100 AND k < 150",
            {"v": "v * 2", "tag": "'fixed'"},
        )
        assert stats["rows_updated"] == 50
        assert stats["files_touched"] <= 2
        after = TestDeleteFrom._file_state(self, t)
        untouched = [p for p in before if p in after]
        assert all(before[p] == after[p] for p in untouched)
        got = spark.read.parquet(t)
        fixed = got.filter("tag = 'fixed'")
        assert fixed.count() == 50
        assert fixed.filter("v != k * 2").count() == 0
        assert got.filter("tag = 'raw'").count() == 950
        assert got.filter("tag = 'raw' AND v != k").count() == 0

    def test_guards(self, spark, tmp_path):
        from imitation_learning_data_pipeline_spark.pipeline.merge import update_where

        t = str(tmp_path / "t")
        df = spark.range(100).selectExpr(
            "id AS k", "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS split"
        )
        df.write.partitionBy("split").parquet(t)
        with pytest.raises(ValueError, match="Hive-partitioned"):
            update_where(spark, t, "k < 10", {"k": "k + 1"})
        with pytest.raises(ValueError, match="unknown columns"):
            update_where(
                spark, t, "k < 10", {"nope": "1"}, partition_by=["split"]
            )
        with pytest.raises(ValueError, match="partition columns"):
            update_where(
                spark, t, "k < 10", {"split": "'c'"}, partition_by=["split"]
            )
        stats = update_where(
            spark, t, "k < 10", {"k": "k + 1000"}, partition_by=["split"]
        )
        assert stats["rows_updated"] == 10
        back = spark.read.parquet(t)
        assert back.filter("k >= 1000").count() == 10
        assert back.count() == 100

    def test_null_predicate_rows_unmodified_and_noop(self, spark, tmp_path):
        from imitation_learning_data_pipeline_spark.pipeline.merge import update_where

        t = str(tmp_path / "t")
        spark.createDataFrame(
            [(1, "a", 1.0), (2, None, 2.0), (3, "b", 3.0)],
            "k long, s string, v double",
        ).coalesce(1).write.parquet(t)
        stats = update_where(spark, t, "s = 'a'", {"v": "v + 10"})
        assert stats["rows_updated"] == 1
        got = {r["k"]: r["v"] for r in spark.read.parquet(t).collect()}
        assert got == {1: 11.0, 2: 2.0, 3: 3.0}
        assert update_where(spark, t, "s = 'zzz'", {"v": "0"}) == {
            "files_touched": 0, "files_added": 0, "rows_updated": 0,
        }

    def test_snapshot_and_history_integration(self, spark, tmp_path):
        from imitation_learning_data_pipeline_spark.pipeline.history import history
        from imitation_learning_data_pipeline_spark.pipeline.merge import update_where

        t = str(tmp_path / "t")
        spark.range(100).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v") \
            .repartition(4).write.parquet(t)
        before = sorted(
            (r["k"], r["v"]) for r in spark.read.parquet(t).collect()
        )
        create_snapshot(spark, t, "pin")
        update_where(spark, t, "k < 50", {"v": "-1"})
        assert sorted(
            (r["k"], r["v"]) for r in read_snapshot(spark, t, "pin").collect()
        ) == before
        ev = history(spark, t)
        assert [e["op"] for e in ev] == ["snapshot_create", "update_where"]
        assert ev[1]["columns"] == ["v"] and ev[1]["rows_updated"] == 50

    def test_cli(self, spark, tmp_path, capsys):
        from imitation_learning_data_pipeline_spark.cli import main

        t = str(tmp_path / "t")
        spark.range(100).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v") \
            .write.parquet(t)
        assert main(
            ["update", "--path", t, "--where", "k < 10", "--set", "v=v+100"]
        ) == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["rows_updated"] == 10
        assert spark.read.parquet(t).filter("v >= 100").count() == 10


class TestRecoverWithSnapshots:
    def test_crashed_commit_recovery_retires_pinned_files(self, spark, tmp_path):
        """The journal's delete list goes through the same
        retire-or-delete as a live commit: recovering a crashed
        merge/delete/update on a snapshotted table must move the
        replaced file into the retained tree, not drop it."""
        from imitation_learning_data_pipeline_spark.pipeline.merge import recover

        p = str(tmp_path / "cr")
        spark.range(100).selectExpr("id", "id AS val").repartition(4).write.parquet(p)
        before = sorted((r["id"], r["val"]) for r in spark.read.parquet(p).collect())
        create_snapshot(spark, p, "pin")
        files = sorted(
            f for f in os.listdir(p)
            if f.endswith(".parquet") and not f.startswith("_")
        )
        victim = os.path.join(p, files[0])
        victim_rows = {
            (r["id"], r["val"]) for r in spark.read.parquet(victim).collect()
        }
        tmp = p + "__merge_tmp"
        spark.createDataFrame(
            [(i, -7 if i == 7 else v) for (i, v) in victim_rows], ["id", "val"]
        ).coalesce(1).write.parquet(tmp)
        staged_file = next(
            f for f in os.listdir(tmp)
            if f.endswith(".parquet") and not f.startswith("_")
        )
        with open(os.path.join(p, "__merge_pending.json"), "w") as fh:
            json.dump({"add": [staged_file], "delete": [victim]}, fh)

        assert recover(spark, p) is True
        # the replaced file lives on in the retained tree...
        retained = _retained_files(p)
        assert len(retained) == 1 and retained[0].endswith(files[0])
        # ...so the pinned view is intact while the live table moved on
        assert sorted(
            (r["id"], r["val"])
            for r in read_snapshot(spark, p, "pin").collect()
        ) == before
        if (7, 7) in victim_rows:
            assert (7, -7) in {
                (r["id"], r["val"]) for r in spark.read.parquet(p).collect()
            }
