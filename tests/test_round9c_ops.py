"""Round-9 merge-on-read deletion vectors (pipeline/deletes.py):
position-delete semantics, the resurrection guard on every
file-rewriting op, purge-back-to-copy-on-write, crash-window
convergence, and DV-awareness of the manifest read paths and metadata
counts."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from imitation_learning_data_pipeline_spark.pipeline.bloom import write_blooms
from imitation_learning_data_pipeline_spark.pipeline.deletes import (
    PendingDeletesError,
    delete_from_mor,
    deleted_row_count,
    has_live_deletes,
    purge_deletes,
    read_with_deletes,
)
from imitation_learning_data_pipeline_spark.pipeline.manifest import (
    manifest_col_bounds,
    manifest_row_count,
    read_via_manifest,
    read_where,
    write_manifest,
)
from imitation_learning_data_pipeline_spark.pipeline.merge import (
    cluster_write,
    delete_from,
    insert_into,
    merge_into,
    update_where,
)

N, FILES = 4000, 6


def _mk(spark, path, partitioned=False):
    df = spark.range(N).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("doc_id"),
        (F.col("id") % 20).alias("grp"),
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("split"),
    )
    if partitioned:
        df.repartition(3, "doc_id").write.partitionBy("split").parquet(path)
    else:
        df.repartition(FILES, "doc_id").write.parquet(path)
    write_manifest(spark, path, stats_cols=["grp"])


@pytest.fixture()
def table(spark, tmp_path):
    path = str(tmp_path / "tbl")
    _mk(spark, path)
    return path


class TestMorDelete:
    def test_positions_not_files(self, spark, table):
        before = set(os.listdir(table))
        r = delete_from_mor(spark, table, "grp = 7")
        assert r == {"rows_deleted": N // 20, "dv_files": 1}
        # no data file was touched — only the DV dir appeared
        assert {
            f for f in os.listdir(table) if f.endswith(".parquet")
        } == {f for f in before if f.endswith(".parquet")}
        assert read_with_deletes(spark, table).count() == N - N // 20
        assert (
            read_with_deletes(spark, table).filter("grp = 7").count() == 0
        )

    def test_already_deleted_rows_cannot_rematch(self, spark, table):
        delete_from_mor(spark, table, "grp = 7")
        r2 = delete_from_mor(spark, table, "grp IN (7, 3)")
        assert r2["rows_deleted"] == N // 20  # only grp=3 matched anew
        assert read_with_deletes(spark, table).count() == N - 2 * (N // 20)

    def test_no_match_no_dv(self, spark, table):
        r = delete_from_mor(spark, table, "grp = 999")
        assert r == {"rows_deleted": 0, "dv_files": 0}
        assert not has_live_deletes(spark, table)

    def test_null_predicate_rows_kept(self, spark, table):
        # NULL-evaluating rows are kept (SQL DELETE semantics)
        r = delete_from_mor(
            spark, table, "CASE WHEN grp = 1 THEN NULL ELSE grp = 2 END"
        )
        assert r["rows_deleted"] == N // 20  # only grp=2

    def test_crashed_staging_swept(self, spark, table):
        os.makedirs(table + "__dv_tmp", exist_ok=True)
        open(table + "__dv_tmp/junk", "w").write("x")
        r = delete_from_mor(spark, table, "grp = 0")
        assert r["rows_deleted"] == N // 20
        assert not os.path.exists(table + "__dv_tmp")

    def test_position_dv_is_one_part_file(self, spark, table):
        """Positions per delete are metadata-sized by design — the DV
        commit must be ONE parquet part, not shuffle-partitions-many
        tiny files (every MOR read unions ALL DV dirs, so the file
        count compounds per delete)."""
        delete_from_mor(spark, table, "grp = 7")
        dv_root = os.path.join(table, "_manifest", "deletes")
        (dv_dir,) = [
            d for d in os.listdir(dv_root) if d.startswith("dv-")
        ]
        parts = [
            f
            for f in os.listdir(os.path.join(dv_root, dv_dir))
            if f.endswith(".parquet")
        ]
        assert len(parts) == 1


class TestResurrectionGuard:
    def test_rewriting_ops_refuse(self, spark, table):
        delete_from_mor(spark, table, "grp = 7")
        ups = spark.createDataFrame(
            [("doc-1", 1, "b")], "doc_id string, grp long, split string"
        )
        with pytest.raises(PendingDeletesError):
            merge_into(spark, table, ups, key="doc_id")
        with pytest.raises(PendingDeletesError):
            delete_from(spark, table, "grp = 1")
        with pytest.raises(PendingDeletesError):
            update_where(spark, table, "grp = 1", {"grp": F.lit(2)})
        from imitation_learning_data_pipeline_spark.pipeline.compact import (
            compact,
        )

        with pytest.raises(PendingDeletesError):
            compact(spark, table)
        with pytest.raises(PendingDeletesError):
            cluster_write(
                spark.read.parquet(table), table, by="doc_id", n_files=2
            )
        from imitation_learning_data_pipeline_spark.pipeline.snapshot import (
            create_snapshot,
        )

        with pytest.raises(PendingDeletesError):
            create_snapshot(spark, table, "pinned")

    def test_append_is_exempt(self, spark, table):
        delete_from_mor(spark, table, "grp = 7")
        insert_into(
            spark,
            table,
            spark.createDataFrame(
                [("doc-new", 99, "a")], "doc_id string, grp long, split string"
            ),
        )
        got = read_with_deletes(spark, table)
        assert got.filter("doc_id = 'doc-new'").count() == 1
        assert got.count() == N - N // 20 + 1


class TestPurge:
    def test_purge_rewrites_only_touched(self, spark, table):
        # grp=7 rows live in every file (hash-scattered), so all 6
        # files are touched here; the exactness claims are the point
        delete_from_mor(spark, table, "grp = 7")
        delete_from_mor(spark, table, "grp = 3")
        p = purge_deletes(spark, table)
        assert p["rows_purged"] == 2 * (N // 20)
        assert not has_live_deletes(spark, table)
        df = spark.read.parquet(table)  # plain read is exact again
        assert df.count() == N - 2 * (N // 20)
        assert df.filter("grp IN (7, 3)").count() == 0
        # maintenance reopened
        assert delete_from(spark, table, "grp = 1")["rows_deleted"] == N // 20

    def test_purge_noop_without_dvs(self, spark, table):
        assert purge_deletes(spark, table) == {
            "files_touched": 0,
            "files_added": 0,
            "rows_purged": 0,
        }

    def test_crash_between_commit_and_retirement(self, spark, table):
        """DVs left pointing at dead rels (the documented crash window)
        must keep reads exact and converge on the next purge without a
        rewrite."""
        delete_from_mor(spark, table, "grp = 7")
        import json

        dv_root = os.path.join(table, "_manifest", "deletes")
        dv_dir = next(
            d for d in os.listdir(dv_root) if d.startswith("dv-")
        )
        # simulate: the commit rewrote the files (purge) but retirement
        # didn't run — replay by copying the DV aside, purging, then
        # restoring the now-obsolete DV
        saved = os.path.join(str(table) + "_saved_dv")
        shutil.copytree(os.path.join(dv_root, dv_dir), saved)
        purge_deletes(spark, table)
        shutil.copytree(saved, os.path.join(dv_root, dv_dir))
        assert has_live_deletes(spark, table)  # guard closed again
        # dead-rel positions never anti-match: reads stay exact
        assert read_with_deletes(spark, table).count() == N - N // 20
        p = purge_deletes(spark, table)
        assert p == {
            "files_touched": 0,
            "files_added": 0,
            "rows_purged": 0,
        }
        assert not has_live_deletes(spark, table)

    def test_partitioned_roundtrip(self, spark, tmp_path):
        path = str(tmp_path / "ptbl")
        _mk(spark, path, partitioned=True)
        delete_from_mor(spark, path, "grp = 4")
        assert read_with_deletes(spark, path).count() == N - N // 20
        with pytest.raises(ValueError):
            purge_deletes(spark, path)  # partition_by required
        p = purge_deletes(spark, path, partition_by=["split"])
        assert p["rows_purged"] == N // 20
        df = spark.read.parquet(path)
        assert df.count() == N - N // 20
        assert set(df.select("split").distinct().toPandas()["split"]) == {
            "a",
            "b",
        }


class TestEqualityDeletes:
    def test_no_scan_delete_and_read(self, spark, table):
        from imitation_learning_data_pipeline_spark.pipeline.deletes import (
            delete_keys_mor,
        )

        before = {
            f for f in os.listdir(table) if f.endswith(".parquet")
        }
        r = delete_keys_mor(
            spark, table, "doc_id", ["doc-1", "doc-2", "doc-ghost"]
        )
        assert r == {"keys_recorded": 3, "dv_files": 1}
        # no data file touched
        assert {
            f for f in os.listdir(table) if f.endswith(".parquet")
        } == before
        got = read_with_deletes(spark, table)
        assert got.count() == N - 2  # ghost key matches nothing
        assert got.filter("doc_id IN ('doc-1','doc-2')").count() == 0

    def test_guard_and_manifest_honesty(self, spark, table):
        from imitation_learning_data_pipeline_spark.pipeline.deletes import (
            delete_keys_mor,
        )

        delete_keys_mor(spark, table, "doc_id", ["doc-7"])
        assert has_live_deletes(spark, table)
        with pytest.raises(PendingDeletesError):
            delete_from(spark, table, "grp = 1")
        # matched-row count unknowable without a scan: honest None
        assert manifest_row_count(spark, table) is None
        assert manifest_col_bounds(spark, table, "grp") is None

    def test_purge_resolves_equality(self, spark, table):
        from imitation_learning_data_pipeline_spark.pipeline.deletes import (
            delete_keys_mor,
        )

        delete_keys_mor(spark, table, "doc_id", ["doc-10", "doc-11"])
        p = purge_deletes(spark, table)
        assert p["rows_purged"] == 2
        assert not has_live_deletes(spark, table)
        df = spark.read.parquet(table)
        assert df.count() == N - 2
        assert df.filter("doc_id IN ('doc-10','doc-11')").count() == 0
        assert manifest_row_count(spark, table) == N - 2

    def test_mixed_positions_and_equality(self, spark, table):
        from imitation_learning_data_pipeline_spark.pipeline.deletes import (
            delete_keys_mor,
        )

        delete_from_mor(spark, table, "grp = 7")  # N//20 positions
        delete_keys_mor(spark, table, "doc_id", ["doc-0"])  # grp 0
        got = read_with_deletes(spark, table)
        assert got.count() == N - N // 20 - 1
        # positional delete after an equality delete: the eq-deleted
        # row can't re-match and re-count
        r = delete_from_mor(spark, table, "doc_id = 'doc-0' OR grp = 3")
        assert r["rows_deleted"] == N // 20  # grp=3 only
        p = purge_deletes(spark, table)
        assert p["rows_purged"] == 2 * (N // 20) + 1
        assert spark.read.parquet(table).count() == N - 2 * (N // 20) - 1

    def test_typed_key_column(self, spark, table):
        from imitation_learning_data_pipeline_spark.pipeline.deletes import (
            delete_keys_mor,
        )

        # long-typed key column: values cast through the table schema
        r = delete_keys_mor(spark, table, "grp", [4, 9])
        assert r["keys_recorded"] == 2
        got = read_with_deletes(spark, table)
        assert got.count() == N - 2 * (N // 20)
        assert got.filter("grp IN (4, 9)").count() == 0

    def test_uncastable_key_raises_not_ghost_dv(self, spark, table):
        """ADVICE r9: an uncastable key ('abc' against a LONG column)
        silently became NULL after the cast — counted in keys_recorded,
        never matched a row, parked a useless DV. Must raise, naming
        the offending inputs, and record nothing."""
        from imitation_learning_data_pipeline_spark.pipeline.deletes import (
            delete_keys_mor,
        )

        with pytest.raises(ValueError, match="'abc'"):
            delete_keys_mor(spark, table, "grp", [4, "abc"])
        assert not has_live_deletes(spark, table)
        # the castable-only call still works afterwards
        assert delete_keys_mor(spark, table, "grp", [4])[
            "keys_recorded"
        ] == 1

    def test_null_and_missing_col_refused(self, spark, table):
        from imitation_learning_data_pipeline_spark.pipeline.deletes import (
            delete_keys_mor,
        )

        with pytest.raises(ValueError):
            delete_keys_mor(spark, table, "doc_id", ["doc-1", None])
        with pytest.raises(ValueError):
            delete_keys_mor(spark, table, "nope", ["x"])
        with pytest.raises(ValueError, match="reserved"):
            delete_keys_mor(spark, table, "rel", ["x"])


class TestMorCli:
    def test_delete_mor_and_purge_verbs(self, spark, table, capsys):
        import json

        from imitation_learning_data_pipeline_spark.cli import main

        rc = main(
            ["delete", "--path", table, "--where", "grp = 5", "--mor"]
        )
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 0 and out["rows_deleted"] == N // 20
        assert has_live_deletes(spark, table)
        rc = main(["purge-deletes", "--path", table])
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 0 and out["rows_purged"] == N // 20
        assert not has_live_deletes(spark, table)
        assert spark.read.parquet(table).count() == N - N // 20

    def test_equality_keys_verb(self, spark, table, capsys):
        import json

        from imitation_learning_data_pipeline_spark.cli import main

        rc = main(
            [
                "delete",
                "--path",
                table,
                "--key-col",
                "doc_id",
                "--keys",
                "doc-5,doc-6",
            ]
        )
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 0 and out["keys_recorded"] == 2
        rc = main(["purge-deletes", "--path", table])
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 0 and out["rows_purged"] == 2
        assert spark.read.parquet(table).count() == N - 2


class TestMorMetadataIntegration:
    def test_manifest_reads_subtract(self, spark, table):
        write_blooms(spark, table, ["doc_id"])
        delete_from_mor(spark, table, "doc_id = 'doc-100'")
        assert read_where(spark, table, "doc_id = 'doc-100'").count() == 0
        assert read_where(spark, table, "doc_id = 'doc-101'").count() == 1
        assert (
            read_via_manifest(spark, table)
            .filter("doc_id = 'doc-100'")
            .count()
            == 0
        )

    def test_metadata_counts(self, spark, table):
        assert manifest_row_count(spark, table) == N
        assert manifest_col_bounds(spark, table, "grp") == (0, 19)
        delete_from_mor(spark, table, "grp = 19")
        assert manifest_row_count(spark, table) == N - N // 20
        # extremes may sit in deleted rows: honest None under live DVs
        assert manifest_col_bounds(spark, table, "grp") is None
        purge_deletes(spark, table)
        assert manifest_row_count(spark, table) == N - N // 20
        assert manifest_col_bounds(spark, table, "grp") == (0, 18)
