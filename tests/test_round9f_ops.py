"""Round-9 incremental materialized views (pipeline/matview.py):
bootstrap equality, refresh cost ∝ new files (inputFiles-asserted),
base-mutation honesty, crash-window replay fencing, quantile state."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from imitation_learning_data_pipeline_spark.pipeline.matview import (
    BaseMutatedError,
    create_matview,
    read_matview,
    refresh_matview,
)
from imitation_learning_data_pipeline_spark.pipeline.merge import insert_into


def _rows(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("doc_id"),
        (F.col("id") % 4).alias("grp"),
        (F.col("id") % 100 / 2.0).alias("v"),
    )


@pytest.fixture()
def mv(spark, tmp_path):
    base = str(tmp_path / "base")
    path = str(tmp_path / "mv")
    _rows(spark, 0, 4000).repartition(4).write.parquet(base)
    create_matview(
        spark,
        base,
        path,
        ["grp"],
        ["v"],
        quantile_cols={"v": (0.0, 50.0)},
        n_bins=25,
    )
    return base, path


def _expected(spark, base):
    return {
        r["grp"]: (r["n"], round(r["s"], 6))
        for r in spark.read.parquet(base)
        .groupBy("grp")
        .agg(F.count("v").alias("n"), F.sum("v").alias("s"))
        .collect()
    }


def _got(spark, path):
    return {
        r["grp"]: (r["v_n"], round(r["v_sum"], 6))
        for r in read_matview(spark, path).collect()
    }


class TestMatview:
    def test_bootstrap_matches_direct_aggregate(self, spark, mv):
        base, path = mv
        assert _got(spark, path) == _expected(spark, base)
        # quantile state is live too
        row = read_matview(spark, path).first()
        assert row["v_p50"] is not None and 0 <= row["v_p50"] <= 50

    def test_refresh_folds_only_new_files(self, spark, mv):
        base, path = mv
        insert_into(spark, base, _rows(spark, 4000, 5000))
        r = refresh_matview(spark, path)
        assert r["files_new"] >= 1 and not r["rebuilt"]
        assert _got(spark, path) == _expected(spark, base)

    def test_refresh_reads_only_new_bytes(self, spark, mv):
        """The incremental claim itself: the refresh's partials job must
        touch ONLY the appended files."""
        from imitation_learning_data_pipeline_spark.pipeline import matview as m

        base, path = mv
        import os

        before = set(os.listdir(base))
        insert_into(spark, base, _rows(spark, 4000, 4100))
        new_files = {
            f
            for f in os.listdir(base)
            if f.endswith(".parquet") and f not in before
        }
        seen = {}
        orig = m._partials

        def spy(spark_, spec, df):
            seen["files"] = {p.rsplit("/", 1)[-1] for p in df.inputFiles()}
            return orig(spark_, spec, df)

        m._partials = spy
        try:
            refresh_matview(spark, path)
        finally:
            m._partials = orig
        assert seen["files"] == new_files

    def test_noop_refresh(self, spark, mv):
        base, path = mv
        r1 = refresh_matview(spark, path)
        assert r1["files_new"] == 0
        assert _got(spark, path) == _expected(spark, base)

    def test_base_mutation_detected(self, spark, mv):
        from imitation_learning_data_pipeline_spark.pipeline.merge import (
            delete_from,
        )

        base, path = mv
        delete_from(spark, base, "grp = 1")  # COW rewrite of base files
        with pytest.raises(BaseMutatedError):
            refresh_matview(spark, path)
        r = refresh_matview(spark, path, on_base_mutation="rebuild")
        assert r["rebuilt"]
        assert _got(spark, path) == _expected(spark, base)
        assert 1 not in _got(spark, path)

    def test_cli_roundtrip(self, spark, tmp_path, capsys):
        import json

        from imitation_learning_data_pipeline_spark.cli import main

        base = str(tmp_path / "cbase")
        path = str(tmp_path / "cmv")
        _rows(spark, 0, 1000).write.parquet(base)
        rc = main(
            [
                "matview",
                "--path",
                path,
                "--create",
                "--base",
                base,
                "--group",
                "grp",
                "--metrics",
                "v",
            ]
        )
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 0 and out["files_processed"] >= 1
        insert_into(spark, base, _rows(spark, 1000, 1200))
        rc = main(["matview", "--path", path, "--refresh"])
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 0 and out["files_new"] >= 1
        rc = main(["matview", "--path", path])
        rows = [
            json.loads(line)
            for line in capsys.readouterr().out.strip().splitlines()
        ]
        assert rc == 0 and len(rows) == 4
        assert sum(r["v_n"] for r in rows) == 1200

    def test_base_with_live_dvs_refused(self, spark, mv, tmp_path):
        """MOR deletes touch no files, so the file diff can't see them —
        the view would aggregate deleted rows forever. All three entry
        points must refuse until the base is purged."""
        from imitation_learning_data_pipeline_spark.pipeline.deletes import (
            delete_from_mor,
            purge_deletes,
        )
        from imitation_learning_data_pipeline_spark.pipeline.matview import (
            create_matview,
            rebuild_matview,
        )

        base, path = mv
        delete_from_mor(spark, base, "grp = 2")
        with pytest.raises(BaseMutatedError, match="deletion vectors"):
            refresh_matview(spark, path)
        with pytest.raises(BaseMutatedError, match="deletion vectors"):
            rebuild_matview(spark, path)
        with pytest.raises(BaseMutatedError, match="deletion vectors"):
            create_matview(
                spark, base, str(tmp_path / "mv2"), ["grp"], ["v"]
            )
        # purge resolves the DVs to a rewrite → the mutation detector
        # takes over, and rebuild restores exactness
        purge_deletes(spark, base)
        with pytest.raises(BaseMutatedError, match="rewritten or removed"):
            refresh_matview(spark, path)
        r = refresh_matview(spark, path, on_base_mutation="rebuild")
        assert r["rebuilt"]
        assert _got(spark, path) == _expected(spark, base)

    def test_crash_between_fold_and_state_is_fenced(self, spark, mv):
        """Fold committed, state write crashed: the replayed refresh
        re-folds the same files under the same batch_id — the store
        fence must make it a no-op, not a double-count."""
        from imitation_learning_data_pipeline_spark.pipeline import matview as m

        base, path = mv
        insert_into(spark, base, _rows(spark, 4000, 4500))
        orig = m._write_state
        calls = {"n": 0}

        def crash_once(spark_, mv_path_, state_):
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("injected crash before state commit")
            return orig(spark_, mv_path_, state_)

        m._write_state = crash_once
        try:
            with pytest.raises(RuntimeError, match="injected crash"):
                refresh_matview(spark, path)
        finally:
            m._write_state = orig
        # replay: same new files, same batch_id → fenced fold, state
        # finally advances, totals exact
        r = refresh_matview(spark, path)
        assert r["files_new"] >= 1
        assert _got(spark, path) == _expected(spark, base)
        # and a third refresh is a clean no-op
        assert refresh_matview(spark, path)["files_new"] == 0
