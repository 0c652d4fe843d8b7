"""Table-format adapter (pipeline/table_format.py, r9 verdict item 7).

Two halves with different runtime requirements:
- plain-parquet routing: runs everywhere (it's the existing DML stack
  behind the adapter's verb surface);
- Delta routing: a full roundtrip that runs wherever delta-spark is
  pip-installed, and SKIPS loudly here (the sandbox has no pip) — the
  skip marker is the documented deployment seam, mirroring the
  real-ffprobe arm in test_media_real.py.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from imitation_learning_data_pipeline_spark.pipeline.table_format import (
    delta_available,
    delta_session_configs,
    is_delta_table,
    table_dml,
)


def _rows(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )


class TestPlainRouting:
    def test_auto_detect_and_verb_surface(self, spark, tmp_path):
        t = str(tmp_path / "t")
        h = table_dml(spark, t)
        assert h.format == "parquet"  # no delta log → plain routing
        h.create(_rows(spark, 0, 100))
        h.insert_into(_rows(spark, 100, 150))
        assert h.read().count() == 150
        h.merge_into(
            spark.createDataFrame([(0, 999), (500, 1)], "k long, v long"),
            key="k",
        )
        got = {r.k: r.v for r in h.read().collect()}
        assert got[0] == 999 and got[500] == 1 and len(got) == 151
        h.delete_from("k >= 100 AND k < 150")
        h.update_where("k = 1", {"v": "v + 40"})
        got = {r.k: r.v for r in h.read().collect()}
        assert len(got) == 101 and got[1] == 42
        h.compact()
        assert {r.k: r.v for r in h.read().collect()} == got
        # history() has DataFrame parity with DeltaTable.history():
        # every DML verb above logged one event
        ops = [r.op for r in h.history().collect()]
        for expected in ("insert", "merge_into", "delete_from",
                         "update_where", "compact"):
            assert expected in ops, ops
        assert h.history().columns  # non-empty schema
        # vacuum needs the manifest as its liveness reference on plain
        # parquet (Delta's log plays that role natively) — the raise is
        # the documented seam, and with a manifest the verb routes clean
        with pytest.raises(ValueError, match="no manifest"):
            h.vacuum(retention_hours=1.0)
        from imitation_learning_data_pipeline_spark.pipeline.manifest import (
            write_manifest,
        )

        write_manifest(spark, t)
        h.vacuum(retention_hours=1.0)
        assert {r.k: r.v for r in h.read().collect()} == got

    def test_history_empty_table(self, spark, tmp_path):
        t = str(tmp_path / "empty")
        h = table_dml(spark, t)
        h.create(_rows(spark, 0, 5))
        # create() writes no history event — the frame is empty, not an error
        assert h.history().count() == 0

    def test_force_unknown_format_rejected(self, spark, tmp_path):
        with pytest.raises(ValueError, match="unknown format"):
            table_dml(spark, str(tmp_path / "x"), format="hudi")

    def test_iceberg_identifier_validation(self, spark, tmp_path):
        # A filesystem path is not an Iceberg address — catch the
        # misuse before any JVM/jar interaction.
        with pytest.raises(ValueError, match="catalog identifier"):
            table_dml(spark, str(tmp_path / "x"), format="iceberg")

    def test_iceberg_forced_without_jar_raises_descriptively(self, spark):
        from imitation_learning_data_pipeline_spark.pipeline.table_format import (
            iceberg_available,
        )

        if iceberg_available(spark):
            pytest.skip("iceberg runtime jar present; ImportError arm is moot")
        with pytest.raises(ImportError, match="iceberg-spark-runtime"):
            table_dml(spark, "local.db.t", format="iceberg")

    def test_delta_forced_without_install_raises_descriptively(
        self, spark, tmp_path
    ):
        if delta_available():
            pytest.skip("delta-spark installed; the ImportError arm is moot")
        with pytest.raises(ImportError, match="delta-spark"):
            table_dml(spark, str(tmp_path / "x"), format="delta")
        # and auto-detect degrades to plain, never crashes
        assert not is_delta_table(spark, str(tmp_path / "x"))


@pytest.mark.skipif(
    not delta_available(),
    reason="delta-spark not installed — Delta roundtrip runs in "
    "deployments that pip-install it (see module docstring)",
)
class TestDeltaRouting:
    @pytest.fixture(scope="class")
    def dspark(self):
        from pyspark.sql import SparkSession

        b = (
            SparkSession.builder.master("local[4]")
            .appName("delta-adapter-test")
            .config("spark.sql.shuffle.partitions", "4")
        )
        for k, v in delta_session_configs().items():
            b = b.config(k, v)
        s = b.getOrCreate()
        yield s

    def test_delta_roundtrip(self, dspark, tmp_path):
        t = str(tmp_path / "dt")
        h = table_dml(dspark, t, format="delta")
        h.create(_rows(dspark, 0, 100))
        assert is_delta_table(dspark, t)
        # auto-detect now routes to delta
        h = table_dml(dspark, t)
        assert h.format == "delta"
        h.insert_into(_rows(dspark, 100, 150))
        h.merge_into(
            dspark.createDataFrame([(0, 999), (500, 1)], "k long, v long"),
            key="k",
        )
        h.delete_from("k >= 100 AND k < 150")
        h.update_where("k = 1", {"v": "v + 40"})
        got = {r.k: r.v for r in h.read().collect()}
        assert len(got) == 101 and got[0] == 999 and got[1] == 42
        # time travel: version 0 is the create
        assert h.read(version=0).count() == 100
        h.compact()
        assert len(h.history().collect()) >= 5


@pytest.mark.skipif(
    not __import__(
        "imitation_learning_data_pipeline_spark.pipeline.table_format",
        fromlist=["iceberg_jar_present"],
    ).iceberg_jar_present(),
    reason="no iceberg-spark-runtime jar — the Iceberg roundtrip runs in "
    "deployments that vendor the jar (tools/vendor_table_formats.py); "
    "this sandbox has no network, so the binding is jar-gated exactly "
    "like the Delta half is import-gated",
)
class TestIcebergRouting:
    @pytest.fixture(scope="class")
    def ispark(self, tmp_path_factory):
        from pyspark.sql import SparkSession

        from imitation_learning_data_pipeline_spark.pipeline.table_format import (
            iceberg_session_configs,
            vendor_jars,
        )

        wh = str(tmp_path_factory.mktemp("icewh"))
        b = (
            SparkSession.builder.master("local[4]")
            .appName("iceberg-adapter-test")
            .config("spark.sql.shuffle.partitions", "4")
        )
        jars = vendor_jars(("iceberg",))
        if jars:
            b = b.config("spark.jars", ",".join(jars))
        for k, v in iceberg_session_configs(warehouse=wh).items():
            b = b.config(k, v)
        yield b.getOrCreate()

    def test_iceberg_roundtrip(self, ispark):
        h = table_dml(ispark, "local.db.t", format="iceberg")
        h.create(_rows(ispark, 0, 100))
        v0 = h._last_metrics()["version"]  # snapshot id of the create
        h.insert_into(_rows(ispark, 100, 150))
        h.merge_into(
            ispark.createDataFrame([(0, 999), (500, 1)], "k long, v long"),
            key="k",
        )
        h.delete_from("k >= 100 AND k < 150")
        h.update_where("k = 1", {"v": "v + 40"})
        got = {r.k: r.v for r in h.read().collect()}
        assert len(got) == 101 and got[0] == 999 and got[1] == 42
        # time travel: the create snapshot still reads 100 rows
        assert h.read(version=int(v0)).count() == 100
        h.compact()
        assert {r.k: r.v for r in h.read().collect()} == got
        assert h.history().count() >= 5


@pytest.mark.skipif(
    not delta_available(),
    reason="delta-spark not installed — the matview-on-Delta bridge "
    "runs wherever the Delta roundtrip does",
)
class TestMatviewDeltaBridge:
    """r10 verdict item 10: a Delta base's transaction log (not a
    directory walk) feeds the matview refresh file list."""

    @pytest.fixture(scope="class")
    def dspark(self):
        from pyspark.sql import SparkSession

        b = (
            SparkSession.builder.master("local[4]")
            .appName("delta-matview-test")
            .config("spark.sql.shuffle.partitions", "4")
        )
        for k, v in delta_session_configs().items():
            b = b.config(k, v)
        yield b.getOrCreate()

    def _base_rows(self, spark, lo, hi):
        return spark.range(lo, hi).selectExpr("id % 4 AS grp", "CAST(id AS DOUBLE) AS v")

    def test_refresh_folds_exactly_log_additions(self, dspark, tmp_path):
        from imitation_learning_data_pipeline_spark.pipeline.matview import (
            create_matview,
            read_matview,
            refresh_matview,
        )

        base = str(tmp_path / "base")
        mv = str(tmp_path / "mv")
        h = table_dml(dspark, base, format="delta")
        h.create(self._base_rows(dspark, 0, 100))
        create_matview(dspark, base, mv, ["grp"], ["v"])
        # Delta append = new files in the log; refresh folds ONLY them.
        h.insert_into(self._base_rows(dspark, 100, 140))
        r = refresh_matview(dspark, mv)
        assert r["files_new"] >= 1 and not r["rebuilt"]
        got = {
            row["grp"]: (row["v_n"], row["v_sum"])
            for row in read_matview(dspark, mv).collect()
        }
        want = {
            row["grp"]: (row["n"], row["s"])
            for row in self._base_rows(dspark, 0, 140)
            .groupBy("grp")
            .agg(F.count("v").alias("n"), F.sum("v").alias("s"))
            .collect()
        }
        assert got == want

    def test_delete_rewrite_detected_as_mutation(self, dspark, tmp_path):
        from imitation_learning_data_pipeline_spark.pipeline.matview import (
            BaseMutatedError,
            create_matview,
            read_matview,
            refresh_matview,
        )

        base = str(tmp_path / "base2")
        mv = str(tmp_path / "mv2")
        h = table_dml(dspark, base, format="delta")
        h.create(self._base_rows(dspark, 0, 50))
        create_matview(dspark, base, mv, ["grp"], ["v"])
        # DELETE on a DV-less Delta table rewrites files -> the log's
        # live set changes -> mutation, exactly like plain parquet.
        h.delete_from("v < 10")
        with pytest.raises(BaseMutatedError):
            refresh_matview(dspark, mv)
        r = refresh_matview(dspark, mv, on_base_mutation="rebuild")
        assert r["rebuilt"]
        got = {
            row["grp"]: row["v_n"] for row in read_matview(dspark, mv).collect()
        }
        assert sum(got.values()) == 40
