"""Transactional table-format adapter: the repo's DML verbs on Delta
Lake OSS (r9 verdict item 7 — "the largest remaining gap between this
repo and a deployable 100 TB system").

WHY. The plain-parquet DML family (merge.py, deletes.py, manifest.py,
bloom.py, locks.py) implements its own commit protocol: journaled
staged commits, a single-writer maintenance lock, driver-side manifest
stats/bloom skipping. That stack is honest about its two deployment
limits — (1) Spark's scan resolution can't consume the manifest's
pruning without a JVM FileIndex (SCALING.md "manifest-fed scan path"),
and (2) multi-writer safety on object stores needs conditional writes
(locks.py closes most of it; a table format closes all of it). A
transactional format owns BOTH: the log IS the file index (data
skipping happens inside the scan), and optimistic concurrency replaces
the lock. The reference's own roadmap names this endgame: Spark on EMR
Serverless + Iceberg on S3 (/root/reference/README.md:164-187). Delta
is the adapter's first binding only because delta-spark is a plain pip
install with no catalog service; the verb mapping is format-agnostic
and an Iceberg binding would be the same shape.

WHAT. :func:`table_dml` returns a handle whose verbs match the repo's
plain-parquet functions one-for-one, routing to Delta when the path is
a Delta table (or ``format="delta"`` is forced) and to the existing
plain implementations otherwise — callers switch storage formats
without changing call sites:

    repo verb (plain parquet)     Delta delegation
    -------------------------     -------------------------------------
    merge.insert_into             df.write.format("delta").mode("append")
    merge.merge_into              DeltaTable.merge (upsert, all-columns)
    merge.delete_from             DeltaTable.delete(predicate)
    merge.update_where            DeltaTable.update(predicate, set)
    deletes.purge_deletes         (not needed: Delta MOR DVs are purged
                                   by OPTIMIZE; exposed as optimize())
    compact.compact               OPTIMIZE (optionally ZORDER BY)
    manifest.vacuum_orphans       DeltaTable.vacuum(retention_hours)
    snapshot.*                    time travel (versionAsOf) + history()

The manifest/bloom layer is BYPASSED on Delta tables by design: the
format's own transaction log carries per-file min/max stats that the
scan consumes natively — exactly the capability the driver-side
manifest could not hand to Spark's scan resolution on object stores.

SESSION. Delta needs two configs at session-build time; an existing
session cannot be retrofitted. Build with::

    from imitation_learning_data_pipeline_spark.pipeline.table_format import (
        delta_session_configs,
    )
    b = SparkSession.builder.master(...)
    for k, v in delta_session_configs().items():
        b = b.config(k, v)

Everything here is import-gated: without delta-spark installed the
plain-parquet routing still works and the Delta routing raises a
descriptive ImportError. The roundtrip test
(tests/test_table_format.py) runs wherever ``pip install delta-spark``
has happened and SKIPS (loudly) elsewhere.

ICEBERG (r10 verdict item 1). The reference's own roadmap is Spark +
Iceberg on S3 (/root/reference/README.md:164-187), so the adapter now
carries an Iceberg binding with the SAME verb surface, jar-gated the
same way Delta is import-gated. Iceberg tables are catalog-addressed
(``catalog.namespace.table``), not path-addressed — that IS the
format's model (the catalog provides the atomic metadata-pointer swap
that Delta gets from its _delta_log directory), so ``table_dml`` takes
the identifier when ``format="iceberg"``. Session build::

    b = SparkSession.builder.master(...)
    for k, v in iceberg_session_configs(warehouse="/data/wh").items():
        b = b.config(k, v)
    # plus the runtime jar: spark.jars=<iceberg-spark-runtime-*.jar>
    # (tools/vendor_table_formats.py downloads pinned jars into
    # vendor/, and vendor_jars() hands them to the builder)

Verb mapping (all through Spark SQL — Iceberg's DML is native Spark
SQL once the extension is loaded):

    repo verb          Iceberg delegation
    ---------          ----------------------------------------------
    create             df.writeTo(ident).using("iceberg").create()
    insert_into        df.writeTo(ident).append()
    merge_into         MERGE INTO ident t USING src s ON ... UPDATE/INSERT *
    delete_from        DELETE FROM ident WHERE ...
    update_where       UPDATE ident SET ... WHERE ...
    compact            CALL catalog.system.rewrite_data_files (sort/zorder)
    vacuum             CALL catalog.system.expire_snapshots + remove_orphan_files
    read(version)      SELECT * FROM ident VERSION AS OF <snapshot-id|tag>
    history            SELECT * FROM ident.history (metadata table)
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession


def delta_available() -> bool:
    try:
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


def _require_delta():
    try:
        from delta.tables import DeltaTable

        return DeltaTable
    except ImportError as exc:
        raise ImportError(
            "table_format: this operation routes to Delta Lake but "
            "delta-spark is not installed (pip install delta-spark, and "
            "build the session with delta_session_configs())"
        ) from exc


def delta_session_configs() -> dict[str, str]:
    """The two session-build configs delta-spark requires."""
    return {
        "spark.sql.extensions": "io.delta.sql.DeltaSparkSessionExtension",
        "spark.sql.catalog.spark_catalog": (
            "org.apache.spark.sql.delta.catalog.DeltaCatalog"
        ),
    }


def vendor_jars(kinds: tuple[str, ...] = ("iceberg", "delta")) -> list[str]:
    """Jars under ``<repo>/vendor`` matching the requested formats —
    what ``tools/vendor_table_formats.py`` downloads. Hand the result
    to ``spark.jars`` (comma-joined) at session build."""
    vendor = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "vendor")
    if not os.path.isdir(vendor):
        return []
    return sorted(
        os.path.join(vendor, f)
        for f in os.listdir(vendor)
        if f.endswith(".jar") and any(k in f for k in kinds)
    )


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime jar is on this session's
    classpath (jar-gated, the Delta import-gate's twin)."""
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.Table")
        return True
    except Exception:
        return False


def iceberg_jar_present() -> bool:
    """Collection-time check (no JVM): an iceberg-spark-runtime jar in
    pyspark's jars dir, vendor/, or $SPARK_CLASSPATH. Used by the
    skipif gate so the roundtrip test can skip loudly without building
    a session first."""
    import pyspark

    candidates = [os.path.join(os.path.dirname(pyspark.__file__), "jars")]
    candidates += [p for p in os.environ.get("SPARK_CLASSPATH", "").split(":") if p]
    vendor = vendor_jars(("iceberg",))
    if vendor:
        return True
    for d in candidates:
        if os.path.isdir(d) and any(
            "iceberg-spark-runtime" in f for f in os.listdir(d)
        ):
            return True
    return False


def iceberg_session_configs(
    warehouse: str, catalog: str = "local"
) -> dict[str, str]:
    """Session-build configs for a Hadoop-catalog Iceberg deployment
    (filesystem-atomic metadata swap — the zero-service flavor; swap
    ``type`` for ``rest``/``glue`` etc. in real deployments)."""
    return {
        "spark.sql.extensions": (
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
        ),
        f"spark.sql.catalog.{catalog}": "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{catalog}.type": "hadoop",
        f"spark.sql.catalog.{catalog}.warehouse": warehouse,
    }


_IDENT_RE = re.compile(r"^[A-Za-z0-9_]+(\.[A-Za-z0-9_]+){1,2}$")


class _IcebergDML:
    """Iceberg routing for the repo's DML verb surface. ``ident`` is a
    catalog identifier (``catalog.namespace.table``); every verb is
    native Spark SQL, so the binding is jar-gated, not import-gated
    (there is no Python package — the runtime jar carries everything).
    """

    format = "iceberg"

    def __init__(self, spark: SparkSession, ident: str):
        if not _IDENT_RE.match(ident):
            raise ValueError(
                "table_dml(format='iceberg') takes a catalog identifier "
                f"(catalog.namespace.table), got {ident!r} — Iceberg tables "
                "are catalog-addressed; configure the catalog with "
                "iceberg_session_configs()"
            )
        if not iceberg_available(spark):
            raise ImportError(
                "table_format: this operation routes to Iceberg but no "
                "iceberg-spark-runtime jar is on the session classpath "
                "(run tools/vendor_table_formats.py, then build the "
                "session with spark.jars=','.join(vendor_jars()) and "
                "iceberg_session_configs())"
            )
        self.spark = spark
        self.ident = ident
        parts = ident.split(".")
        self.catalog = parts[0] if len(parts) == 3 else "spark_catalog"
        self.table = ".".join(parts[1:]) if len(parts) == 3 else ident

    def _last_metrics(self) -> dict:
        row = (
            self.spark.sql(
                f"SELECT snapshot_id, operation, summary FROM "
                f"{self.ident}.snapshots ORDER BY committed_at DESC LIMIT 1"
            ).first()
        )
        if row is None:
            return {"operation": "none"}
        return {
            "version": row["snapshot_id"],
            "operation": row["operation"],
            **dict(row["summary"] or {}),
        }

    def read(self, version: int | str | None = None) -> DataFrame:
        if version is not None:
            # snapshot id (long) or a named tag/branch — both are
            # VERSION AS OF citizens in Iceberg's Spark SQL.
            v = str(version) if isinstance(version, int) else f"'{version}'"
            return self.spark.sql(f"SELECT * FROM {self.ident} VERSION AS OF {v}")
        return self.spark.read.table(self.ident)

    def create(self, df: DataFrame) -> dict:
        df.writeTo(self.ident).using("iceberg").create()
        return self._last_metrics()

    def insert_into(self, df: DataFrame) -> dict:
        df.writeTo(self.ident).append()
        return self._last_metrics()

    def merge_into(self, source: DataFrame, key: str | list[str]) -> dict:
        import uuid

        keys = [key] if isinstance(key, str) else list(key)
        cond = " AND ".join(f"t.`{k}` <=> s.`{k}`" for k in keys)
        # unique per call: two concurrent merges in one session must not
        # clobber each other's source view between create and MERGE
        view = f"__tf_merge_src_{uuid.uuid4().hex}"
        source.createOrReplaceTempView(view)
        try:
            self.spark.sql(
                f"MERGE INTO {self.ident} t USING {view} s ON {cond} "
                "WHEN MATCHED THEN UPDATE SET * "
                "WHEN NOT MATCHED THEN INSERT *"
            )
        finally:
            self.spark.catalog.dropTempView(view)
        return self._last_metrics()

    def delete_from(self, predicate: str) -> dict:
        self.spark.sql(f"DELETE FROM {self.ident} WHERE {predicate}")
        return self._last_metrics()

    def update_where(self, predicate: str, set_exprs: dict[str, str]) -> dict:
        sets = ", ".join(f"`{k}` = {v}" for k, v in set_exprs.items())
        self.spark.sql(f"UPDATE {self.ident} SET {sets} WHERE {predicate}")
        return self._last_metrics()

    def compact(self, zorder_by: list[str] | None = None) -> dict:
        if zorder_by:
            cols = ", ".join(zorder_by)
            strategy = f"strategy => 'sort', sort_order => 'zorder({cols})'"
        else:
            strategy = "options => map('min-input-files', '2')"
        row = self.spark.sql(
            f"CALL {self.catalog}.system.rewrite_data_files("
            f"table => '{self.table}', {strategy})"
        ).first()
        return {"operation": "rewrite_data_files", **row.asDict()}

    def vacuum(self, retention_hours: float = 168.0) -> None:
        self.spark.sql(
            f"CALL {self.catalog}.system.expire_snapshots("
            f"table => '{self.table}', "
            f"older_than => now() - interval {int(retention_hours)} hours)"
        )
        self.spark.sql(
            f"CALL {self.catalog}.system.remove_orphan_files("
            f"table => '{self.table}', "
            f"older_than => now() - interval {int(retention_hours)} hours)"
        )

    def history(self) -> DataFrame:
        return self.spark.sql(f"SELECT * FROM {self.ident}.history")


def is_delta_table(spark: SparkSession, path: str) -> bool:
    if not delta_available():
        return False
    from delta.tables import DeltaTable

    return bool(DeltaTable.isDeltaTable(spark, path))


class _DeltaDML:
    """Delta routing for the repo's DML verb surface."""

    format = "delta"

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path.rstrip("/")

    def _dt(self):
        return _require_delta().forPath(self.spark, self.path)

    def _last_metrics(self) -> dict:
        row = (
            self._dt()
            .history(1)
            .select("version", "operation", "operationMetrics")
            .first()
        )
        return {
            "version": row["version"],
            "operation": row["operation"],
            **dict(row["operationMetrics"] or {}),
        }

    def read(self, version: int | None = None) -> DataFrame:
        r = self.spark.read.format("delta")
        if version is not None:
            r = r.option("versionAsOf", int(version))
        return r.load(self.path)

    def insert_into(self, df: DataFrame) -> dict:
        df.write.format("delta").mode("append").save(self.path)
        return self._last_metrics()

    def create(self, df: DataFrame) -> dict:
        df.write.format("delta").mode("errorifexists").save(self.path)
        return self._last_metrics()

    def merge_into(self, source: DataFrame, key: str | list[str]) -> dict:
        keys = [key] if isinstance(key, str) else list(key)
        cond = " AND ".join(f"t.`{k}` <=> s.`{k}`" for k in keys)
        (
            self._dt()
            .alias("t")
            .merge(source.alias("s"), cond)
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll()
            .execute()
        )
        return self._last_metrics()

    def delete_from(self, predicate: str) -> dict:
        self._dt().delete(predicate)
        return self._last_metrics()

    def update_where(self, predicate: str, set_exprs: dict[str, str]) -> dict:
        from pyspark.sql import functions as F

        self._dt().update(predicate, {k: F.expr(v) for k, v in set_exprs.items()})
        return self._last_metrics()

    def compact(self, zorder_by: list[str] | None = None) -> dict:
        opt = self._dt().optimize()
        if zorder_by:
            opt.executeZOrderBy(*zorder_by)
        else:
            opt.executeCompaction()
        return self._last_metrics()

    def vacuum(self, retention_hours: float = 168.0) -> None:
        self._dt().vacuum(retention_hours)

    def history(self) -> DataFrame:
        return self._dt().history()


class _PlainDML:
    """Plain-parquet routing: thin delegation to the existing modules,
    so one call-site shape covers both formats."""

    format = "parquet"

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path.rstrip("/")

    def read(self, version: int | str | None = None) -> DataFrame:
        if version is not None:
            # plain-parquet time travel is TAG-addressed (create_snapshot)
            from .snapshot import read_snapshot

            return read_snapshot(self.spark, self.path, str(version))
        from .deletes import read_with_deletes

        return read_with_deletes(self.spark, self.path)

    def insert_into(self, df: DataFrame) -> dict:
        from .merge import insert_into

        return insert_into(self.spark, self.path, df)

    def create(self, df: DataFrame) -> dict:
        df.write.mode("errorifexists").parquet(self.path)
        return {"operation": "create"}

    def merge_into(self, source: DataFrame, key: str | list[str]) -> dict:
        from .merge import merge_into

        return merge_into(self.spark, self.path, source, key)

    def delete_from(self, predicate: str) -> dict:
        from .merge import delete_from

        return delete_from(self.spark, self.path, predicate)

    def update_where(self, predicate: str, set_exprs: dict[str, str]) -> dict:
        from .merge import update_where

        return update_where(self.spark, self.path, predicate, set_exprs)

    def compact(self, zorder_by: list[str] | None = None) -> dict:
        from .compact import compact

        return compact(self.spark, self.path, zorder_by=zorder_by)

    def vacuum(self, retention_hours: float = 168.0) -> None:
        from .manifest import vacuum_orphans

        vacuum_orphans(self.spark, self.path, older_than_s=retention_hours * 3600)

    def history(self) -> DataFrame:
        # The _history dir is one small JSON file per event — read it
        # as a DataFrame for verb parity with DeltaTable.history().
        from .compact import _fs

        fs, _ = _fs(self.spark, self.path)
        jvm_path = self.spark.sparkContext._jvm.org.apache.hadoop.fs.Path
        d = f"{self.path}/_history"
        if not fs.exists(jvm_path(d)):
            return self.spark.createDataFrame([], "op string, ts_utc string")
        return self.spark.read.json(d).orderBy("ts_utc")


def table_dml(spark: SparkSession, path: str, format: str | None = None):
    """The adapter entry point: a DML handle for ``path``.

    ``format=None`` auto-detects (Delta log present → Delta, else plain
    parquet); ``"delta"``/``"parquet"``/``"iceberg"`` force a routing
    (Iceberg takes a ``catalog.namespace.table`` identifier, the
    format's native addressing). Call sites use one verb surface either
    way — the format becomes a deployment decision instead of a code
    change."""
    if format not in (None, "delta", "parquet", "iceberg"):
        raise ValueError(f"table_dml: unknown format {format!r}")
    if format == "iceberg":
        return _IcebergDML(spark, path)
    if format == "delta" or (format is None and is_delta_table(spark, path)):
        _require_delta()
        return _DeltaDML(spark, path)
    return _PlainDML(spark, path)
