"""Merge-on-read DELETE via deletion vectors: O(matched rows) deletes.

The copy-on-write ``delete_from`` (pipeline/merge.py) rewrites every
file containing a matched row — the right default for batch curation,
but the wrong cost model for high-frequency small deletes: removing
1,000 scattered doc_ids from a 100 TB table rewrites up to 1,000
full-size files (gigabytes of write amplification for kilobytes of
change). Deletion vectors flip the cost: a DELETE writes only the
(file, row_index) positions of the matched rows — bytes proportional
to ROWS MATCHED — and readers subtract them with an anti join. This is
Iceberg v2's position deletes / Delta's deletion vectors, at minimum
viable size for the repo's plain-parquet tables.

Mechanics:

- ``delete_from_mor(path, predicate)`` finds matched positions on the
  DV-aware frame (already-deleted rows can't re-match) using the same
  manifest/bloom file pre-cut as the COW find phase, then commits them
  as one parquet DV under ``_manifest/deletes/dv-<n>-<uuid>/``
  (written to a sibling tmp dir, ATOMIC directory rename in — a crash
  leaves only the tmp, swept by the next MOR op).
- ``read_with_deletes(path)`` is the MOR read: attach
  ``_metadata.file_path``/``row_index``, LEFT ANTI join the DV set on
  (relpath, row_index). DVs are metadata-sized (positions, not rows),
  so Spark's AQE broadcasts the anti join in the common case.
- ``purge_deletes(path)`` folds the DVs back into the data: rewrites
  ONLY the files that have deleted positions through the shared
  journaled copy-on-write commit (merge.py ``_commit_staged`` — crash
  recovery, snapshot retention, manifest/bloom deltas all apply),
  then retires the DV dir. Cost ∝ touched files — the same bill the
  COW delete would have paid, deferred to one batched maintenance op.

Composition rule (enforced, not documented-only): file-REWRITING ops
(merge_into / COW delete_from / update_where / compact / layout
rewrites / create_snapshot) raise :class:`PendingDeletesError` while
DVs are live — a rewrite re-materializes deleted rows from the old
bytes and silently resurrects them. ``purge_deletes`` first, then
maintain. ``insert_into`` is exempt (append-only: new files can't
collide with recorded positions). Plain ``spark.read.parquet`` of a
MOR table sees deleted rows by construction — same as reading an
Iceberg v2 table without applying its delete files; the manifest
read paths (``read_where`` / ``read_pruned`` / ``read_via_manifest``)
are all DV-aware.

Row-index stability: positions are valid only against the exact file
bytes they were computed from. The guard above is what makes this
sound — no live-DV file is ever rewritten in place, and DV commits
name files by manifest relpath, so a moved table root stays valid.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .compact import _fs

DV_DIR = "_manifest/deletes"


class PendingDeletesError(RuntimeError):
    """A file-rewriting op ran while deletion vectors are live."""


def _jvm_path(spark):
    return spark.sparkContext._jvm.org.apache.hadoop.fs.Path


def _dv_root(path: str) -> str:
    return f"{path.rstrip('/')}/{DV_DIR}"


def _qual_root(spark, fs, path: str) -> str:
    return fs.makeQualified(_jvm_path(spark)(path)).toString().rstrip("/")


def has_live_deletes(spark: SparkSession, path: str) -> bool:
    fs, _ = _fs(spark, path)
    root = _jvm_path(spark)(_dv_root(path))
    if not fs.exists(root):
        return False
    for st in fs.listStatus(root):
        if st.getPath().getName().startswith("dv-"):
            return True
    return False


def guard_no_pending_deletes(spark: SparkSession, path: str, op: str) -> None:
    """Raise when ``op`` would rewrite files out from under live DVs.
    Called by every COW maintenance op — rewriting a file that has
    recorded delete positions resurrects the deleted rows (the old
    bytes still contain them) and strands positions pointing at dead
    files."""
    if has_live_deletes(spark, path):
        raise PendingDeletesError(
            f"{op}: {path} has live deletion vectors ({DV_DIR}/dv-*) — "
            "run purge_deletes() first; rewriting files under live DVs "
            "would resurrect deleted rows"
        )


def _read_dv(spark: SparkSession, path: str) -> DataFrame | None:
    """The union of all live DV positions: (rel string, row_index
    long). None when the table has no DVs."""
    fs, _ = _fs(spark, path)
    root = _jvm_path(spark)(_dv_root(path))
    if not fs.exists(root):
        return None
    dirs = [
        st.getPath().toString()
        for st in fs.listStatus(root)
        if st.getPath().getName().startswith("dv-")
    ]
    if not dirs:
        return None
    return spark.read.parquet(*dirs)


def deleted_row_count(spark: SparkSession, path: str) -> int:
    """Live deleted-position count — a parquet COUNT(*) over the DV
    files, which Spark answers from footer metadata (no column I/O)."""
    dv = _read_dv(spark, path)
    return 0 if dv is None else dv.count()


def apply_deletes(spark: SparkSession, path: str, df: DataFrame) -> DataFrame:
    """Subtract live DV positions from a frame JUST read from
    ``path`` (the ``_metadata`` struct must still be resolvable, i.e.
    call this before any projection). No-op without DVs."""
    dv = _read_dv(spark, path)
    if dv is None:
        return df
    fs, _ = _fs(spark, path)
    qual = _qual_root(spark, fs, path)
    out_cols = df.columns
    keyed = df.withColumn(
        "__rel", F.expr(f"substring(_metadata.file_path, {len(qual) + 2})")
    ).withColumn("__idx", F.col("_metadata.row_index"))
    kept = keyed.join(
        dv.select(
            F.col("rel").alias("__rel"), F.col("row_index").alias("__idx")
        ),
        on=["__rel", "__idx"],
        how="left_anti",
    )
    return kept.select(*out_cols)


def read_with_deletes(spark: SparkSession, path: str) -> DataFrame:
    """The merge-on-read table read: plain parquet scan minus live DV
    positions. Identical to ``spark.read.parquet(path)`` when no DVs
    exist (the anti join isn't even planned)."""
    path = path.rstrip("/")
    return apply_deletes(spark, path, spark.read.parquet(path))


def delete_from_mor(
    spark: SparkSession,
    path: str,
    predicate,
    stale_lock_s: float | None = None,
) -> dict:
    """Row-level DELETE that writes positions, not files: find rows
    WHERE ``predicate`` IS TRUE on the DV-aware frame (rows already
    deleted cannot re-match, keeping counts exact), record their
    (relpath, row_index) as one new DV parquet, atomic directory
    rename in. SQL DELETE semantics — NULL-evaluating rows are kept.

    Cost ∝ rows matched (positions written) + the find scan, which
    pre-cuts its file set through manifest stats/blooms exactly like
    the COW find phase. No data file is touched; snapshots see nothing
    change. Returns {rows_deleted, dv_files}.
    """
    from .compact import _acquire_lock, _lock_path
    from .merge import _find_phase_source, _rm

    path = path.rstrip("/")
    fs, _ = _fs(spark, path)
    jvm_path = _jvm_path(spark)
    tmp = f"{path}__dv_tmp"
    _acquire_lock(spark, fs, jvm_path, path, "delete_from_mor", stale_lock_s)
    try:
        _rm(fs, jvm_path, tmp)  # sweep a crashed predecessor's staging
        pred = F.expr(predicate) if isinstance(predicate, str) else predicate
        hit = pred.isNotNull() & pred
        src = _find_phase_source(spark, path, predicate)
        if src is None:
            return {"rows_deleted": 0, "dv_files": 0}
        qual = _qual_root(spark, fs, path)
        # key the rows BEFORE subtracting prior DVs (the subtraction
        # projects _metadata away), so already-deleted rows can't
        # re-match and re-count
        keyed = src.select(
            F.expr(
                f"substring(_metadata.file_path, {len(qual) + 2})"
            ).alias("rel"),
            F.col("_metadata.row_index").alias("row_index"),
            hit.alias("__hit"),
        )
        prior = _read_dv(spark, path)
        if prior is not None:
            keyed = keyed.join(prior, on=["rel", "row_index"], how="left_anti")
        positions = keyed.filter(F.col("__hit")).select("rel", "row_index")
        positions.write.mode("overwrite").parquet(tmp)
        n = spark.read.parquet(tmp).count()
        if n == 0:
            _rm(fs, jvm_path, tmp)
            return {"rows_deleted": 0, "dv_files": 0}
        fs.mkdirs(jvm_path(_dv_root(path)))
        dest = jvm_path(f"{_dv_root(path)}/dv-{uuid.uuid4().hex}")
        if not fs.rename(jvm_path(tmp), dest):
            raise IOError(f"delete_from_mor: could not commit DV to {dest}")
        out = {"rows_deleted": int(n), "dv_files": 1}
    finally:
        fs.delete(jvm_path(_lock_path(path)), False)
    from .history import log_event

    log_event(spark, path, "delete_from_mor", out)
    return out


def purge_deletes(
    spark: SparkSession,
    path: str,
    partition_by: list[str] | None = None,
    stale_lock_s: float | None = None,
) -> dict:
    """Fold live DVs back into the data: rewrite ONLY the files with
    recorded positions (survivor rows kept, fully-deleted files simply
    dropped) through the shared journaled copy-on-write commit — so
    crash recovery, snapshot retention, and the manifest/bloom deltas
    all behave exactly as for a COW delete — then retire the DV dirs.
    After this, file-rewriting maintenance is legal again. Returns
    {files_touched, files_added, rows_purged}.
    """
    from .compact import _acquire_lock, _lock_path
    from .merge import _commit_staged, _recover_pending, _rm

    path = path.rstrip("/")
    fs, _ = _fs(spark, path)
    jvm_path = _jvm_path(spark)
    tmp = f"{path}__merge_tmp"
    _acquire_lock(spark, fs, jvm_path, path, "purge_deletes", stale_lock_s)
    try:
        _recover_pending(spark, fs, jvm_path, path, tmp)
        partitioned_dirs = [
            st.getPath().getName()
            for st in fs.listStatus(_jvm_path(spark)(path))
            if st.isDirectory() and "=" in st.getPath().getName()
        ]
        if partitioned_dirs and not partition_by:
            raise ValueError(
                f"purge_deletes: {path} is Hive-partitioned "
                f"({partitioned_dirs[0]}/...); pass partition_by=[...]"
            )
        if partition_by and not partitioned_dirs:
            raise ValueError(
                f"purge_deletes: {path} has a flat layout but partition_by="
                f"{partition_by} was given"
            )
        dv = _read_dv(spark, path)
        if dv is None:
            return {"files_touched": 0, "files_added": 0, "rows_purged": 0}
        all_rels = sorted(
            r["rel"] for r in dv.select("rel").distinct().collect()
        )
        # positions whose file no longer exists are leftovers of a
        # crash between a prior purge's commit and its DV drop — those
        # rows are ALREADY purged (the rewrite excluded them); the
        # obsolete positions no-op against reads (dead rels never
        # match) and are simply retired below with the rest
        touched_rels = [
            rel
            for rel in all_rels
            if fs.exists(jvm_path(f"{path}/{rel}"))
        ]
        moved = 0
        n_purged = 0
        if touched_rels:
            live = dv.filter(F.col("rel").isin(touched_rels))
            n_purged = live.count()
            qual = _qual_root(spark, fs, path)
            touched = [
                (f"{qual}/{rel}", jvm_path(f"{path}/{rel}"))
                for rel in touched_rels
            ]
            survivors = apply_deletes(
                spark,
                path,
                spark.read.option("basePath", path).parquet(
                    *[f"{path}/{rel}" for rel in touched_rels]
                ),
            )
            _rm(fs, jvm_path, tmp)
            writer = survivors.coalesce(len(touched_rels)).write.mode(
                "overwrite"
            )
            if partition_by:
                writer = writer.partitionBy(*partition_by)
            writer.parquet(tmp)
            moved = _commit_staged(spark, fs, jvm_path, path, tmp, touched)
        # DV retirement strictly AFTER the journaled commit: a crash
        # in between leaves rewritten files + DVs pointing at dead
        # rels — reads stay correct (dead rels never anti-match), the
        # maintenance guard stays closed, and the next purge_deletes
        # converges by retiring the obsolete DVs without a rewrite.
        # The reverse order would open a resurrection window (DVs
        # gone, old bytes still live).
        root = jvm_path(_dv_root(path))
        for st in fs.listStatus(root):
            if st.getPath().getName().startswith("dv-"):
                fs.delete(st.getPath(), True)
        out = {
            "files_touched": len(touched_rels),
            "files_added": moved,
            "rows_purged": int(n_purged),
        }
    finally:
        fs.delete(jvm_path(_lock_path(path)), False)
    from .history import log_event

    log_event(spark, path, "purge_deletes", out)
    return out
