"""Row-level MERGE INTO for plain parquet via file-level copy-on-write.

The r5 gap: ``upsert_manifest`` (discover.py) gives chunk-partition
granularity — a changed row rewrites its whole chunk partition. The
reference's own roadmap names a transactional table format as the next
substrate (``README.md:164-187``); this operator supplies the core of
what Delta/Iceberg's MERGE does, on plain parquet, the way those
engines actually execute it:

1. find the data files that contain at least one matched key
   (semi-join on ``_metadata.file_path`` — a file-pruning pass whose
   output is metadata-sized: file paths, not rows);
2. rewrite ONLY those files: surviving rows (anti-join on the key) plus
   all update rows, written to a staging dir;
3. commit by moving the staged files in, then deleting the replaced
   files.

Untouched files are never read twice, never rewritten, and keep their
bytes/mtimes — on a 100 TB table a merge touching 0.1% of keys
rewrites ~0.1% of files (times clustering), not the table and not the
key's whole partition.

What this does NOT give is a serializable commit: plain parquet has no
manifest to flip, so between "new files added" and "old files deleted"
a concurrent reader can see matched keys twice. The window is
file-count-sized (metadata ops), loss-free in both directions
(add-then-delete: no state ever drops rows), and SELF-HEALING: if a
merge crashes mid-commit, re-running the same merge converges — the
duplicated old-version rows live in files that still contain matched
keys, so the retry selects and rewrites them away. A real multi-writer
deployment should flip a Delta/Iceberg manifest instead (SCALING.md
documents the mapping); single-writer pipelines — the reference's
deployment model — get exact MERGE semantics from this operator alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .compact import _fs, _rm


def _key_cols(key: str | list[str]) -> list[str]:
    return [key] if isinstance(key, str) else list(key)


def merge_into(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key: str | list[str],
    partition_by: list[str] | None = None,
) -> dict:
    """MERGE ``updates`` into the parquet dataset at ``path`` on ``key``:
    matched rows are replaced (WHEN MATCHED UPDATE SET *), unmatched
    update rows are inserted (WHEN NOT MATCHED INSERT *). Only data
    files containing a matched key are rewritten.

    ``partition_by`` names the Hive partition columns of the target
    layout (staged files are routed into the same subdirectories);
    omitting it on a Hive-partitioned target raises rather than
    corrupting the tree with flat files. Update rows must be unique per
    key — MERGE's own precondition. Returns {files_touched, files_added,
    rows_matched (update keys present in the target), rows_inserted}.
    """
    path = path.rstrip("/")
    keys = _key_cols(key)
    fs, jpath = _fs(spark, path)
    jvm_path = spark.sparkContext._jvm.org.apache.hadoop.fs.Path
    tmp = f"{path}__merge_tmp"
    _rm(fs, jvm_path, tmp)  # stranded staging from a crashed run

    if not partition_by:
        # a partitioned tree merged without partition routing would get
        # flat files at the root and conflicting directory depths —
        # detect `col=` first-level dirs and refuse up front
        for st in fs.listStatus(jvm_path(path)):
            if st.isDirectory() and "=" in st.getPath().getName():
                raise ValueError(
                    f"merge_into: {path} is Hive-partitioned "
                    f"({st.getPath().getName()}/...); pass partition_by="
                    "[...] so staged files keep the layout"
                )

    target = spark.read.parquet(path)
    out_cols = target.columns
    upd = updates.select(*out_cols).persist()
    try:
        upd_keys = upd.select(*keys).distinct()
        n_keys = upd_keys.count()

        with_file = target.select("*", F.col("_metadata.file_path").alias("__file"))
        touched = sorted(
            r["__file"]
            for r in with_file.join(upd_keys, keys, "left_semi")
            .select("__file")
            .distinct()
            .collect()
        )

        keys_matched = 0
        if touched:
            # rewrite = survivors of the touched files + every update
            # row. Only the touched files are re-read; the anti join's
            # left side is therefore sized by the merge, not the table.
            # basePath keeps Hive partition columns resolvable when
            # reading leaf files directly out of a partitioned tree.
            touched_rows = (
                spark.read.option("basePath", path)
                .parquet(*touched)
                .select(*out_cols)
                .persist()
            )
            # matched = update KEYS found in the target (key-based, so
            # duplicate-key targets can't drive rows_inserted negative)
            keys_matched = upd_keys.join(
                touched_rows, keys, "left_semi"
            ).count()
            # coalesce (no shuffle) to the replaced-file count: a merge
            # must not fragment the table — N touched files → ~N files
            staged = (
                touched_rows.join(upd_keys, keys, "left_anti")
                .unionByName(upd)
                .coalesce(len(touched))
            )
        else:
            staged = upd

        writer = staged.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(tmp)
        if touched:
            touched_rows.unpersist()
    finally:
        upd.unpersist()

    # commit: move staged part files into the live tree (part file names
    # carry a fresh UUID — no collision with live files), then drop the
    # replaced files. Metadata-only ops; see module docstring for the
    # visibility window and crash-retry convergence.
    root = fs.makeQualified(jvm_path(tmp)).toString().rstrip("/")
    it = fs.listFiles(jvm_path(tmp), True)
    moved = 0
    while it.hasNext():
        st = it.next()
        p = st.getPath().toString()
        name = p.rsplit("/", 1)[-1]
        if not name.endswith(".parquet") or name.startswith(("_", ".")):
            continue
        rel = p[len(root) + 1 :]
        dest = jvm_path(f"{path}/{rel}")
        fs.mkdirs(dest.getParent())
        if not fs.rename(jvm_path(p), dest):
            raise IOError(f"merge_into: could not move {p} into {path}")
        moved += 1
    for f in touched:
        fs.delete(jvm_path(f), False)
    _rm(fs, jvm_path, tmp)

    return {
        "files_touched": len(touched),
        "files_added": moved,
        "rows_matched": keys_matched,
        "rows_inserted": n_keys - keys_matched,
    }


def cluster_write(
    df: DataFrame,
    path: str,
    by: str | list[str],
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` key-clustered: range-partitioned AND sorted by
    ``by``, so each output file covers a disjoint key range and its
    parquet min/max footer statistics actually prune.

    This is the layout-maintenance half of the MERGE story (and of any
    selective-read story): on a hash-scattered layout k random merge
    keys touch ~k files, while on a range-clustered layout a contiguous
    key range collapses into ~1 touched file — the plain-parquet
    equivalent of Delta/Iceberg OPTIMIZE before MERGE. Also what makes
    key-predicate scans skip row groups via min/max.

    ``repartitionByRange`` samples the key distribution, so output
    files are balanced by ROWS even under key skew (quantile cuts, not
    modular hashing).
    """
    keys = _key_cols(by)
    if n_files:
        ranged = df.repartitionByRange(n_files, *keys)
    else:
        ranged = df.repartitionByRange(*keys)
    ranged.sortWithinPartitions(*keys).write.mode(mode).parquet(path)
