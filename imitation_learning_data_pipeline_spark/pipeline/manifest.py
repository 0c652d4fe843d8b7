"""Live-file manifest: list-free reads for plain-parquet tables.

At 100 TB a table is O(100k-1M) parquet files; on an object store each
read starts with a recursive LIST that costs seconds-to-minutes and
(on S3-likes) only eventually-consistent results. Table formats solve
this by making the file SET metadata, not a directory walk — Delta's
transaction log, Iceberg's manifest lists. This module is that idea at
minimum viable size for the repo's journaled copy-on-write tables:

- ``_manifest/current.json`` holds the table's live data-file relpaths
  (+ sizes), written atomically (tmp + rename).
- Maintenance ops keep it fresh INCREMENTALLY: ``merge_into`` /
  ``delete_from`` / ``update_where`` commits apply their (add, delete)
  file deltas driver-side — O(touched files), no relisting.
  Compaction rewrites wholesale, so it refreshes wholesale.
- ``read_via_manifest`` builds the DataFrame from the manifest's
  explicit file list (``basePath`` option preserves Hive partition
  columns) — the file SET comes from one small JSON read instead of
  the recursive LIST.

Scope of the win (measured, see SCALING.md): the manifest removes the
LIST from everything that only needs the file set — consistency
verification, external consumers, vacuum/GC, the O(touched) commit
bookkeeping — and gives readers a point-in-time file set immune to
eventually-consistent or concurrently-mutating listings. Spark's OWN
scan of explicit paths still stats each file (PySpark exposes no hook
to feed a pre-built FileIndex), so ``read_via_manifest`` does not beat
a plain directory read on wall clock locally (measured ~1.0 s vs
~0.4 s resolving a 4,000-file table; explicit paths below the
parallel-discovery threshold additionally trigger a distributed
listing job). The full read-path win is exactly what Delta/Iceberg
readers deliver by consuming manifest stats natively — the deployment
mapping this module is the minimum viable local form of.

Crash window: the commit journal (``__pending_commit``) is the source
of truth. A crash after the journal lands but before the manifest
delta is applied leaves the manifest one commit behind; every journal
RECOVERY path therefore ends with a full refresh, and the reader
falls back to a listing read whenever a pending journal exists.

The manifest is OPT-IN per table: ``write_manifest`` bootstraps it;
tables without one pay zero cost (every hook is a no-op when the
manifest file is absent).

Deployment mapping: on Delta/Iceberg this whole module is subsumed by
the table format's own metadata layer (see SCALING.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .compact import _fs
from .snapshot import _live_rels, _read_json, _write_json

MANIFEST_DIR = "_manifest"
MANIFEST_REL = f"{MANIFEST_DIR}/current.json"

#: merge.py's journal name (duplicated to avoid a circular import; the
#: value is pinned by tests/test_round7d_ops.py).
_PENDING = "__merge_pending.json"


def _jvm_path(spark):
    return spark.sparkContext._jvm.org.apache.hadoop.fs.Path


def _manifest_path(path: str) -> str:
    return f"{path.rstrip('/')}/{MANIFEST_REL}"


def has_manifest(spark: SparkSession, path: str) -> bool:
    fs, _ = _fs(spark, path)
    return bool(fs.exists(_jvm_path(spark)(_manifest_path(path))))


def read_manifest_entries(spark: SparkSession, path: str) -> dict:
    """The raw manifest payload: {"files": [[rel, bytes], ...], "op": …}."""
    fs, _ = _fs(spark, path)
    return _read_json(spark, fs, _jvm_path(spark), _manifest_path(path))


def _refresh_unlocked(spark: SparkSession, path: str) -> dict:
    """Listing → manifest write, no locking: for callers already inside
    a locked maintenance op (compact's swap, journal recovery)."""
    path = path.rstrip("/")
    fs, _ = _fs(spark, path)
    jvm_path = _jvm_path(spark)
    files = _live_rels(spark, fs, jvm_path, path)
    payload = {"files": [list(t) for t in files], "op": "refresh"}
    _write_json(fs, jvm_path, _manifest_path(path), payload)
    return payload


def write_manifest(spark: SparkSession, path: str) -> dict:
    """Bootstrap or wholesale-refresh the manifest from one recursive
    listing — the LAST full LIST this table needs until compaction.

    Takes the table's maintenance lock: a bootstrap racing a concurrent
    merge could otherwise list mid-commit and persist a torn file set
    with no pending journal left to distrust it."""
    from .compact import _acquire_lock, _lock_path

    path = path.rstrip("/")
    fs, _ = _fs(spark, path)
    jvm_path = _jvm_path(spark)
    _acquire_lock(spark, fs, jvm_path, path, "write_manifest")
    try:
        return _refresh_unlocked(spark, path)
    finally:
        fs.delete(jvm_path(_lock_path(path)), False)


def refresh_if_present(spark: SparkSession, path: str) -> bool:
    """Wholesale refresh for ops that rewrite arbitrarily (compaction,
    journal recovery). Lock-free — every caller already holds the
    maintenance lock. No-op for tables that never opted in."""
    if not has_manifest(spark, path):
        return False
    _refresh_unlocked(spark, path)
    return True


def apply_deltas(
    spark: SparkSession,
    path: str,
    add: list[tuple[str, int]],
    delete: list[str],
) -> bool:
    """Fold a commit's file delta into the manifest driver-side:
    O(manifest) JSON rewrite, NO relisting. ``add`` = (relpath, bytes)
    of files moved in; ``delete`` = relpaths that left the live set
    (whether deleted or retired into a snapshot's retained tree).
    No-op when the table has no manifest."""
    path = path.rstrip("/")
    if not has_manifest(spark, path):
        return False
    fs, _ = _fs(spark, path)
    jvm_path = _jvm_path(spark)
    cur = _read_json(spark, fs, jvm_path, _manifest_path(path))
    dead = set(delete)
    files = [[r, b] for r, b in cur["files"] if r not in dead]
    files += [[r, int(b)] for r, b in add]
    files.sort()
    _write_json(
        fs, jvm_path, _manifest_path(path), {"files": files, "op": "delta"}
    )
    return True


def read_via_manifest(spark: SparkSession, path: str) -> DataFrame:
    """The list-free read: resolve the file set from the manifest and
    hand Spark the explicit paths (``basePath`` keeps Hive partition
    columns). Falls back to a plain listing read while a crashed
    commit's journal is pending — the one state where the manifest may
    trail the directory by one commit.

    NOT a performance feature on local/HDFS-class filesystems:
    measured at 4k/40k/100k files (SCALING.md round-9), the explicit-
    path read loses to the directory read at every size and diverges —
    Spark stats each explicit path individually while the directory
    read bulk-lists, and ``parallelPartitionDiscovery`` tuning doesn't
    change the ordering. Use it for correctness (pinned file sets,
    journal-aware reads); the object-store LIST win would need a JVM
    FileIndex that trusts the manifest's sizes, which PySpark exposes
    no hook for."""
    path = path.rstrip("/")
    fs, _ = _fs(spark, path)
    jvm_path = _jvm_path(spark)
    if fs.exists(jvm_path(f"{path}/{_PENDING}")):
        return spark.read.parquet(path)
    cur = read_manifest_entries(spark, path)
    if not cur["files"]:
        return spark.read.parquet(path)  # schema from the empty dir
    paths = [f"{path}/{rel}" for rel, _b in cur["files"]]
    return spark.read.option("basePath", path).parquet(*paths)


def verify_manifest(spark: SparkSession, path: str) -> dict:
    """Debug/CI helper: diff the manifest against an actual listing.
    Empty ``missing``/``extra`` = consistent."""
    path = path.rstrip("/")
    fs, _ = _fs(spark, path)
    jvm_path = _jvm_path(spark)
    listed = {r: b for r, b in _live_rels(spark, fs, jvm_path, path)}
    manifested = {r: b for r, b in read_manifest_entries(spark, path)["files"]}
    return {
        "missing": sorted(set(listed) - set(manifested)),
        "extra": sorted(set(manifested) - set(listed)),
        "n_files": len(listed),
    }
