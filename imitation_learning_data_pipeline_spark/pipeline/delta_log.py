"""Pure-filesystem Delta transaction-log reader (no delta-spark).

The matview bridge needs three facts about a Delta base: the LIVE data
file set (with sizes), whether any live file carries a DELETION VECTOR,
and the table configuration (DV enablement, column mapping). All three
live in the transaction log — ``_delta_log/*.json`` commits plus
parquet checkpoints — whose format is the public Delta protocol spec
(github.com/delta-io/delta/blob/master/PROTOCOL.md). Reading the log
directly means:

- the bridge works (or refuses loudly) even when the delta-spark
  package is NOT installed — previously ``is_delta_table`` silently
  returned False and the raw directory walk double-folded tombstoned
  (pre-vacuum) files;
- file sizes come from the ``add`` actions instead of one
  ``getFileStatus`` RPC per file (50k-file table = 50k driver-blocking
  HEADs on S3);
- deletion vectors are detected on the LIVE snapshot (``add`` actions
  carrying a ``deletionVector``), not just via the
  ``delta.enableDeletionVectors`` property — turning the property off
  does NOT drop existing DVs, so a property-only guard waves through
  exactly the stale-DV corpus it exists to refuse.

Replay: start from the newest parquet checkpoint named by
``_last_checkpoint`` (all parts read in one spark.read.parquet — row
order within a checkpoint is irrelevant, it is a snapshot), then apply
the JSON commits AFTER it in version order (driver-side line parse;
the post-checkpoint tail is bounded by the checkpoint interval,
default 10 commits). Unsupported layouts (v2 uuid checkpoints) raise
rather than guess.
"""

from __future__ import annotations

import json
from urllib.parse import unquote

from pyspark.sql import SparkSession

from .compact import _fs


def _jvm_path(spark):
    return spark.sparkContext._jvm.org.apache.hadoop.fs.Path


def _log_dir(path: str) -> str:
    return f"{path.rstrip('/')}/_delta_log"


def has_delta_log(spark: SparkSession, path: str) -> bool:
    """True when ``path`` carries a Delta transaction log — a plain
    filesystem check, independent of whether delta-spark is
    installed."""
    fs, _ = _fs(spark, path)
    return bool(fs.exists(_jvm_path(spark)(_log_dir(path))))


def _read_small_file(spark, fs, jpath) -> bytes:
    """Whole-file read through the JVM (py4j byte[] args are copies, so
    a chunked read loop cannot work — the repo's history/locks readers
    use the same commons-io shape)."""
    stream = fs.open(jpath)
    try:
        jvm = spark.sparkContext._jvm
        return bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
    finally:
        stream.close()


def read_delta_snapshot(spark: SparkSession, path: str) -> dict:
    """Replay the log to the CURRENT snapshot:
    ``{"files": {rel_path: {"size": int, "dv": bool}},
    "configuration": {...}, "version": int}``. Paths are URI-decoded
    and relative to the table root (absolute add paths are kept
    verbatim)."""
    fs, _ = _fs(spark, path)
    jpath = _jvm_path(spark)
    log = _log_dir(path)
    if not fs.exists(jpath(log)):
        raise ValueError(f"delta_log: no _delta_log under {path}")

    names = sorted(
        st.getPath().getName() for st in fs.listStatus(jpath(log))
    )
    files: dict[str, dict] = {}
    config: dict = {}
    start_version = -1

    # checkpoint: prefer _last_checkpoint, but it is a best-effort HINT
    # per the protocol (its write can fail/lag) — fall back to the
    # newest classic single-part checkpoint visible in the listing, so
    # an expired-commit prefix cannot silently vanish from the replay
    # just because the hint file is stale or absent.
    v = parts = None
    if "_last_checkpoint" in names:
        meta = json.loads(
            _read_small_file(spark, fs, jpath(f"{log}/_last_checkpoint")).decode("utf-8")
        )
        v = int(meta["version"])
        parts = int(meta.get("parts") or 1)
    else:
        classic = [
            int(n.split(".")[0])
            for n in names
            if n.endswith(".checkpoint.parquet") and n.split(".")[0].isdigit()
        ]
        if classic:
            v, parts = max(classic), 1
    if v is not None:
        if parts == 1:
            cp_files = [f"{log}/{v:020d}.checkpoint.parquet"]
        else:
            cp_files = [
                f"{log}/{v:020d}.checkpoint.{i + 1:010d}.{parts:010d}.parquet"
                for i in range(parts)
            ]
        missing = [p for p in cp_files if not fs.exists(jpath(p))]
        if missing:
            raise ValueError(
                f"delta_log: _last_checkpoint names version {v} but "
                f"{missing[0]} is absent — unsupported checkpoint layout "
                "(v2/uuid checkpoints are not implemented here)"
            )
        cp = spark.read.parquet(*cp_files)
        cols = {f.name for f in cp.schema.fields}
        add_fields = (
            {f.name for f in cp.schema["add"].dataType.fields}
            if "add" in cols
            else set()
        )
        if "add" in cols:
            dv_expr = (
                "add.deletionVector IS NOT NULL"
                if "deletionVector" in add_fields
                else "false"
            )
            for r in cp.selectExpr(
                "add.path AS p", "add.size AS sz", f"{dv_expr} AS dv"
            ).where("add IS NOT NULL").collect():
                files[unquote(r["p"])] = {"size": int(r["sz"]), "dv": bool(r["dv"])}
        if "metaData" in cols:
            for r in (
                cp.selectExpr("metaData.configuration AS c")
                .where("metaData IS NOT NULL")
                .collect()
            ):
                if r["c"] is not None:
                    config = dict(r["c"])
        start_version = v

    # JSON commits after the checkpoint, in version order
    commits = []
    for n in names:
        if n.endswith(".json") and n[:-5].isdigit():
            ver = int(n[:-5])
            if ver > start_version:
                commits.append((ver, n))
    last_version = start_version
    expected = start_version + 1
    sorted_commits = sorted(commits)
    if sorted_commits and sorted_commits[0][0] != expected:
        raise ValueError(
            f"delta_log: commit chain is not contiguous — replay starts "
            f"at version {expected} but the oldest surviving commit is "
            f"{sorted_commits[0][0]:020d}.json (log-retention expiry "
            f"past the last checkpoint?); refusing a silently "
            f"incomplete snapshot of {path}"
        )
    for ver, n in sorted_commits:
        if ver != expected:
            raise ValueError(
                f"delta_log: commit chain gap — expected version "
                f"{expected}, found {n}; refusing a silently incomplete "
                f"snapshot of {path}"
            )
        expected = ver + 1
        payload = _read_small_file(spark, fs, jpath(f"{log}/{n}")).decode("utf-8")
        for line in payload.splitlines():
            line = line.strip()
            if not line:
                continue
            action = json.loads(line)
            if "add" in action:
                a = action["add"]
                files[unquote(a["path"])] = {
                    "size": int(a["size"]),
                    "dv": a.get("deletionVector") is not None,
                }
            elif "remove" in action:
                files.pop(unquote(action["remove"]["path"]), None)
            elif "metaData" in action:
                config = dict(action["metaData"].get("configuration") or {})
        last_version = ver
    return {"files": files, "configuration": config, "version": last_version}
