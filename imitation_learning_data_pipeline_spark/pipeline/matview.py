"""Incremental materialized views: CREATE + REFRESH on plain parquet.

The reference recomputes its stats stage over the whole corpus every
run; a 100 TB deployment needs the warehouse primitive instead — a
MATERIALIZED VIEW whose refresh cost is proportional to NEW DATA, not
corpus size. This module composes two machines the repo already
trusts: the rollup store (plans/rollup.py — mergeable per-group
partials, journaled folds, replay fencing) and file-listing state
(which files of the base table have been aggregated so far).

- ``create_matview(base, mv_path, spec...)`` bootstraps: one pass over
  the CURRENT base files computes the partials, lands them as a
  plain-layout rollup store under ``mv_path``, and records the
  processed file list + spec in ``_mv_state.json`` (atomic tmp+rename).
- ``refresh_matview(mv_path)`` lists the base NOW, diffs against the
  processed list, computes partials over ONLY the new files, and
  journal-folds them in with ``batch_id = refresh_seq``. Cost ∝ new
  bytes: an append-only base that grew 0.1% refreshes for 0.1% of the
  bootstrap cost, EVERY time, forever.
- ``read_matview(mv_path)`` finalizes the store (n/sum/avg/min/max/
  var, HLL distinct estimates, histogram quantiles — whatever the
  spec declared).

Exactly-once under crashes, by composition: the fold is the rollup
store's journaled commit, fenced by its ``last_batch`` watermark. The
state file advances strictly AFTER the fold commits — a crash between
them replays the SAME new files under the SAME batch_id, which the
fence turns into a no-op before the state finally advances. No crash
ordering double-counts a file.

Base-mutation honesty: incremental refresh is sound only for an
APPEND-ONLY base (insert_into / new ingest files). A base file that
DISAPPEARED or CHANGED SIZE means COW DML or compaction rewrote
history under the view; the diff cannot unwind already-folded rows,
so refresh raises ``BaseMutatedError`` by default. Pass
``on_base_mutation="rebuild"`` to recompute from scratch (the honest
fallback — same cost as CREATE), mirroring how warehouse engines
invalidate views on non-append changes.

Deployment mapping: Materialize / TimescaleDB continuous aggregates /
Databricks incremental MVs; on a table format the "processed files"
state is the snapshot id the last refresh read.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from .compact import _acquire_lock, _fs, _lock_path

_STATE = "_mv_state.json"


class BaseMutatedError(RuntimeError):
    """The base table was rewritten (not appended) under a matview."""


def _jvm_path(spark):
    return spark.sparkContext._jvm.org.apache.hadoop.fs.Path


def _list_base_files(spark: SparkSession, base: str) -> dict[str, int]:
    """{rel path: size} for every live data file under ``base`` —
    metadata-only (one listing), the same hidden-segment rules as the
    DML file discovery."""
    from .merge import _list_data_files

    fs, _ = _fs(spark, base)
    jvm_path = _jvm_path(spark)
    root = fs.makeQualified(jvm_path(base)).toString().rstrip("/")
    out = {}
    for p, jp in _list_data_files(fs, jvm_path, base).values():
        rel = p[len(root) + 1 :] if p.startswith(root + "/") else jp.getName()
        out[rel] = int(fs.getFileStatus(jp).getLen())
    return out


def _read_state(spark: SparkSession, mv_path: str) -> dict:
    fs, _ = _fs(spark, mv_path)
    jvm_path = _jvm_path(spark)
    jp = jvm_path(f"{mv_path}/{_STATE}")
    if not fs.exists(jp):
        raise FileNotFoundError(f"matview state missing under {mv_path}")
    jvm = spark.sparkContext._jvm
    stream = fs.open(jp)
    raw = bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
    stream.close()
    return json.loads(raw.decode())


def _write_state(spark: SparkSession, mv_path: str, state: dict) -> None:
    fs, _ = _fs(spark, mv_path)
    jvm_path = _jvm_path(spark)
    tmp = jvm_path(f"{mv_path}/.{_STATE}.tmp")
    stream = fs.create(tmp, True)
    stream.write(bytearray(json.dumps(state).encode()))
    stream.close()
    dst = jvm_path(f"{mv_path}/{_STATE}")
    fs.delete(dst, False)
    if not fs.rename(tmp, dst):
        raise IOError(f"matview: could not commit state under {mv_path}")


def _guard_no_base_dvs(spark: SparkSession, base: str, op: str) -> None:
    """Live deletion vectors on the base are invisible to the file
    diff (MOR deletes touch no files), so the view would silently
    aggregate deleted rows forever — refuse, like every other op that
    would trust stale bytes. ``purge_deletes`` first."""
    from .deletes import has_live_deletes

    if has_live_deletes(spark, base):
        raise BaseMutatedError(
            f"{op}: base {base} has live deletion vectors — the view "
            "would aggregate deleted rows (MOR deletes are invisible to "
            "the file diff); run purge_deletes() on the base first"
        )


def _partials(spark: SparkSession, spec: dict, df: DataFrame) -> DataFrame:
    from ..plans.rollup import rollup_partials

    qcols = (
        {k: tuple(v) for k, v in spec["quantile_cols"].items()}
        if spec.get("quantile_cols")
        else None
    )
    return rollup_partials(
        df,
        spec["group_cols"],
        spec["metrics"],
        time_col=spec.get("time_col"),
        grain=spec.get("grain", "day"),
        distinct_cols=spec.get("distinct_cols"),
        quantile_cols=qcols,
        n_bins=spec.get("n_bins", 64),
    )


def create_matview(
    spark: SparkSession,
    base: str,
    mv_path: str,
    group_cols: list[str],
    metrics: list[str],
    time_col: str | None = None,
    grain: str = "day",
    distinct_cols: list[str] | None = None,
    quantile_cols: dict[str, tuple[float, float]] | None = None,
    n_bins: int = 64,
    n_buckets: int = 64,
) -> dict:
    """Bootstrap the view: aggregate the base's CURRENT files into a
    plain-layout rollup store at ``mv_path`` and record spec + the
    processed file list. Returns {files_processed, refresh_seq}."""
    from ..plans.rollup import write_rollup_store

    base = base.rstrip("/")
    mv_path = mv_path.rstrip("/")
    _guard_no_base_dvs(spark, base, "create_matview")
    spec = {
        "base": base,
        "group_cols": list(group_cols),
        "metrics": list(metrics),
        "time_col": time_col,
        "grain": grain,
        "distinct_cols": list(distinct_cols) if distinct_cols else None,
        "quantile_cols": (
            {k: list(v) for k, v in quantile_cols.items()}
            if quantile_cols
            else None
        ),
        "n_bins": n_bins,
    }
    files = _list_base_files(spark, base)
    if not files:
        raise ValueError(f"create_matview: no data files under {base}")
    df = spark.read.option("basePath", base).parquet(
        *[f"{base}/{rel}" for rel in sorted(files)]
    )
    write_rollup_store(_partials(spark, spec, df), mv_path, n_buckets=n_buckets)
    state = {"spec": spec, "processed": files, "refresh_seq": 0}
    _write_state(spark, mv_path, state)
    from .history import log_event

    log_event(
        spark, mv_path, "create_matview", {"files_processed": len(files)}
    )
    return {"files_processed": len(files), "refresh_seq": 0}


def refresh_matview(
    spark: SparkSession,
    mv_path: str,
    on_base_mutation: str = "error",
    stale_lock_s: float | None = None,
) -> dict:
    """Incremental refresh: fold ONLY base files that appeared since
    the last refresh. Returns {files_new, files_total, refresh_seq,
    rebuilt}. Crash-safe by fold-then-state ordering (module doc)."""
    from ..plans.rollup import fold_rollup_into_store

    if on_base_mutation not in ("error", "rebuild"):
        raise ValueError("on_base_mutation must be 'error' or 'rebuild'")
    mv_path = mv_path.rstrip("/")
    state = _read_state(spark, mv_path)
    spec = state["spec"]
    _guard_no_base_dvs(spark, spec["base"], "refresh_matview")
    current = _list_base_files(spark, spec["base"])
    processed = state["processed"]
    mutated = [
        rel
        for rel in processed
        if rel not in current or current[rel] != processed[rel]
    ]
    if mutated:
        if on_base_mutation == "error":
            raise BaseMutatedError(
                f"refresh_matview: {len(mutated)} already-aggregated base "
                f"file(s) were rewritten or removed (e.g. {mutated[0]!r}) — "
                "incremental refresh cannot unwind folded rows; pass "
                "on_base_mutation='rebuild' to recompute from scratch"
            )
        return rebuild_matview(spark, mv_path)
    new = sorted(rel for rel in current if rel not in processed)
    seq = int(state["refresh_seq"]) + 1
    if new:
        base = spec["base"]
        df = spark.read.option("basePath", base).parquet(
            *[f"{base}/{rel}" for rel in new]
        )
        # fold first, state second: a crash in between replays the same
        # files under the same batch_id and the store fence no-ops it
        fold_rollup_into_store(
            spark,
            mv_path,
            _partials(spark, spec, df),
            batch_id=seq,
            stale_lock_s=stale_lock_s,
        )
        state["processed"] = {**processed, **{r: current[r] for r in new}}
        state["refresh_seq"] = seq
        _write_state(spark, mv_path, state)
    out = {
        "files_new": len(new),
        "files_total": len(current),
        "refresh_seq": seq if new else int(state["refresh_seq"]),
        "rebuilt": False,
    }
    from .history import log_event

    log_event(spark, mv_path, "refresh_matview", out)
    return out


def rebuild_matview(spark: SparkSession, mv_path: str) -> dict:
    """Full recompute (the base-mutation fallback): re-bootstrap from
    the base's current files, keeping the spec. Same cost as CREATE."""
    import uuid as _uuid

    from ..plans.rollup import write_rollup_store

    mv_path = mv_path.rstrip("/")
    state = _read_state(spark, mv_path)
    spec = state["spec"]
    base = spec["base"]
    _guard_no_base_dvs(spark, base, "rebuild_matview")
    files = _list_base_files(spark, base)
    df = spark.read.option("basePath", base).parquet(
        *[f"{base}/{rel}" for rel in sorted(files)]
    )
    parts = _partials(spark, spec, df)
    fs, _ = _fs(spark, mv_path)
    jvm_path = _jvm_path(spark)
    _acquire_lock(spark, fs, jvm_path, mv_path, "rebuild_matview")
    try:
        # stage the new store beside, then swap: readers of the old
        # store stay consistent until the rename
        tmp = f"{mv_path}__mv_tmp_{_uuid.uuid4().hex[:8]}"
        write_rollup_store(parts, tmp)
        old = f"{mv_path}__mv_old"
        fs.delete(jvm_path(old), True)
        # the maintenance lock is a SIBLING of mv_path (compact.py
        # convention), so everything inside except the state file and
        # dot-temps is store content
        for name in [
            st.getPath().getName()
            for st in fs.listStatus(jvm_path(mv_path))
            if st.getPath().getName() != _STATE
            and not st.getPath().getName().startswith(".")
        ]:
            fs.mkdirs(jvm_path(old))
            fs.rename(jvm_path(f"{mv_path}/{name}"), jvm_path(f"{old}/{name}"))
        for name in [
            st.getPath().getName() for st in fs.listStatus(jvm_path(tmp))
        ]:
            fs.rename(jvm_path(f"{tmp}/{name}"), jvm_path(f"{mv_path}/{name}"))
        fs.delete(jvm_path(tmp), True)
        fs.delete(jvm_path(old), True)
        seq = int(state["refresh_seq"]) + 1
        state.update({"processed": files, "refresh_seq": seq})
        _write_state(spark, mv_path, state)
    finally:
        fs.delete(jvm_path(_lock_path(mv_path)), False)
    out = {
        "files_new": len(files),
        "files_total": len(files),
        "refresh_seq": seq,
        "rebuilt": True,
    }
    from .history import log_event

    log_event(spark, mv_path, "rebuild_matview", out)
    return out


def read_matview(spark: SparkSession, mv_path: str) -> DataFrame:
    """The view's current aggregate (finalized rollup read)."""
    from ..plans.rollup import read_rollup

    return read_rollup(spark, mv_path.rstrip("/"))
