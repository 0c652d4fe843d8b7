"""Local approximation of the driver's correctness gate.

Runs every ``queries()`` entry from __spark_entry__ at a given sf_dir and
compares against ``oracle_sql()`` via DuckDB: row count, sorted column
names, and an order-insensitive value hash (floats rounded, rows sorted).

Usage: python tools/check_contract.py [sf_dir] [name_filter ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
import time
import traceback

REPO = "/root/repo"
sys.path.insert(0, REPO)

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "∅"
    if isinstance(v, bool):
        return "T" if v else "F"
    if isinstance(v, float):
        if math.isinf(v):
            return "inf" if v > 0 else "-inf"
        r = round(v, 4)
        if r == int(r):
            return str(int(r))
        return f"{r:.4f}".rstrip("0")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


#: DuckDB types that pandas cannot materialize as the integer/float dtype the
#: driver's comparator expects: HUGEINT → float64 (so `1435` hashes as
#: `1435.0`), DECIMAL → object-of-Decimal (str() diverges from Spark floats).
_UNSAFE_ORACLE_TYPES = ("HUGEINT", "DECIMAL", "UHUGEINT")


def oracle_type_violations(rel) -> list[str]:
    """Return ``col:TYPE`` for every oracle output column whose DuckDB type
    would reach the driver's hash comparator as a lossy pandas dtype.

    Uses the relation's bound types only — no execution — so it is cheap
    enough to run over the full oracle registry in a pytest.
    """
    out = []
    for col, typ in zip(rel.columns, rel.types):
        t = str(typ).upper()
        if any(u in t for u in _UNSAFE_ORACLE_TYPES):
            out.append(f"{col}:{t}")
    return out


def frame_digest(pdf: pd.DataFrame) -> tuple[int, list[str], str]:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = sorted(
        "|".join(_norm_cell(v) for v in rec) for rec in pdf.itertuples(index=False)
    )
    h = hashlib.md5("\n".join(rows).encode()).hexdigest()
    return len(pdf), cols, h


def audit_float_cells(
    spdf: pd.DataFrame, opdf: pd.DataFrame
) -> dict[str, dict[str, float | int]]:
    """Cross-engine float-determinism audit for a hash-PASSING query.

    The digest normalizes floats via round(v, 4), so a PASS proves only
    that both engines landed on the same side of every 0.00005 boundary —
    it can be luck. Two stronger signals per float column:

    * ``n_bitdiff`` / ``max_absdiff``: raw cells compared after aligning
      rows by their normalized digest key. 0 bit-different cells ⇒ the
      engines produced IEEE-identical doubles ⇒ deterministic by
      construction. >0 ⇒ the PASS depended on rounding luck.
    * ``min_bdist``: min distance of |v·10⁴|'s fractional part from .5
      across both engines. < 1e-5 (i.e. v within 1e-9 of a digest
      boundary) ⇒ a last-ulp engine difference could flip the hash.

    Flag = (n_bitdiff > 0) AND (min_bdist < 1e-5): engines disagree at
    full precision AND some cell sits close enough to a boundary to flip.
    """
    out: dict[str, dict[str, float | int]] = {}
    cols = sorted(spdf.columns)
    float_cols = [
        c for c in cols
        if str(spdf[c].dtype).startswith("float") or str(opdf[c].dtype).startswith("float")
    ]
    if not float_cols:
        return out

    def keyed(pdf: pd.DataFrame) -> list[tuple[str, tuple]]:
        recs = list(pdf[cols].itertuples(index=False))
        return sorted(
            (("|".join(_norm_cell(v) for v in rec)), tuple(rec)) for rec in recs
        )

    srows, orows = keyed(spdf), keyed(opdf)
    idx = {c: cols.index(c) for c in float_cols}
    for c in float_cols:
        i = idx[c]
        n_bitdiff = 0
        max_absdiff = 0.0
        min_bdist = math.inf
        for (_, srec), (_, orec) in zip(srows, orows):
            sv, ov = srec[i], orec[i]
            for v in (sv, ov):
                if isinstance(v, float) and math.isfinite(v):
                    frac = abs(v) * 1e4
                    d = abs(frac - math.floor(frac) - 0.5)
                    if d < min_bdist:
                        min_bdist = d
            if isinstance(sv, float) and isinstance(ov, float):
                if math.isnan(sv) and math.isnan(ov):
                    continue
                if sv != ov:
                    n_bitdiff += 1
                    max_absdiff = max(max_absdiff, abs(sv - ov))
        out[c] = {
            "n": len(srows),
            "n_bitdiff": n_bitdiff,
            "max_absdiff": max_absdiff,
            "min_bdist": min_bdist,
        }
    return out


def main() -> int:
    args = [a for a in sys.argv[1:] if a not in ("--all", "--audit")]
    check_all = "--all" in sys.argv[1:]
    do_audit = "--audit" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    name_filter = args[1:]

    import __spark_entry__ as mod
    from imitation_learning_data_pipeline_spark.session import get_spark

    spark = get_spark("contract-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    if check_all:
        # full library registry, incl. queries excluded from the 50-slot
        # contract surface (their oracles are still authoritative)
        from imitation_learning_data_pipeline_spark.plans import ORACLES, QUERIES

        queries = dict(QUERIES)
        oracles = dict(ORACLES)
    else:
        queries = mod.queries()
        oracles = mod.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    failures: list[str] = []
    boundary_flags: list[tuple[str, str, dict]] = []
    n_audited_cols = 0
    for name, fn in queries.items():
        if name_filter and not any(f in name for f in name_filter):
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception:
            print(f"FAIL  {name}: spark raised")
            traceback.print_exc()
            n_fail += 1
            failures.append(name)
            continue
        if name not in oracles:
            print(f"rows-only  {name}: {len(spdf)} rows  ({time.time()-t0:.1f}s)")
            n_rows_only += 1
            continue
        try:
            rel = con.sql(oracles[name])
            bad = oracle_type_violations(rel)
            if bad:
                # DuckDB HUGEINT/DECIMAL reach pandas as float64/object, so
                # the driver hashes e.g. `1435.0` against Spark's `1435` and
                # fails even when values are identical. The local gate used
                # to mask this (round() collapses integral floats); now it
                # fails the same way the driver does. Fix the oracle: wrap
                # the projection in CAST(... AS BIGINT/DOUBLE).
                print(f"FAIL  {name}: oracle emits driver-unsafe types: {bad}")
                n_fail += 1
                failures.append(name)
                continue
            opdf = rel.df()
        except Exception:
            print(f"FAIL  {name}: duckdb oracle raised")
            traceback.print_exc()
            n_fail += 1
            failures.append(name)
            continue
        sn, sc, sh = frame_digest(spdf)
        on, oc, oh = frame_digest(opdf)
        ok = (sn, sc, sh) == (on, oc, oh)
        dt = time.time() - t0
        if ok:
            print(f"PASS  {name}: {sn} rows  ({dt:.1f}s)")
            n_pass += 1
            if do_audit:
                audit = audit_float_cells(spdf, opdf)
                n_audited_cols += len(audit)
                for col, a in audit.items():
                    flagged = a["n_bitdiff"] > 0 and a["min_bdist"] < 1e-5
                    tag = "BOUNDARY-FLAG" if flagged else "audit"
                    if flagged or a["n_bitdiff"] > 0:
                        print(
                            f"        {tag}  {name}.{col}: "
                            f"bitdiff={a['n_bitdiff']}/{a['n']} "
                            f"maxdiff={a['max_absdiff']:.3e} "
                            f"min_bdist={a['min_bdist']:.3e}"
                        )
                    if flagged:
                        boundary_flags.append((name, col, a))
        else:
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: spark=({sn} rows, {sc}, {sh[:8]}) "
                  f"oracle=({on} rows, {oc}, {oh[:8]})  ({dt:.1f}s)")
            if sc == oc and sn and on:
                # show a few differing rows to debug
                sset = {
                    "|".join(_norm_cell(v) for v in rec)
                    for rec in spdf[sorted(spdf.columns)].itertuples(index=False)
                }
                oset = {
                    "|".join(_norm_cell(v) for v in rec)
                    for rec in opdf[sorted(opdf.columns)].itertuples(index=False)
                }
                for label, diff in (
                    ("spark-only", sorted(sset - oset)[:3]),
                    ("oracle-only", sorted(oset - sset)[:3]),
                ):
                    for row in diff:
                        print(f"        {label}: {row[:200]}")
    print(
        f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only "
        f"of {len(queries)} queries"
    )
    if failures:
        print("failures:", " ".join(failures))
    if do_audit:
        if boundary_flags:
            print(f"\n{len(boundary_flags)} BOUNDARY-FLAGGED column(s):")
            for name, col, a in boundary_flags:
                print(f"  {name}.{col}: {a}")
        else:
            print(f"\nboundary audit: 0 flagged of {n_audited_cols} float columns")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
