"""Release gate: one pass/fail verdict over a corpus before export.

Production pipelines do not ship a training corpus because each audit
passed once in a notebook — they run a GATE in CI: every release
candidate is checked for split leakage, benchmark contamination,
privacy violations, and score drift, and the export job refuses on any
failure. This module composes the repo's audit operators into that
gate; each check is opt-in (run what you configured) and contributes
one entry to the report:

- ``leakage``   — plans/sampling.py::split_leakage_audit: zero
  near-dup pairs may cross a split boundary (unassigned pair members
  count as crossing — the audit cannot certify them).
- ``decontam``  — plans/dedup.py::decontam_overlap (or decontam_fuzzy):
  zero corpus documents may overlap the benchmark probe set.
- ``privacy``   — plans/privacy.py::k_anonymity_audit: zero
  k-anonymity violations over the declared quasi-identifiers.
- ``psi``       — plans/monitor.py::psi_against_baseline: the score
  distribution must sit below the PSI alert threshold vs the persisted
  reference baseline.

Scale shape: nothing new — every check is an already-graded plan
(banded pair search, broadcast probe joins, one QI aggregate, O(batch)
bucket counts); the gate just sequences them and reduces each to a
metric + verdict.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_PSI_ALERT = 0.25


def release_gate(
    spark: SparkSession,
    docs: DataFrame,
    splits: DataFrame | None = None,
    probe: DataFrame | None = None,
    decontam_fuzzy_mode: bool = False,
    quasi_cols: list[str] | None = None,
    sensitive_col: str | None = None,
    k: int = 3,
    psi_baseline_path: str | None = None,
    score_col: str = "score",
    psi_threshold: float = _PSI_ALERT,
) -> dict:
    """Run every configured check → ``{"pass": bool, "checks": {name:
    {"pass": bool, metric...}}}``. ``docs`` is the release candidate
    ``(doc_id, text[, score...])``; at least one check must be
    configured (an all-skip gate passing would be a lie)."""
    checks: dict[str, dict] = {}

    if splits is not None:
        from ..plans.sampling import split_leakage_audit

        rows = split_leakage_audit(docs, splits).collect()
        cross = sum(
            r["n_cross_pairs"]
            for r in rows
            if (r["split_a"], r["split_b"]) != ("__total__", "__total__")
        )
        total = sum(
            r["n_cross_pairs"]
            for r in rows
            if (r["split_a"], r["split_b"]) == ("__total__", "__total__")
        )
        checks["leakage"] = {
            "pass": cross == 0,
            "cross_pairs": int(cross),
            "total_near_dup_pairs": int(total),
        }

    if probe is not None:
        from ..plans.dedup import decontam_fuzzy, decontam_overlap

        if decontam_fuzzy_mode:
            hits = decontam_fuzzy(docs, probe).select("doc_id").distinct().count()
        else:
            hits = decontam_overlap(docs, probe).count()
        checks["decontam"] = {"pass": hits == 0, "contaminated_docs": int(hits)}

    if quasi_cols:
        if sensitive_col is None:
            raise ValueError("release_gate: quasi_cols needs sensitive_col")
        from ..plans.privacy import k_anonymity_audit

        agg = k_anonymity_audit(docs, quasi_cols, sensitive_col, k=k).agg(
            F.sum("k_violation").alias("kv"),
            F.sum(F.col("class_size") * F.col("k_violation")).alias("rows"),
        ).collect()[0]
        checks["privacy"] = {
            "pass": int(agg["kv"] or 0) == 0,
            "k": k,
            "k_violations": int(agg["kv"] or 0),
            "rows_at_risk": int(agg["rows"] or 0),
        }

    if psi_baseline_path is not None:
        from ..plans.monitor import psi_against_baseline, read_drift_baseline

        scored = docs.select(F.col(score_col).alias("score"))
        psi = (
            sum(
                r["psi_int"]
                for r in psi_against_baseline(
                    scored, read_drift_baseline(spark, psi_baseline_path)
                ).collect()
            )
            / 1e6
        )
        checks["psi"] = {
            "pass": psi <= psi_threshold,
            "psi": round(psi, 6),
            "threshold": psi_threshold,
        }

    if not checks:
        raise ValueError(
            "release_gate: no check configured — an all-skip gate that "
            "passes would certify nothing; configure at least one of "
            "splits/probe/quasi_cols/psi_baseline_path"
        )
    return {"pass": all(c["pass"] for c in checks.values()), "checks": checks}
