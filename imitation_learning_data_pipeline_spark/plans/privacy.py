"""Privacy-risk auditing for training corpora: k-anonymity and
l-diversity over quasi-identifier columns, plus suppression.

PII *redaction* (plans/text.py::pii_scrub) removes recognizable
surface strings; it cannot say whether the remaining STRUCTURED
attributes still single people out. The standard measure for that is
k-anonymity (Sweeney 2002): every combination of quasi-identifier
values — the "equivalence class" — must be shared by at least k
records, else the record is re-identifiable by linking. l-diversity
(Machanavelli et al. 2007) strengthens it: each class must also
contain at least l distinct values of the sensitive attribute, else
membership in a large class still leaks the sensitive value.

A large-scale training-data pipeline runs this audit before releasing
tabular/metadata slices alongside text (the reference's roadmap scopes
a generic audit stage; /root/reference/README.md:164-187). Both
measures are pure hash-aggregates — the cheapest possible shape at
100 TB:

- the audit is ONE groupBy over the quasi-identifier columns with
  map-side partial aggregation; no window, no sort, no join;
- suppression joins the (class-bounded, usually tiny) violating-class
  key list back BROADCAST, so the corpus pass is map-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import ensure_utc
from ..sources import load_table
from .registry import register

_K = 3
_L = 2


def k_anonymity_audit(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str | Column,
    k: int = _K,
    l_div: int = _L,
) -> DataFrame:
    """Per-equivalence-class privacy audit → one row per distinct
    quasi-identifier combination with ``class_size`` (k-anonymity),
    ``n_sensitive`` (distinct sensitive values, l-diversity) and the
    0/1 violation flags.

    Scale shape: exactly ONE hash aggregate over the quasi-identifier
    key (map-side combined; count-distinct of the sensitive column
    expands to the standard two-phase distinct aggregate Spark plans
    for it). Output is bounded by the quasi-identifier domain, not the
    corpus. All outputs are integers — bit-exact across engines.
    """
    return (
        df.groupBy(*quasi_cols)
        .agg(
            F.count("*").alias("class_size"),
            F.countDistinct(sensitive_col).alias("n_sensitive"),
        )
        .select(
            *quasi_cols,
            "class_size",
            "n_sensitive",
            (F.col("class_size") < k).cast("int").alias("k_violation"),
            (F.col("n_sensitive") < l_div).cast("int").alias("l_violation"),
        )
    )


def suppress_small_classes(
    df: DataFrame, quasi_cols: list[str], k: int = _K
) -> DataFrame:
    """Suppression release: rows whose equivalence class has ≥ k
    members keep their quasi-identifier values; rows in smaller classes
    get every quasi-identifier column NULLed (the class is merged into
    the single "suppressed" class). Column set and row count are
    unchanged.

    Scale shape: the violating-class key list is an aggregate bounded
    by the quasi-identifier domain — small by construction — and joins
    back BROADCAST with a left anti-ish flag, keeping the corpus pass
    map-side. The suppressed output should be re-audited: NULLing
    merges all violators into one class of size = sum of violator
    sizes, which satisfies k once that sum ≥ k (pytest covers the
    degenerate case where it does not).
    """
    violators = (
        df.groupBy(*quasi_cols)
        .agg(F.count("*").alias("__n"))
        .filter(F.col("__n") < k)
        .select(
            *[F.col(c).alias(f"__v_{c}") for c in quasi_cols],
            F.lit(1).alias("__viol"),
        )
    )
    # eqNullSafe keys: groupBy treats NULL as a class value, so the
    # join-back must too — a plain equi-join would never match a
    # violating class containing a NULL quasi-identifier, silently
    # leaking its OTHER (re-identifying) quasi values in the release.
    cond = None
    for c in quasi_cols:
        term = F.col(c).eqNullSafe(F.col(f"__v_{c}"))
        cond = term if cond is None else (cond & term)
    joined = df.join(F.broadcast(violators), cond, "left").drop(
        *[f"__v_{c}" for c in quasi_cols]
    )
    keep_cols = [
        (
            F.when(F.col("__viol").isNull(), F.col(c)).alias(c)
            if c in quasi_cols
            else F.col(c)
        )
        for c in df.columns
    ]
    return joined.select(*keep_cols)


_BAND_WIDTH = 2000


@register(
    "privacy_k_anonymity",
    oracle=f"""
WITH qi AS (
  SELECT c_nationkey,
         c_mktsegment,
         CAST(floor(c_acctbal / {_BAND_WIDTH}) AS BIGINT) AS acct_band,
         c_acctbal
  FROM customer
)
SELECT c_nationkey, c_mktsegment, acct_band,
       count(*) AS class_size,
       count(DISTINCT c_acctbal) AS n_sensitive,
       CAST(count(*) < {_K} AS INT) AS k_violation,
       CAST(count(DISTINCT c_acctbal) < {_L} AS INT) AS l_violation
FROM qi
GROUP BY c_nationkey, c_mktsegment, acct_band
""",
)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract query: audit the customer table with quasi-identifiers
    (nation, market segment, account-balance band) and the exact
    balance as the sensitive attribute. The band makes equivalence
    classes fine enough that real k=3 violations exist at every SF."""
    ensure_utc(spark)
    cust = load_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / _BAND_WIDTH).cast("long").alias("acct_band"),
        "c_acctbal",
    )
    return k_anonymity_audit(
        cust,
        ["c_nationkey", "c_mktsegment", "acct_band"],
        "c_acctbal",
        k=_K,
        l_div=_L,
    )
