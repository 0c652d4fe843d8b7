"""One-pass column profiling: the data-quality report every ingest runs.

The reference's validate stage checks a handful of hand-written
invariants per table (``validate_refactored.py``); the generalization a
100 TB ingest needs is a schema-driven profile — per column: null count,
exact distinct count, min/max — produced by ONE aggregate pass and
reshaped to a row per column.

Scale shape: a single ``agg`` computes every metric in one scan. The
multi-column exact ``count(DISTINCT ·)`` uses Spark's Expand (one
duplicated stream per distinct-column) — exact counts are kept here for
oracle parity and because a profile's distinct counts feed key-candidate
detection; at 100 TB swap ``F.approx_count_distinct`` in via
``exact_distinct=False`` and the plan loses the Expand entirely.
min/max of string columns are truncated to 32 chars so the profile row
stays metadata-sized regardless of document length.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import ensure_utc
from ..sources import load_table
from .registry import register

_PROFILE_COLS = ["doc_id", "text", "lang", "source", "n_chars"]
_TRUNC = 32


def _bt(c: str):
    """Column ref by exact name (backticked — dots are not paths; the
    repo's P2 dotted-name convention)."""
    return F.col("`" + c.replace("`", "``") + "`")


def profile_frame(df: DataFrame, cols: list[str], exact_distinct: bool = True) -> DataFrame:
    """Generic one-pass profile of ``cols``: a row per column with
    (n_rows, n_null, n_distinct, min_val, max_val)."""
    if not cols:
        raise ValueError("profile_frame: no profilable columns")
    # positional internal aliases (c0__null, ...) so arbitrary column
    # names (dots, spaces) never leak into expression text; the real
    # name appears only as a string literal in the stack output
    aggs: list[Column] = [F.count("*").alias("n_rows")]
    for i, c in enumerate(cols):
        col = _bt(c)
        aggs.append(F.sum(col.isNull().cast("long")).alias(f"c{i}__null"))
        if exact_distinct:
            aggs.append(F.count_distinct(col).alias(f"c{i}__distinct"))
        else:
            aggs.append(F.approx_count_distinct(col).alias(f"c{i}__distinct"))
        aggs.append(F.substring(F.min(col).cast("string"), 1, _TRUNC).alias(f"c{i}__min"))
        aggs.append(F.substring(F.max(col).cast("string"), 1, _TRUNC).alias(f"c{i}__max"))
    one = df.agg(*aggs)
    stack_args: list[str] = []
    for i, c in enumerate(cols):
        lit = c.replace("'", "\\'")
        stack_args.append(f"'{lit}', c{i}__null, c{i}__distinct, c{i}__min, c{i}__max")
    stacked = one.selectExpr(
        "n_rows",
        f"stack({len(cols)}, {', '.join(stack_args)}) AS "
        "(column_name, n_null, n_distinct, min_val, max_val)",
    )
    return stacked.select(
        "column_name", "n_rows", "n_null", "n_distinct", "min_val", "max_val"
    )


def _oracle() -> str:
    parts = []
    for c in _PROFILE_COLS:
        parts.append(
            f"""SELECT '{c}' AS column_name,
       (SELECT count(*) FROM documents) AS n_rows,
       count(*) FILTER (WHERE {c} IS NULL) AS n_null,
       count(DISTINCT {c}) AS n_distinct,
       substr(CAST(min({c}) AS VARCHAR), 1, {_TRUNC}) AS min_val,
       substr(CAST(max({c}) AS VARCHAR), 1, {_TRUNC}) AS max_val
FROM documents"""
        )
    return "\nUNION ALL\n".join(parts)


@register("profile_documents", oracle=_oracle())
def profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profile the documents table: per column null/distinct/min/max in
    one aggregate pass (row order is hash-insensitive per the driver)."""
    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents").select(*_PROFILE_COLS)
    return profile_frame(docs, _PROFILE_COLS)


# --- mergeable (incremental) profiles ----------------------------------------
#
# The exact profile above needs the whole table per run. A continuously-
# ingesting corpus wants per-BATCH profiles folded into a running one —
# possible iff every statistic is mergeable: counts add, min/max of
# strings combine, and distinct counts become Datasketches HLL sketches
# (Spark's hll_sketch_agg / hll_union aggregates), which union exactly
# like the streaming_approx_distinct register files but JVM-side.
# Profiling 100 TB then costs one pass EVER per batch, never a rescan.


def profile_frame_sketch(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-column mergeable profile row: (column_name, n_rows, n_null,
    distinct_sketch binary, min_num, max_num, min_str, max_str). Fold
    batches with :func:`merge_profiles`; read estimates with
    :func:`profile_estimates`.

    min/max carry TYPED fields: numeric columns fill (min_num, max_num)
    doubles, everything else fills the string pair — per-batch
    stringified extremes must never be re-min/maxed lexicographically
    ('999' > '4999' as strings, so a string-only fold reports the wrong
    numeric max the moment batch extremes differ in digit count).
    """
    if not cols:
        raise ValueError("profile_frame_sketch: no profilable columns")
    from pyspark.sql import types as T

    numeric = {
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, T.NumericType)
    }
    aggs: list[Column] = [F.count("*").alias("n_rows")]
    for i, c in enumerate(cols):
        col = _bt(c)
        aggs.append(F.sum(col.isNull().cast("long")).alias(f"c{i}__null"))
        aggs.append(F.hll_sketch_agg(col.cast("string")).alias(f"c{i}__sk"))
        if c in numeric:
            aggs.append(F.min(col).cast("double").alias(f"c{i}__minn"))
            aggs.append(F.max(col).cast("double").alias(f"c{i}__maxn"))
            aggs.append(F.lit(None).cast("string").alias(f"c{i}__mins"))
            aggs.append(F.lit(None).cast("string").alias(f"c{i}__maxs"))
        else:
            aggs.append(F.lit(None).cast("double").alias(f"c{i}__minn"))
            aggs.append(F.lit(None).cast("double").alias(f"c{i}__maxn"))
            aggs.append(
                F.substring(F.min(col).cast("string"), 1, _TRUNC).alias(f"c{i}__mins")
            )
            aggs.append(
                F.substring(F.max(col).cast("string"), 1, _TRUNC).alias(f"c{i}__maxs")
            )
    one = df.agg(*aggs)
    stack_args = [
        f"'{c.replace(chr(39), chr(92) + chr(39))}', "
        f"c{i}__null, c{i}__sk, c{i}__minn, c{i}__maxn, c{i}__mins, c{i}__maxs"
        for i, c in enumerate(cols)
    ]
    return one.selectExpr(
        "n_rows",
        f"stack({len(cols)}, {', '.join(stack_args)}) AS "
        "(column_name, n_null, distinct_sketch, min_num, max_num, min_str, max_str)",
    ).select(
        "column_name", "n_rows", "n_null", "distinct_sketch",
        "min_num", "max_num", "min_str", "max_str",
    )


def merge_profiles(profiles: DataFrame) -> DataFrame:
    """Fold any number of per-batch profile frames (unioned) into one:
    counts add, sketches union, min/max combine in their NATIVE order
    (numeric fields numerically, string fields lexically). The merge
    input is #batches × #columns rows — metadata-sized, never
    data-sized."""
    return profiles.groupBy("column_name").agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("n_null").alias("n_null"),
        F.hll_union_agg("distinct_sketch").alias("distinct_sketch"),
        F.min("min_num").alias("min_num"),
        F.max("max_num").alias("max_num"),
        F.min("min_str").alias("min_str"),
        F.max("max_str").alias("max_str"),
    )


def _render_num(col: Column) -> Column:
    """Double → string without a spurious '.0' on integral values, so
    folded numeric extremes render like profile_frame's typed strings."""
    as_long = col.cast("long")
    return F.when(
        col.isNotNull() & (as_long.cast("double") == col), as_long.cast("string")
    ).otherwise(col.cast("string"))


def profile_estimates(profile: DataFrame) -> DataFrame:
    """Render a (merged) sketch profile readable: sketch → estimated
    distinct count, typed extremes → one string pair."""
    return profile.select(
        "column_name",
        "n_rows",
        "n_null",
        F.hll_sketch_estimate("distinct_sketch").alias("n_distinct_est"),
        F.coalesce(_render_num(F.col("min_num")), F.col("min_str")).alias("min_val"),
        F.coalesce(_render_num(F.col("max_num")), F.col("max_str")).alias("max_val"),
    )


# --- declarative expectations ------------------------------------------------
#
# The generalization of the reference's hand-written validate checks
# (validate_refactored.py: fps tolerance, row-count equality, null
# scans): a rule set declared as named boolean expressions, ALL
# evaluated in ONE corpus pass — the Great-Expectations-style contract
# check every ingest gate runs. A rule's violation count is a map-side
# conditional sum, so 50 rules cost one scan, not 50.


def check_expectations(
    df: DataFrame, rules: list[tuple[str, Column | str]]
) -> DataFrame:
    """Evaluate named row-level expectations in one aggregate pass →
    one row per rule: ``(rule, n_rows, n_violations, pass)``.

    ``rules``: (name, boolean Column or SQL expression string). NULL
    predicate results count as violations (an expectation that cannot
    be evaluated on a row is not met by it — the conservative gate
    semantics); write ``coalesce(pred, true)`` in the rule to opt a
    rule out of that.

    Scale shape: every rule compiles to ``sum(NOT coalesce(pred,
    false))`` inside ONE whole-stage-codegen aggregate over a single
    scan; the result is #rules rows. Adding a rule adds a projection,
    never a pass.
    """
    if not rules:
        raise ValueError("check_expectations: no rules")
    aggs: list[Column] = [F.count("*").alias("n_rows")]
    for i, (_name, pred) in enumerate(rules):
        p = F.expr(pred) if isinstance(pred, str) else pred
        aggs.append(
            F.sum((~F.coalesce(p, F.lit(False))).cast("long")).alias(f"r{i}__viol")
        )
    one = df.agg(*aggs)
    stack_args = [
        f"'{name.replace(chr(39), chr(92) + chr(39))}', r{i}__viol"
        for i, (name, _p) in enumerate(rules)
    ]
    return (
        one.selectExpr(
            "n_rows",
            f"stack({len(rules)}, {', '.join(stack_args)}) AS (rule, n_violations)",
        )
        .select(
            "rule",
            "n_rows",
            "n_violations",
            (F.col("n_violations") == 0).alias("pass"),
        )
    )


_EXPECT_RULES: list[tuple[str, str]] = [
    ("doc_id_not_null", "doc_id IS NOT NULL"),
    ("doc_id_positive", "doc_id >= 0"),
    ("text_not_empty", "length(text) > 0"),
    ("lang_is_iso2", "lang RLIKE '^[a-z]{2}$'"),
    ("n_chars_matches_text", "n_chars = length(text)"),
    ("source_known", "source IN ('web', 'wiki', 'code', 'news', 'chat')"),
]


def _expect_oracle() -> str:
    parts = []
    sql_rules = {
        "doc_id_not_null": "doc_id IS NOT NULL",
        "doc_id_positive": "doc_id >= 0",
        "text_not_empty": "len(text) > 0",
        "lang_is_iso2": "regexp_matches(lang, '^[a-z]{2}$')",
        "n_chars_matches_text": "n_chars = len(text)",
        "source_known": "source IN ('web', 'wiki', 'code', 'news', 'chat')",
    }
    for name, pred in sql_rules.items():
        parts.append(
            f"""SELECT '{name}' AS rule,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) FILTER (WHERE NOT coalesce({pred}, false)) AS BIGINT)
         AS n_violations,
       count(*) FILTER (WHERE NOT coalesce({pred}, false)) = 0 AS pass
FROM documents"""
        )
    return "\nUNION ALL\n".join(parts)


@register("validate_expectations", oracle=_expect_oracle())
def validate_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Library/oracle wrapper: the declarative rule set over the
    documents table — six expectations, one scan."""
    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    return check_expectations(docs, list(_EXPECT_RULES))


# --- profile drift -----------------------------------------------------------


def profile_drift(
    base: DataFrame,
    current: DataFrame,
    null_rate_tol: float = 0.05,
    distinct_ratio_tol: float = 0.5,
) -> DataFrame:
    """Schema/distribution drift report between two profile-estimate
    frames (:func:`profile_estimates` output): per column —
    null-rate delta, distinct-count ratio, range expansion, and an
    overall ``drifted`` flag. Input is #columns rows per side, so the
    comparison is metadata-sized regardless of corpus size; with the
    streaming profile store this is a continuous ingest-quality alarm
    (compare yesterday's merged profile to today's) that never rescans.

    Flags: ``null_rate_delta`` beyond ``null_rate_tol`` (absolute),
    ``distinct_ratio`` outside [1−tol, 1+tol]·(rows ratio) — i.e.
    cardinality growing/shrinking disproportionately to volume — or a
    column appearing/disappearing (full-outer join nulls).
    """
    b = base.select(
        F.col("column_name"),
        F.col("n_rows").alias("b_rows"),
        F.col("n_null").alias("b_null"),
        F.col("n_distinct_est").alias("b_distinct"),
    )
    c = current.select(
        F.col("column_name"),
        F.col("n_rows").alias("c_rows"),
        F.col("n_null").alias("c_null"),
        F.col("n_distinct_est").alias("c_distinct"),
    )
    j = b.join(c, "column_name", "full_outer")
    b_rate = F.col("b_null") / F.col("b_rows")
    c_rate = F.col("c_null") / F.col("c_rows")
    null_delta = c_rate - b_rate
    rows_ratio = F.col("c_rows") / F.col("b_rows")
    distinct_ratio = F.col("c_distinct") / F.col("b_distinct")
    # distinct growth normalized by volume growth: 1.0 = proportional
    norm_ratio = distinct_ratio / rows_ratio
    missing = F.col("b_rows").isNull() | F.col("c_rows").isNull()
    drifted = (
        missing
        | (F.abs(null_delta) > null_rate_tol)
        | (norm_ratio < 1 - distinct_ratio_tol)
        | (norm_ratio > 1 + distinct_ratio_tol)
    )
    return j.select(
        "column_name",
        F.round(null_delta, 6).alias("null_rate_delta"),
        F.round(norm_ratio, 4).alias("distinct_volume_ratio"),
        missing.alias("column_added_or_dropped"),
        drifted.alias("drifted"),
    )
