"""Skew mitigation: explicit salted joins (the pre-AQE safety valve).

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime, but it only splits SORT-MERGE join partitions; a hot key inside
an aggregation, or a deployment with AQE disabled, still needs manual
salting. Pattern (BASELINE "salting for skew"): replicate the build side
R times, scatter the probe side's hot keys across R salt values, join on
(key, salt) — the hot key's rows spread over R tasks instead of one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salt_probe(df: DataFrame, n_salts: int, key: Column | str | None = None) -> DataFrame:
    """Scatter rows across n_salts deterministic salt values.

    Deterministic (hash of the key, or of all columns when key is None),
    so retried tasks land rows on the same salt — required for
    exactly-once sinks.
    """
    basis = F.col(key) if isinstance(key, str) else key
    h = F.xxhash64(basis if basis is not None else F.struct(*df.columns))
    return df.withColumn(SALT_COL, F.pmod(h, F.lit(n_salts)).cast("int"))


def explode_build(df: DataFrame, n_salts: int) -> DataFrame:
    """Replicate the (small) build side once per salt value."""
    return df.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn(SALT_COL, F.col(SALT_COL).cast("int"))


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join that spreads each probe key over n_salts tasks.

    The salt hashes the WHOLE probe row, never the join key — hashing
    the key would assign every row of the hot key the same salt and
    spread nothing.

    Cost model: build side is replicated n_salts× (choose n_salts ≈ the
    skew factor, keep the build side broadcast-small); probe side gains
    one narrow column. Wrong tool for two LARGE skewed sides — there,
    AQE skew-join or a two-pass hot/cold split wins.

    Only inner/left are supported: with right/full, build rows that
    match NO probe row were replicated n_salts times by explode_build
    and would each survive as a distinct unmatched output row.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: outer "
            "joins would emit unmatched build rows once per salt replica"
        )
    p = salt_probe(probe, n_salts)
    b = explode_build(build, n_salts)
    return p.join(b, [*on, SALT_COL], how).drop(SALT_COL)
