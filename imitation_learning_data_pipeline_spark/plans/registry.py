"""Registry mapping query names → (Spark plan builder, DuckDB oracle SQL).

Contract (driver-defined, see /root/repo/__spark_entry__.py docstring):
each builder takes (spark, sf_dir) and returns a DataFrame; the oracle is
ANSI SQL DuckDB runs over the same parquet tables registered as views.
Every computed column is aliased identically on both sides — the driver
sorts columns by name before hashing values.

Determinism rules applied throughout:
- No raw double aggregates: anything summed/averaged is ``round``-ed to a
  fixed number of decimals on BOTH sides (floating-point addition order
  differs between engines).
- Timestamps leave the plan as formatted strings or epoch integers, never
  as raw timestamp columns (engine/driver-dependent rendering).
- Window orderings always include a unique tiebreaker column.
- Arrays are exploded to scalar rows before returning (hash-stable).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named driver-contract query.

    ``oracle=None`` → non-SQL-expressible op; the driver records a weaker
    rows-only check for it.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle.strip()
        return fn

    return deco
