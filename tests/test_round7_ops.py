"""Round-7 hardening tests.

Covers the round-6 verdict punch list: oracle type safety (the
``mixture_token_budget`` HUGEINT regression class), single-writer guards
for maintenance ops, merge schema-evolution stance, Bloom-decontam
oracle equivalence, clustered-layout merge locality, and sketch-profile
accuracy bounds.
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo/tools")

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


class TestOracleTypeSafety:
    """No oracle may emit a DuckDB type that pandas materializes lossily.

    DuckDB sums BIGINT into HUGEINT; pandas turns HUGEINT into float64, so
    the driver hashes ``1435.0`` against Spark's ``1435`` and fails even
    when every value matches (the round-6 ``mixture_token_budget`` red
    row). Binding types is lazy — this sweeps all registered oracles
    without executing any of them.
    """

    def test_no_oracle_emits_hugeint_or_decimal(self):
        import duckdb

        from check_contract import oracle_type_violations
        from imitation_learning_data_pipeline_spark.plans import ORACLES

        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * "
                f"FROM read_parquet('{SF_DIR}/{t}.parquet')"
            )
        violations = {}
        for name, sql in ORACLES.items():
            bad = oracle_type_violations(con.sql(sql))
            if bad:
                violations[name] = bad
        assert not violations, (
            "oracles emitting driver-unsafe types (wrap the projection in "
            f"CAST(... AS BIGINT/DOUBLE)): {violations}"
        )

    def test_detector_catches_bare_sum(self):
        import duckdb

        from check_contract import oracle_type_violations

        con = duckdb.connect()
        rel = con.sql("SELECT sum(x) AS s FROM (VALUES (CAST(1 AS BIGINT))) t(x)")
        assert oracle_type_violations(rel) == ["s:HUGEINT"]
        rel_ok = con.sql(
            "SELECT CAST(sum(x) AS BIGINT) AS s "
            "FROM (VALUES (CAST(1 AS BIGINT))) t(x)"
        )
        assert oracle_type_violations(rel_ok) == []
