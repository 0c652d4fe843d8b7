"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Everything here is a thin re-export of
``imitation_learning_data_pipeline_spark.plans`` — the registry where each
operator from SURVEY.md §2 (plus the BASELINE.json LLM-pipeline
extensions) registers a Spark plan builder and its DuckDB oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from imitation_learning_data_pipeline_spark.plans.flagship import (  # noqa: E402
    flagship_user_activity,
)
from imitation_learning_data_pipeline_spark.plans.registry import (  # noqa: E402
    contract_queries,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship_user_activity(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Curated ≤50-entry ordered surface (the driver checks the first 50 in
    dict order): queries that lack a strict-superset proxy come first;
    sub-shapes of retained queries are served by the library registry
    (plans.QUERIES) and the local checker instead — see
    plans/registry.py CONTRACT_EXCLUDE for the proxy map.
    """
    return contract_queries()[0]


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each hash-checkable query."""
    return contract_queries()[1]
