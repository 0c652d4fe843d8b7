"""SQL API surface: the engine's tables work through spark.sql too.

The reference has no SQL surface (SURVEY §2.11); Catalyst gives us one
for free via sources.readers.register_views — these tests pin that the
registered views answer ANSI queries equivalent to the DataFrame plans.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def views(spark):
    from imitation_learning_data_pipeline_spark.sources.readers import register_views

    register_views(spark, SF_DIR)
    return spark


def test_sql_q6_equals_dataframe_plan(views):
    spark = views
    sql = spark.sql(
        """
        SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
               count(*) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
        """
    ).collect()
    from imitation_learning_data_pipeline_spark.plans.relational2 import q6_forecast_revenue

    df = q6_forecast_revenue(spark, SF_DIR).collect()
    assert sql == df


def test_sql_window_over_events(views):
    spark = views
    rows = spark.sql(
        """
        SELECT user_id, event_id,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
                 AS new_index
        FROM events
        """
    )
    per_user = rows.groupBy("user_id").agg(
        F.min("new_index").alias("mn"), F.max("new_index").alias("mx"),
        F.count("*").alias("n")
    )
    bad = per_user.filter((F.col("mn") != 0) | (F.col("mx") != F.col("n") - 1))
    assert bad.count() == 0


def test_sql_join_documents_embeddings(views):
    spark = views
    n = spark.sql(
        """
        SELECT count(*) AS n
        FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
        """
    ).collect()[0]["n"]
    assert n > 0
