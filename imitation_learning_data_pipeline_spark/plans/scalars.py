"""Scalar-function plans: parse/format, hashing & split, JSON, datetime,
tolerance checks (SURVEY §2.8 F1-F14).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import md5_unit_interval, split_assign
from ..session import ensure_utc
from ..sources import load_table
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_utc(spark)
    return load_table(spark, sf_dir, name)


# --- F1/F2: filename-style parse + format -----------------------------------
# Reference: episode-index parse from path stems (discover_refactored.py:29-33)
# and episode_{:06d} path formatting (materialize_refactored.py:103-110).

@register(
    "scalar_parse_format",
    oracle="""
SELECT doc_id,
       CAST(regexp_extract(source, '([0-9]+)', 1) AS BIGINT) AS src_num,
       printf('episode_%06d.parquet', doc_id) AS episode_file,
       printf('chunk-%03d', CAST(regexp_extract(source, '([0-9]+)', 1) AS BIGINT) % 10)
         AS chunk_name
FROM documents
""",
)
def scalar_parse_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    src_num = F.regexp_extract("source", r"([0-9]+)", 1).cast("long")
    return docs.select(
        "doc_id",
        src_num.alias("src_num"),
        F.format_string("episode_%06d.parquet", F.col("doc_id")).alias("episode_file"),
        F.format_string("chunk-%03d", (src_num % 10)).alias("chunk_name"),
    )


# --- F3/F4/F5: stable hash → unit interval → deterministic split ------------
# Reference: utils.py:10-40 + materialize_refactored.py:16-26. md5-based
# (engine-portable) instead of BLAKE2b; same per-key determinism contract.

@register(
    "scalar_hash_split",
    oracle="""
WITH u AS (
  SELECT o_orderkey,
         ('0x' || substr(md5('42' || '|' || CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
           / 4294967296.0 AS uval
  FROM orders
)
SELECT CASE WHEN uval < 0.8 THEN 'train'
            WHEN uval < 0.9 THEN 'val'
            ELSE 'test' END AS split,
       count(*) AS n,
       round(min(uval), 6) AS min_u,
       round(max(uval), 6) AS max_u
FROM u GROUP BY 1
""",
)
def scalar_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    u = md5_unit_interval("o_orderkey", seed="42")
    return (
        orders.select(
            split_assign("o_orderkey", seed="42").alias("split"), u.alias("uval")
        )
        .groupBy("split")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("uval"), 6).alias("min_u"),
            F.round(F.max("uval"), 6).alias("max_u"),
        )
    )


# --- F12: JSON scalar extraction (events.props) -----------------------------

@register(
    "scalar_json_get",
    oracle="""
SELECT event_type,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       count(json_extract_string(props, '$.k')) AS n_with_k
FROM events GROUP BY event_type
""",
)
def scalar_json_get(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        F.count(k).alias("n_with_k"),
    )


# --- F14: abs-tolerance comparison (validate_one.py:121,134,136) ------------

@register(
    "scalar_tolerance_check",
    oracle="""
SELECT l_orderkey AS okey, count(*) AS n_lines,
       abs(count(*) - 4) <= 2 AS within_tol
FROM lineitem GROUP BY l_orderkey
""",
)
def scalar_tolerance_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    n = F.count("*")
    return li.groupBy(F.col("l_orderkey").alias("okey")).agg(
        n.alias("n_lines"),
        (F.abs(n - 4) <= 2).alias("within_tol"),
    )


# --- F9/F10: datetime extraction / truncation -------------------------------

@register(
    "scalar_datetime_extract",
    oracle="""
SELECT strftime(ts, '%Y-%m-%d') AS day,
       CAST(extract(hour FROM ts) AS INTEGER) AS hr,
       count(*) AS n,
       round(sum(value), 2) AS day_value
FROM events GROUP BY 1, 2
""",
)
def scalar_datetime_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.hour("ts").alias("hr"),
    ).agg(
        F.count("*").alias("n"),
        F.round(F.sum("value"), 2).alias("day_value"),
    )


# --- F11: rational-number parse ("30000/1001" → fps) ------------------------

@register(
    "scalar_rational_parse",
    oracle="""
WITH r AS (
  SELECT event_id,
         CAST(500 + user_id AS VARCHAR) || '/25' AS rate_str
  FROM events WHERE event_id % 100 = 0
)
SELECT event_id, rate_str,
       round(CAST(string_split(rate_str, '/')[1] AS DOUBLE)
             / CAST(string_split(rate_str, '/')[2] AS DOUBLE), 4) AS fps
FROM r
""",
)
def scalar_rational_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Reference: validate_one.py:32-37 parses ffprobe "30000/1001" rates.
    ev = _t(spark, sf_dir, "events")
    r = ev.filter(F.col("event_id") % 100 == 0).select(
        "event_id",
        F.concat((F.lit(500) + F.col("user_id")).cast("string"), F.lit("/25")).alias(
            "rate_str"
        ),
    )
    parts = F.split("rate_str", "/")
    return r.select(
        "event_id",
        "rate_str",
        F.round(
            parts.getItem(0).cast("double") / parts.getItem(1).cast("double"), 4
        ).alias("fps"),
    )
