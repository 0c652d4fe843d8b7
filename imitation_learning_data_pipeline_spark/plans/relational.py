"""Relational core: scans, filters, joins, aggregations, set ops.

Covers SURVEY §2.1/§2.3 (S2/P1-P8), §2.4 (J1-J5), §2.5 (A1-A8), §2.7
(O1-O4), plus engine capabilities the reference lacks (§2.11: rollup,
pivot, top-k) which come free with Spark and are exposed as first-class
queries.

Scale notes per query are inline; common rules: dimension sides are
broadcast explicitly, aggregations are expressed so Catalyst plans
partial (map-side) aggregation, and filters/projections sit directly on
the scan so parquet pushdown applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import cents
from ..session import ensure_utc
from ..sources import load_table
from .registry import register


def _t(spark: SparkSession, sf_dir: str, *names: str):
    ensure_utc(spark)
    out = tuple(load_table(spark, sf_dir, n) for n in names)
    return out[0] if len(out) == 1 else out


# --- Q1-style one-pass multi-aggregate (A1 analogue on lineitem) -----------
# Reference shape: validate_one.py:89-100 — 9 aggregates fused in one pass.
# One hash-aggregate, partial+final, whole-stage codegen; at 100 TB this is
# scan-bound, the ideal shape.

@register(
    "q1_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                        AS sum_qty,
       round(sum(l_extendedprice), 2)                                   AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
       round(avg(l_quantity), 4)                                        AS avg_qty,
       round(avg(l_extendedprice), 4)                                   AS avg_price,
       round(avg(l_discount), 4)                                        AS avg_disc,
       count(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# --- S2/P1/P4-P8: projection + predicate pushdown ---------------------------

@register(
    "scan_project_filter",
    oracle="""
SELECT l_orderkey, l_linenumber, round(l_quantity, 2) AS qty,
       round(l_extendedprice, 2) AS price
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_returnflag = 'R' AND l_quantity BETWEEN 5 AND 45
""",
)
def scan_project_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Projection+filters directly on the scan: .explain shows PushedFilters
    # and a 5-column ReadSchema — the reference does this manually with
    # scan_parquet().select() (align_transform_refactored.py:98-101);
    # Catalyst does it from the declarative plan.
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_returnflag") == "R")
        & F.col("l_quantity").between(5, 45)
    ).select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_quantity", 2).alias("qty"),
        F.round("l_extendedprice", 2).alias("price"),
    )


# --- J1: left equi-join with change-detection CASE --------------------------
# Reference: discover_refactored.py:115-122 (attach previous fingerprint,
# classify NEW/UNCHANGED/kept).

_CHANGE_ORACLE = """
WITH cur AS (
  SELECT o_orderkey AS k,
         md5(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                  + CASE WHEN o_orderkey % 11 = 0 THEN 1 ELSE 0 END AS VARCHAR)) AS fp
  FROM orders WHERE o_orderkey % 5 <> 0
), prev AS (
  SELECT o_orderkey AS k,
         md5(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR)) AS fp
  FROM orders WHERE o_orderkey % 7 <> 0
)
SELECT cur.k AS okey,
       CASE WHEN prev.k IS NULL THEN 'NEW'
            WHEN cur.fp = prev.fp THEN 'UNCHANGED'
            ELSE 'CHANGED' END AS status
FROM cur LEFT JOIN prev ON cur.k = prev.k
"""


@register("join_left_change_detect", oracle=_CHANGE_ORACLE)
def join_left_change_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    fp_cur = F.md5(
        (cents("o_totalprice") + F.when(F.col("o_orderkey") % 11 == 0, 1).otherwise(0))
        .cast("string")
    )
    cur = orders.filter(F.col("o_orderkey") % 5 != 0).select(
        F.col("o_orderkey").alias("k"), fp_cur.alias("fp")
    )
    prev = orders.filter(F.col("o_orderkey") % 7 != 0).select(
        F.col("o_orderkey").alias("k"), F.md5(cents("o_totalprice").cast("string")).alias("fp")
    )
    j = cur.join(prev.withColumnRenamed("fp", "prev_fp"), "k", "left")
    return j.select(
        F.col("k").alias("okey"),
        F.when(F.col("prev_fp").isNull(), "NEW")
        .when(F.col("fp") == F.col("prev_fp"), "UNCHANGED")
        .otherwise("CHANGED")
        .alias("status"),
    )


# --- J2: anti join (DELETED detection, discover_refactored.py:124-136) ------

@register(
    "join_anti_deleted",
    oracle="""
SELECT p.o_orderkey AS okey
FROM (SELECT o_orderkey FROM orders WHERE o_orderkey % 7 <> 0) p
WHERE NOT EXISTS (
  SELECT 1 FROM (SELECT o_orderkey FROM orders WHERE o_orderkey % 5 <> 0) c
  WHERE c.o_orderkey = p.o_orderkey)
""",
)
def join_anti_deleted(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    prev = orders.filter(F.col("o_orderkey") % 7 != 0).select("o_orderkey")
    cur = orders.filter(F.col("o_orderkey") % 5 != 0).select("o_orderkey")
    return prev.join(cur, "o_orderkey", "left_anti").select(
        F.col("o_orderkey").alias("okey")
    )


# --- J4: semi join (stats_refactored.py:48-78 validated-episode filter) -----

@register(
    "join_semi_active_customers",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
""",
)
def join_semi_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, orders = _t(spark, sf_dir, "customer", "orders")
    big = orders.filter(F.col("o_totalprice") > 100000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    return cust.join(big, "c_custkey", "left_semi").select("c_custkey", "c_name")


# --- J5: orphan detection via anti join (discover_refactored.py:138-157) ----

@register(
    "join_anti_orphan_parts",
    oracle="""
SELECT p_partkey, p_name
FROM part p
WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_partkey = p.p_partkey AND l.l_quantity > 45)
""",
)
def join_anti_orphan_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Parts never shipped in bulk — the filter makes the anti join
    # non-trivially selective (plain "no lineitem at all" is empty at
    # every SF, which would be a vacuous correctness check).
    part, li = _t(spark, sf_dir, "part", "lineitem")
    bulk = li.filter(F.col("l_quantity") > 45).select(
        F.col("l_partkey").alias("p_partkey")
    )
    return part.join(bulk, "p_partkey", "left_anti").select("p_partkey", "p_name")


# --- J3: broadcast lookup join (validate_one.py:48-50 loop → one join) ------

@register(
    "join_broadcast_dim",
    oracle="""
SELECT p.p_brand,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       count(*) AS n_lines
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_brand
""",
)
def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The dim side is broadcast explicitly: zero shuffle of the fact table
    # for the join, then one hash-agg exchange on p_brand (low cardinality,
    # AQE coalesces). This replaces the reference's per-key filter loop.
    part, li = _t(spark, sf_dir, "part", "lineitem")
    return (
        li.join(F.broadcast(part.select("p_partkey", "p_brand")),
                li.l_partkey == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


# --- multi-join star query (tests Catalyst join reordering, TPC-H Q5-ish) ---

@register(
    "join_star_region_revenue",
    oracle="""
SELECT r.r_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       count(DISTINCT o.o_orderkey) AS n_orders
FROM lineitem l
JOIN orders o    ON l.l_orderkey = o.o_orderkey
JOIN customer c  ON o.o_custkey = c.c_custkey
JOIN nation n    ON c.c_nationkey = n.n_nationkey
JOIN region r    ON n.n_regionkey = r.r_regionkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
GROUP BY r.r_name
""",
)
def join_star_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders, cust, nation, region = _t(
        spark, sf_dir, "lineitem", "orders", "customer", "nation", "region"
    )
    # customer/nation/region are broadcast (tiny dims); the only shuffle is
    # lineitem⋈orders on orderkey + the final agg. AQE handles sizing.
    dim = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), F.col("n_regionkey") == region.r_regionkey)
        .select(F.col("c_custkey"), F.col("r_name"))
    )
    return (
        li.join(
            orders.filter(
                F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp")
            ).select("o_orderkey", "o_custkey"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .join(F.broadcast(dim), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("r_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("revenue"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
    )


# --- A1/A2/A5: grouped one-pass validation aggregate over orders ------------

@register(
    "agg_multi_onepass",
    oracle="""
SELECT o_custkey,
       count(*) AS n_orders,
       CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS n_statuses,
       strftime(min(o_orderdate), '%Y-%m-%d') AS first_order,
       strftime(max(o_orderdate), '%Y-%m-%d') AS last_order,
       round(sum(o_totalprice), 2) AS total_spend,
       max(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) = 1 AS any_null_priority
FROM orders
GROUP BY o_custkey
""",
)
def agg_multi_onepass(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders"),
        F.countDistinct("o_orderstatus").alias("n_statuses"),
        F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("first_order"),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("last_order"),
        F.round(F.sum("o_totalprice"), 2).alias("total_spend"),
        (F.max(F.when(F.col("o_orderpriority").isNull(), 1).otherwise(0)) == 1).alias(
            "any_null_priority"
        ),
    )


# --- A4: distinct keys ------------------------------------------------------

@register(
    "distinct_pairs",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.select("user_id", "event_type").distinct()


# --- A5/A6: summary counts with conditional aggregation ---------------------

@register(
    "agg_summary_counts",
    oracle="""
SELECT event_type,
       count(*) AS n,
       CAST(sum(CASE WHEN value > 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
       round(avg(value), 4) AS avg_value
FROM events GROUP BY event_type
""",
)
def agg_summary_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("value") > 50, 1).otherwise(0)).cast("long").alias("n_high"),
        F.round(F.avg("value"), 4).alias("avg_value"),
    )


# --- O3: schema-relaxed union (discover_refactored.py:159-163) --------------

@register(
    "union_relaxed",
    oracle="""
SELECT o_orderkey AS k,
       md5(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR)) AS fp,
       'CURRENT' AS status
FROM orders WHERE o_orderkey % 5 <> 0
UNION ALL BY NAME
SELECT o_orderkey AS k, 'DELETED' AS status
FROM orders WHERE o_orderkey % 5 = 0
""",
)
def union_relaxed(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cur = orders.filter(F.col("o_orderkey") % 5 != 0).select(
        F.col("o_orderkey").alias("k"),
        F.md5(cents("o_totalprice").cast("string")).alias("fp"),
        F.lit("CURRENT").alias("status"),
    )
    deleted = orders.filter(F.col("o_orderkey") % 5 == 0).select(
        F.col("o_orderkey").alias("k"), F.lit("DELETED").alias("status")
    )
    return cur.unionByName(deleted, allowMissingColumns=True)


# --- O4: EXCEPT on key projection -------------------------------------------

@register(
    "except_keys",
    oracle="""
SELECT o_custkey FROM orders
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
""",
)
def except_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    # subtract == SQL EXCEPT (set semantics): a key is removed if it appears
    # at all on the right — exceptAll would keep surplus multiplicities.
    orders = _t(spark, sf_dir, "orders")
    return orders.select("o_custkey").subtract(
        orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    )


# --- O1 + top-k (engine capability beyond the reference, §2.11) -------------

@register(
    "topk_orders",
    oracle="""
SELECT o_orderkey, round(o_totalprice, 2) AS price
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
""",
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # orderBy+limit compiles to TakeOrderedAndProject — per-partition top-k
    # then a driver merge of k·P rows; no global sort at any scale.
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("price"))
    )


# --- rollup (engine capability, §2.11) --------------------------------------

@register(
    "agg_rollup",
    oracle="""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count("*").alias("n"),
    )


# --- pivot (engine capability, §2.11) ---------------------------------------

@register(
    "pivot_order_status",
    oracle="""
SELECT o_orderpriority,
       CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS st_o,
       CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS st_f,
       CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS st_p
FROM orders GROUP BY o_orderpriority
""",
)
def pivot_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    p = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
    )
    return p.select(
        "o_orderpriority",
        F.coalesce(F.col("O"), F.lit(0)).alias("st_o"),
        F.coalesce(F.col("F"), F.lit(0)).alias("st_f"),
        F.coalesce(F.col("P"), F.lit(0)).alias("st_p"),
    )
