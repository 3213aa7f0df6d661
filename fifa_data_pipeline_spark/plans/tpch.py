"""Canonical TPC-H-shape analytics (Q3 / Q5 / Q10 / Q18 analogues).

The reference's flagship pipeline is a star join + aggregate
(SURVEY.md §2.4); these add the four classic decision-support shapes
the TPC-H suite is built from, adapted to the testdata schema —
each one a different join/agg topology the optimizer must get right:

- Q3  — 3-way join, selective dim filter, top-k on an aggregate.
- Q5  — 6-way snowflake with a cross-table equality (customer and
        supplier in the SAME nation) closing the join cycle.
- Q10 — fact-driven join with a quarter date window and top-k.
- Q18 — semi-join on a HAVING aggregate (large-order keys) feeding
        a second aggregate.

Plan posture (verified in tests/test_tpch.py): only
bounded-by-construction sides carry broadcast hints (nation/region,
HAVING key sets, 1-row aggregates) — every SF-scaling side (orders,
customer, supplier, part slices) is left to AQE, which promotes
SMJ→BHJ at runtime when the side is actually small and keeps SMJ at
cluster scale where a pinned hint would OOM. The fact crosses at
most ONE shuffle per aggregate grain, filters reach the parquet scan
(PushedFilters), and top-k runs as TakeOrderedAndProject — never a
global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fifa_data_pipeline_spark.sources.io import read_table

def _revenue():
    """Per-lineitem revenue term (built lazily: Column construction
    needs an active SparkContext in Spark 4)."""
    return (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
        "__rev"
    )

#: Q18 large-order quantity threshold (tuned to the testdata scale).
Q18_MIN_QTY = 300


def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-priority analogue: top-10 unshipped-revenue orders
    for BUILDING-segment customers as of the cutoff date."""
    cutoff = "1998-06-01"
    cust = read_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < cutoff
    )
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > cutoff
    )
    # No broadcast hints: every side here scales with SF (filtered
    # customer, date-filtered orders). AQE promotes the joins to BHJ
    # at runtime when a side is actually small; a pinned hint would
    # override AQE's size check and OOM executors at 100 TB.
    return (
        li.join(
            orders.join(
                cust.select("c_custkey"),
                F.col("o_custkey") == F.col("c_custkey"),
            ).select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(F.sum(_revenue()), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-supplier volume analogue: 1996 revenue per ASIA nation
    where the ordering customer and the supplying supplier sit in the
    same nation — the join CYCLE (c_nationkey = s_nationkey) that
    distinguishes Q5 from a plain snowflake."""
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    )
    asia_nations = nation.join(
        F.broadcast(region),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select("n_nationkey", "n_name")
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    supp = read_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    orders = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    li = read_table(spark, sf_dir, "lineitem")
    # Only the nation⋈region frame stays hinted (bounded by
    # construction); customer/supplier/orders scale with SF, so
    # their join strategy is AQE's call.
    return (
        li.join(
            orders.join(
                cust,
                F.col("o_custkey") == F.col("c_custkey"),
            ).select("o_orderkey", "c_nationkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(
            F.broadcast(asia_nations),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(F.round(F.sum(_revenue()), 2).alias("revenue"))
    )


def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item reporting analogue: top-20 customers by revenue
    lost to returns ('R' lineitems) on 1997-Q1 orders."""
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    orders = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01")
        & (F.col("o_orderdate") < "1997-04-01")
    )
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    # Quarter-filtered orders and the customer dim both scale with
    # SF — no pins; nation alone stays hinted.
    return (
        li.join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_custkey")
        .agg(F.round(F.sum(_revenue()), 2).alias("revenue"))
        .join(
            cust.join(
                F.broadcast(nation),
                F.col("c_nationkey") == F.col("n_nationkey"),
            ).select("c_custkey", "c_name", "c_acctbal", "n_name"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            F.col("c_custkey"),
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume-customer analogue: orders whose total quantity
    exceeds ``Q18_MIN_QTY``, with customer and order detail. The
    heavy HAVING aggregate becomes a small key set that SEMI-joins
    back into the detail aggregate — lineitem is scanned twice but
    shuffled at the order grain only."""
    li = read_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__q"))
        .filter(F.col("__q") > Q18_MIN_QTY)
        .select("l_orderkey")
    )
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name"
    )
    return (
        # `big` is a HAVING key set (orders over the quantity
        # threshold — a selective fraction), so its hint stays; full
        # orders and customer are unbounded and left to AQE.
        li.join(F.broadcast(big), "l_orderkey", "left_semi")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").cast("double").alias("total_qty"))
        .join(
            orders,
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            cust,
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


QUERIES = {
    "q_tpch_q3": q_tpch_q3,
    "q_tpch_q5": q_tpch_q5,
    "q_tpch_q10": q_tpch_q10,
    "q_tpch_q18": q_tpch_q18,
}

ORACLES = {
    "q_tpch_q3": """
        SELECT l_orderkey, o_orderdate,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-06-01'
          AND l_shipdate > TIMESTAMP '1998-06-01'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
    "q_tpch_q5": """
        SELECT n_name,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
                     AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name
    """,
    "q_tpch_q10": """
        WITH rev AS (
          SELECT o_custkey,
                 ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)
                   AS revenue
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          WHERE l_returnflag = 'R'
            AND o_orderdate >= TIMESTAMP '1997-01-01'
            AND o_orderdate < TIMESTAMP '1997-04-01'
          GROUP BY o_custkey
        )
        SELECT c_custkey, c_name, revenue,
               ROUND(c_acctbal, 2) AS c_acctbal, n_name
        FROM rev
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
    "q_tpch_q18": f"""
        SELECT c_custkey, c_name, o_orderkey,
               CAST(o_orderdate AS DATE) AS o_orderdate,
               ROUND(o_totalprice, 2) AS o_totalprice,
               CAST(SUM(l_quantity) AS DOUBLE) AS total_qty
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (
          SELECT l_orderkey FROM lineitem
          GROUP BY l_orderkey HAVING SUM(l_quantity) > {Q18_MIN_QTY}
        )
        GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
}
