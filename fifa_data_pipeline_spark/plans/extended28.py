"""Round-5 scale-hygiene additions.

Reference scope note: the reference pipeline
(``prefect/spark/fifa_spark.py``) has no statistics surface; these
extend the warehouse layer the build brief makes first-class. The
theme of the round is "exact answers without single-task sorts":
every query here rides the partition-parallel prefix-sum machinery
(``relational.grouped_running_sums``) introduced to fix the r4
rank-window findings, proving it generalizes beyond the
nonparametric-statistics family it was built for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fifa_data_pipeline_spark.sources.io import read_table

QUERIES: dict = {}
ORACLES: dict = {}


def q_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-returnflag price quantiles (p25/p50/p75/p90/p99)
    located by COUNTING, not sorting — see
    :func:`fifa_data_pipeline_spark.operators.relational.exact_group_quantiles`.
    ``approx_percentile`` trades error bars for speed; this trades
    nothing: one fact hash-aggregate, then distinct-value-sized
    work, no group ever sorts in one task. The integer per-mille
    rank (``(pm·n + 999) div 1000``) is DuckDB's ``quantile_disc``
    convention with the IEEE boundary pinned out."""
    from fifa_data_pipeline_spark.operators.relational import (
        exact_group_quantiles,
    )

    li = read_table(spark, sf_dir, "lineitem")
    return exact_group_quantiles(li, "l_returnflag", "l_extendedprice")


QUERIES["q_exact_quantiles"] = q_exact_quantiles

def q_grouped_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 orders by total price per order priority via the
    skew-safe two-phase top-k
    (:func:`fifa_data_pipeline_spark.operators.relational.grouped_topk`)
    — value-identical to the single-window ``row_number() <= k`` form
    the oracle runs, but no priority class ever sorts all its orders
    in one task."""
    from fifa_data_pipeline_spark.operators.relational import (
        grouped_topk,
    )

    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    out = grouped_topk(
        orders, ["o_orderpriority"], "o_totalprice", "o_orderkey", k=5
    )
    return out.select(
        "o_orderpriority",
        "rank",
        "o_orderkey",
        F.round("o_totalprice", 2).alias("o_totalprice"),
    )


QUERIES["q_grouped_topk"] = q_grouped_topk

ORACLES["q_grouped_topk"] = """
    SELECT o_orderpriority, rank, o_orderkey,
           ROUND(o_totalprice, 2) AS o_totalprice
    FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC,
                                         o_orderkey) AS rank
      FROM orders)
    WHERE rank <= 5
"""

def q_exact_quantiles_cont(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated (``percentile_cont``-style, type-7) per-returnflag
    price quantiles via the same counting machinery as
    ``q_exact_quantiles`` — integer position arithmetic, one pinned
    IEEE interpolation at the end. See
    :func:`relational.exact_group_quantiles_cont`."""
    from fifa_data_pipeline_spark.operators.relational import (
        exact_group_quantiles_cont,
    )

    li = read_table(spark, sf_dir, "lineitem")
    return exact_group_quantiles_cont(
        li, "l_returnflag", "l_extendedprice"
    )


QUERIES["q_exact_quantiles_cont"] = q_exact_quantiles_cont

ORACLES["q_exact_quantiles_cont"] = """
    WITH counts AS (
      SELECT l_returnflag AS g, l_extendedprice AS v, COUNT(*) AS cnt
      FROM lineitem GROUP BY 1, 2
    ), cum AS (
      SELECT g, v, cnt,
             SUM(cnt) OVER (PARTITION BY g ORDER BY v) AS rsum
      FROM counts
    ), tot AS (SELECT g, SUM(cnt) AS n FROM counts GROUP BY g),
    px AS (SELECT UNNEST([250, 500, 750, 900, 990]) AS pm),
    based AS (
      SELECT c.g, c.v, c.rsum, t.n, px.pm,
             (px.pm * (t.n - 1)) // 1000 + 1 AS lo,
             (px.pm * (t.n - 1)) % 1000 AS frac
      FROM cum c JOIN tot t USING (g), px
    ), picked AS (
      SELECT g, pm,
             MIN(CASE WHEN rsum >= lo THEN v END) AS v_lo,
             MIN(CASE WHEN rsum >= lo + 1 THEN v END) AS v_hi,
             MAX(frac) AS frac,
             CAST(MAX(n) AS BIGINT) AS n_rows
      FROM based GROUP BY g, pm
    )
    SELECT g AS l_returnflag, pm AS quantile_pm,
           ROUND(v_lo + (COALESCE(v_hi, v_lo) - v_lo)
                        * (frac / 1000.0), 6) AS q_value,
           n_rows
    FROM picked
"""

ORACLES["q_exact_quantiles"] = """
    WITH counts AS (
      SELECT l_returnflag AS g, l_extendedprice AS v, COUNT(*) AS cnt
      FROM lineitem GROUP BY 1, 2
    ), cum AS (
      SELECT g, v, cnt,
             SUM(cnt) OVER (PARTITION BY g ORDER BY v) AS rsum
      FROM counts
    ), tot AS (SELECT g, SUM(cnt) AS n FROM counts GROUP BY g),
    px AS (SELECT UNNEST([250, 500, 750, 900, 990]) AS pm)
    SELECT c.g AS l_returnflag, px.pm AS quantile_pm,
           MIN(c.v) AS q_value,
           CAST(MAX(t.n) AS BIGINT) AS n_rows
    FROM cum c JOIN tot t USING (g), px
    WHERE c.rsum >= GREATEST(1, (px.pm * t.n + 999) // 1000)
    GROUP BY 1, 2
"""
