"""Round-5 batch 6: Spark-4 SQL surface (pipe syntax, parameterized
SQL, dynamic-gap session windows).

- ``q_pipe_syntax`` — the TPC-H Q1 shape written in SQL pipe syntax
  (``|>``, Spark ≥4.0): same logical plan as the classic form, so the
  oracle is the classic SQL — demonstrating the surfaces are
  interchangeable.
- ``q_param_sql`` — named-parameter SQL (``:param`` with ``args=``),
  the injection-safe templating surface; oracle inlines the same
  literals.
- ``q_session_dynamic_gap`` — ``session_window`` with a PER-EVENT gap
  expression (clicks time out faster than errors), oracle-checked
  against the running-max-end sessionization rewrite in SQL.
- ``q_sql_script`` — SQL scripting (Spark ≥4.0 compound statements):
  DECLARE/SET a session variable from one query, use it in the next —
  the migration surface for stored-procedure-style warehouse code;
  the oracle computes the same share with a scalar subquery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fifa_data_pipeline_spark.sources.io import read_table, register_views

#: Dynamic session gaps per event type (seconds).
GAP_FAST = 600
GAP_SLOW = 1800
FAST_TYPES = ("click", "view")

#: q_param_sql named parameters.
PARAMS = {"minprice": 50000.0, "d1": "1996-01-01", "d2": "1998-01-01"}


def q_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape in SQL pipe syntax: each ``|>`` stage is a
    self-contained operator application in reading order (scan →
    filter → aggregate → filter-on-aggregate → order). Catalyst
    lowers it to the IDENTICAL logical plan as the nested classic
    form — the oracle runs the classic form to prove it."""
    register_views(spark, sf_dir, ["lineitem"])
    return spark.sql(
        """
        FROM lineitem
        |> WHERE l_shipdate <= TIMESTAMP '2000-09-02'
        |> AGGREGATE
             SUM(l_quantity) AS sum_qty,
             ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)
               AS sum_disc_price,
             COUNT(*) AS n
           GROUP BY l_returnflag, l_linestatus
        |> WHERE n > 100
        |> SELECT l_returnflag, l_linestatus, sum_qty, sum_disc_price, n
        """
    )


def q_param_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-parameter SQL: values bound via ``args=`` never touch
    the SQL text (no injection, plans cacheable by shape). Big-order
    revenue per priority inside a date window."""
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS sum_price
        FROM orders
        WHERE o_totalprice > :minprice
          AND o_orderdate >= CAST(:d1 AS TIMESTAMP)
          AND o_orderdate < CAST(:d2 AS TIMESTAMP)
        GROUP BY o_orderpriority
        """,
        args=PARAMS,
    )


def q_session_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows whose inactivity gap depends on the
    EVENT: interactive types (click/view) time out after
    ``GAP_FAST`` s, others after ``GAP_SLOW`` s — the
    ``session_window(ts, gap_expr)`` dynamic-gap form (Spark ≥3.2,
    state-store-backed in streaming). A session's end is the running
    max of per-event ``ts + gap``; an event landing exactly on the
    end starts a NEW session (windows are half-open) — the oracle
    reproduces precisely that rule with a running-max-end rewrite."""
    ev = read_table(spark, sf_dir, "events")
    gap = F.when(
        F.col("event_type").isin(*FAST_TYPES),
        F.lit(f"{GAP_FAST} seconds"),
    ).otherwise(F.lit(f"{GAP_SLOW} seconds"))
    return (
        ev.groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_timestamp("session_window.start")
            .cast("bigint")
            .alias("session_start"),
            F.unix_timestamp("session_window.end")
            .cast("bigint")
            .alias("session_end"),
            "n_events",
        )
    )


def q_sql_script(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound SQL script: a DECLAREd variable carries the global
    total into the per-priority share query (BEGIN … END executes
    statement-by-statement; the script's value is the LAST
    statement's result). The variable is a driver-side scalar — at
    any scale this is two queries, not a cross-statement shuffle."""
    register_views(spark, sf_dir, ["orders"])
    # scripting.enabled is only consulted at parse time; restore the
    # session's prior value so the flag doesn't leak into every later
    # query on the shared session (ADVICE r3)
    prior = spark.conf.get("spark.sql.scripting.enabled", None)
    spark.conf.set("spark.sql.scripting.enabled", "true")
    try:
        return spark.sql(
            """
            BEGIN
              DECLARE total DOUBLE;
              SET total = (SELECT SUM(o_totalprice) FROM orders);
              SELECT o_orderpriority,
                     ROUND(SUM(o_totalprice) / total, 6) AS share
              FROM orders
              GROUP BY o_orderpriority;
            END
            """
        )
    finally:
        if prior is None:
            spark.conf.unset("spark.sql.scripting.enabled")
        else:
            spark.conf.set("spark.sql.scripting.enabled", prior)


QUERIES = {
    "q_pipe_syntax": q_pipe_syntax,
    "q_param_sql": q_param_sql,
    "q_session_dynamic_gap": q_session_dynamic_gap,
    "q_sql_script": q_sql_script,
}

_FAST_LIST = ", ".join(f"'{t}'" for t in FAST_TYPES)

ORACLES = {
    "q_sql_script": """
        SELECT o_orderpriority,
               ROUND(SUM(o_totalprice)
                     / (SELECT SUM(o_totalprice) FROM orders), 6)
                 AS share
        FROM orders GROUP BY o_orderpriority
    """,
    "q_pipe_syntax": """
        SELECT l_returnflag, l_linestatus,
               SUM(l_quantity) AS sum_qty,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)
                 AS sum_disc_price,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-09-02'
        GROUP BY l_returnflag, l_linestatus
        HAVING COUNT(*) > 100
    """,
    "q_param_sql": f"""
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS sum_price
        FROM orders
        WHERE o_totalprice > {PARAMS["minprice"]}
          AND o_orderdate >= TIMESTAMP '{PARAMS["d1"]}'
          AND o_orderdate < TIMESTAMP '{PARAMS["d2"]}'
        GROUP BY o_orderpriority
    """,
    "q_session_dynamic_gap": f"""
        WITH g AS (
          SELECT user_id, ts,
                 ts + to_seconds(CASE WHEN event_type IN ({_FAST_LIST})
                      THEN {GAP_FAST} ELSE {GAP_SLOW} END) AS ev_end
          FROM events
        ), marked AS (
          SELECT user_id, ts, ev_end,
                 CASE WHEN ts >= MAX(ev_end) OVER (
                        PARTITION BY user_id ORDER BY ts
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                      OR MAX(ev_end) OVER (
                        PARTITION BY user_id ORDER BY ts
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                        IS NULL
                 THEN 1 ELSE 0 END AS new_sess
          FROM g
        ), sess AS (
          SELECT user_id, ts, ev_end,
                 SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS sid
          FROM marked
        )
        SELECT user_id,
               CAST(floor(epoch(MIN(ts))) AS BIGINT) AS session_start,
               CAST(floor(epoch(MAX(ev_end))) AS BIGINT) AS session_end,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM sess GROUP BY user_id, sid
    """,
}
