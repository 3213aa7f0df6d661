"""Fourth extended-surface batch: behavioral / event-history
analytics — cohort retention, funnel conversion, SCD-2 change-capture
historization, gaps-and-islands streak detection, and native session
windows (``F.session_window``). Every query is DuckDB-oracle-checked.

These are the event-table idioms a production pipeline layers on the
reference's purely-batch surface (the reference's only temporal column
is a partition date — SURVEY.md §2.5): product-analytics rollups
(cohort/funnel), warehouse historization (SCD-2), and the two
sessionization forms (the lag+cumsum form lives in
``operators.events.sessionize``; here the engine-native
``session_window`` twin).

All timestamps are reduced to epoch seconds (or epoch days) before
comparison/output so results hash identically across Spark's µs and
DuckDB's ns timestamp precision (FIXTURES.md caveat).

Shared scale posture: every query shuffles on a fine-grained key
(user_id / customer key) exactly once or twice, with map-side partial
aggregation where a hash aggregate is involved; none of them collect
to the driver or use a global (un-keyed) sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fifa_data_pipeline_spark.sources.io import read_table


def _epoch_s(col: str = "ts"):
    return F.unix_timestamp(F.col(col)).cast("bigint")


# --- cohort retention -------------------------------------------------------

def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-activity day
    (the cohort), counted distinct in each subsequent week offset.

    The cohort date is a per-user window MIN (no join-back needed —
    one shuffle on user_id), then one hash aggregate on
    (cohort_day, week_offset) with a map-side distinct-partial.
    At 100 TB the user window is the natural partitioner; a hot user
    only adds rows to one partition's sort, and the second shuffle
    carries (cohort, offset, user) triples already deduplicated
    map-side by the distinct aggregate."""
    ev = read_table(spark, sf_dir, "events")
    day = F.to_date("ts")
    w_user = Window.partitionBy("user_id")
    with_cohort = ev.select(
        "user_id",
        day.alias("__d"),
    ).withColumn("__cohort", F.min("__d").over(w_user))
    return (
        with_cohort.select(
            F.datediff("__cohort", F.lit("1970-01-01"))
            .cast("int")
            .alias("cohort_day"),
            F.floor(F.datediff("__d", "__cohort") / 7)
            .cast("int")
            .alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_day", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


# --- funnel conversion ------------------------------------------------------

def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel signup → view → purchase: a user converts at a
    stage only with an event strictly after their previous-stage
    time (min-time semantics at each stage). Returns one row per
    stage with the surviving distinct-user count.

    Three per-user min-aggregates chained by co-partitioned joins —
    all three shuffles hash on user_id, so AQE coalesces them onto
    one exchange footprint; each stage's output is one row per
    converting user (monotonically shrinking). Strictly-after is
    evaluated on floored epoch seconds so both engines break
    sub-second ties identically."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_type", _epoch_s().alias("__ep")
    )
    s1 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("__ep").alias("__t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "view")
        .join(s1, "user_id")
        .filter(F.col("__ep") > F.col("__t1"))
        .groupBy("user_id")
        .agg(F.min("__ep").alias("__t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("__ep") > F.col("__t2"))
        .groupBy("user_id")
        .agg(F.min("__ep").alias("__t3"))
    )

    def stage(df: DataFrame, step: int, name: str) -> DataFrame:
        return df.agg(
            F.lit(step).alias("step"),
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).alias("n_users"),
        )

    return (
        stage(s1, 1, "signup")
        .unionAll(stage(s2, 2, "view"))
        .unionAll(stage(s3, 3, "purchase"))
    )


# --- SCD-2 change capture ---------------------------------------------------

def q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-2 historization of each user's event_type "status": keep
    only change points (value differs from the user's previous event)
    and emit [valid_from, valid_to) epoch-second intervals plus a
    version number — the standard slowly-changing-dimension type-2
    build, derived from an append-only event log.

    Two window passes over the SAME (user_id) partitioning and sort —
    Catalyst plans a single Exchange+Sort feeding both Window
    operators, so the whole historization is one shuffle. The order
    key (epoch_s, event_id) is a deterministic total order shared
    with the oracle."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", _epoch_s().alias("__ep")
    )
    w = Window.partitionBy("user_id").orderBy("__ep", "event_id")
    flagged = ev.withColumn("__prev", F.lag("event_type").over(w)).filter(
        F.col("__prev").isNull() | (F.col("__prev") != F.col("event_type"))
    )
    w2 = Window.partitionBy("user_id").orderBy("__ep", "event_id")
    return flagged.select(
        "user_id",
        "event_type",
        F.col("__ep").alias("valid_from"),
        F.lead("__ep").over(w2).alias("valid_to"),
        F.row_number().over(w2).cast("int").alias("version"),
    )


# --- gaps and islands -------------------------------------------------------

def q_gap_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-day order streaks per customer (gaps-and-islands):
    distinct order days, then the classic ``day_number − row_number``
    island key, then one aggregate per island → (start, end, length).

    Both windows and both aggregates key on o_custkey — a single
    fine-grained shuffle; the distinct collapses same-day orders
    map-side first. Days are integers (days since epoch) end-to-end,
    so no timestamp precision is involved."""
    orders = read_table(spark, sf_dir, "orders")
    days = (
        orders.select(
            "o_custkey",
            F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01"))
            .cast("int")
            .alias("__day"),
        )
        .distinct()
    )
    w = Window.partitionBy("o_custkey").orderBy("__day")
    islands = days.withColumn(
        "__island", F.col("__day") - F.row_number().over(w)
    )
    return (
        islands.groupBy("o_custkey", "__island")
        .agg(
            F.min("__day").alias("start_day"),
            F.max("__day").alias("end_day"),
            F.count(F.lit(1)).alias("n_days"),
        )
        .select("o_custkey", "start_day", "end_day", "n_days")
    )


# --- native session windows -------------------------------------------------

def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sessions via the engine-native ``F.session_window``
    (30-minute inactivity gap): Spark merges overlapping
    [ts, ts+gap) intervals inside a session-window aggregate —
    the same expression runs incrementally under Structured
    Streaming, unlike the lag+cumsum form in
    ``operators.events.sessionize``.

    Semantics pinned for the oracle: a new session starts when the
    µs-precision delta is >= the gap (Spark merges only on strict
    overlap), vs the lag-form's strictly-greater rule — the oracle
    reproduces the >= rule on epoch-µs integers. Output bounds are
    epoch seconds: window.end is last-event + gap by definition, so
    last event = end − gap.

    One shuffle on (user_id); the session merge happens inside the
    aggregation operator, state bounded per user."""
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_timestamp("w.start").cast("bigint").alias("session_start"),
            (F.unix_timestamp("w.end").cast("bigint") - 1800).alias(
                "session_last"
            ),
            "n_events",
            "sum_value",
        )
    )


QUERIES = {
    "q_cohort_retention": q_cohort_retention,
    "q_funnel": q_funnel,
    "q_scd2": q_scd2,
    "q_gap_islands": q_gap_islands,
    "q_session_window": q_session_window,
}

ORACLES = {
    "q_cohort_retention": """
        WITH d AS (
          SELECT user_id, CAST(ts AS DATE) AS day FROM events
        ), c AS (
          SELECT user_id, day,
                 MIN(day) OVER (PARTITION BY user_id) AS cohort
          FROM d
        )
        SELECT CAST(cohort - DATE '1970-01-01' AS INTEGER) AS cohort_day,
               CAST(FLOOR((day - cohort) / 7) AS INTEGER) AS week_offset,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        FROM c GROUP BY cohort_day, week_offset
    """,
    "q_funnel": """
        WITH e AS (
          SELECT user_id, event_type,
                 CAST(FLOOR(extract(epoch FROM ts)) AS BIGINT) AS ep
          FROM events
        ), s1 AS (
          SELECT user_id, MIN(ep) AS t1 FROM e
          WHERE event_type = 'signup' GROUP BY user_id
        ), s2 AS (
          SELECT e.user_id, MIN(ep) AS t2 FROM e
          JOIN s1 USING (user_id)
          WHERE event_type = 'view' AND e.ep > s1.t1 GROUP BY e.user_id
        ), s3 AS (
          SELECT e.user_id, MIN(ep) AS t3 FROM e
          JOIN s2 USING (user_id)
          WHERE event_type = 'purchase' AND e.ep > s2.t2 GROUP BY e.user_id
        )
        SELECT 1 AS step, 'signup' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM s1
        UNION ALL
        SELECT 2, 'view', CAST(COUNT(*) AS BIGINT) FROM s2
        UNION ALL
        SELECT 3, 'purchase', CAST(COUNT(*) AS BIGINT) FROM s3
    """,
    "q_scd2": """
        WITH e AS (
          SELECT user_id, event_id, event_type,
                 CAST(FLOOR(extract(epoch FROM ts)) AS BIGINT) AS ep
          FROM events
        ), flagged AS (
          SELECT user_id, event_id, event_type, ep,
                 LAG(event_type) OVER w AS prev
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ep, event_id)
        ), changes AS (
          SELECT * FROM flagged
          WHERE prev IS NULL OR prev <> event_type
        )
        SELECT user_id, event_type,
               ep AS valid_from,
               LEAD(ep) OVER w AS valid_to,
               CAST(ROW_NUMBER() OVER w AS INTEGER) AS version
        FROM changes
        WINDOW w AS (PARTITION BY user_id ORDER BY ep, event_id)
    """,
    "q_gap_islands": """
        WITH d AS (
          SELECT DISTINCT o_custkey,
                 CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS INTEGER) AS day
          FROM orders
        ), i AS (
          SELECT o_custkey, day,
                 day - ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY day) AS island
          FROM d
        )
        SELECT o_custkey,
               CAST(MIN(day) AS INTEGER) AS start_day,
               CAST(MAX(day) AS INTEGER) AS end_day,
               CAST(COUNT(*) AS BIGINT) AS n_days
        FROM i GROUP BY o_custkey, island
    """,
    "q_session_window": """
        WITH e AS (
          SELECT user_id, value, epoch_us(ts) AS us FROM events
        ), flagged AS (
          SELECT user_id, value, us,
                 CASE WHEN us - LAG(us) OVER w IS NULL
                        OR us - LAG(us) OVER w >= 1800000000
                      THEN 1 ELSE 0 END AS is_new
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)
        ), sess AS (
          SELECT user_id, value, us,
                 SUM(is_new) OVER (
                   PARTITION BY user_id ORDER BY us
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
          FROM flagged
        )
        SELECT user_id,
               CAST(FLOOR(MIN(us) / 1000000) AS BIGINT) AS session_start,
               CAST(FLOOR(MAX(us) / 1000000) AS BIGINT) AS session_last,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               ROUND(SUM(value), 6) AS sum_value
        FROM sess GROUP BY user_id, sid
    """,
}
