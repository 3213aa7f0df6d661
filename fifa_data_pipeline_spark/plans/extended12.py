"""Time-series & distribution statistics (round 4, batch 3):
lag-1 autocorrelation, CUSUM drift detection, exact rolling median,
Benford first-digit audit, per-group mode / geometric mean, and the
Gini coefficient — the statistical-monitoring layer (drift, fraud,
inequality, central tendency) over the same event/order tables.

Every query has an exact DuckDB oracle. Rolling/sorted constructions
pin explicit element-pick formulas (never engine-default quantile
interpolation) so both engines compute the identical value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fifa_data_pipeline_spark.sources.io import read_table

#: Daily (event_type, day, n) counts — the spine several queries
#: share. Day is integer days-since-epoch (no timestamp precision).
def _daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    day = F.datediff(F.to_date("ts"), F.lit("1970-01-01")).cast("int")
    return ev.groupBy("event_type", day.alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )


#: Engine-portable epoch seconds (matches unix_timestamp().cast).
_EPOCH = "CAST(FLOOR(extract(epoch FROM ts)) AS BIGINT)"

_DAILY_SQL = """
          SELECT event_type,
                 CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS INTEGER) AS day,
                 COUNT(*) AS n
          FROM events GROUP BY 1, 2
"""


def q_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of each event type's daily volume: one
    window lag over the tiny daily-count spine, then a corr co-moment
    aggregate per type — the streaming-health "is today like
    yesterday" signal. All heavy lifting is the daily pre-aggregate;
    the window and corr run on |types| × |days| rows."""
    daily = _daily_counts(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.withColumn("prev_n", F.lag("n").over(w))
    return (
        lagged.filter(F.col("prev_n").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.round(F.corr("n", "prev_n"), 6).alias("autocorr_1"),
        )
    )


def q_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM drift detection over daily volumes: per event type,
    cumulative sum of (n − type mean) across days; days where
    |CUSUM| exceeds 2·stddev of the daily counts are flagged. Mean
    and stddev come from one aggregate joined back (broadcast —
    one row per type); the cumulative sum is one ordered window over
    the pre-aggregated spine."""
    daily = _daily_counts(spark, sf_dir)
    stats = daily.groupBy("event_type").agg(
        F.avg("n").alias("__mu"), F.stddev_samp("n").alias("__sd")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cusum = F.sum(F.col("n") - F.col("__mu")).over(w)
    return (
        daily.join(F.broadcast(stats), "event_type")
        .withColumn("cusum", F.round(cusum, 6))
        .select(
            "event_type",
            "day",
            "n",
            "cusum",
            (F.abs(F.col("cusum")) > 2 * F.col("__sd")).alias("drifted"),
        )
    )


def q_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 7-day rolling median of daily volume per event type,
    with an EXPLICIT element-pick rule (sorted frame values; odd →
    middle element, even → mean of the two middles) so both engines
    agree bit-for-bit. The frame is bounded (≤7 rows), so
    collect+sort per row is O(7 log 7) — constant — and the only
    data movement is the one window shuffle over the tiny daily
    spine."""
    daily = _daily_counts(spark, sf_dir)
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, Window.currentRow)
    )
    arr = F.array_sort(F.collect_list(F.col("n").cast("double")).over(w))
    k = F.size(arr)
    mid_hi = F.element_at(arr, (k / 2 + 1).cast("int"))
    mid_lo = F.element_at(arr, ((k + 1) / 2).cast("int"))
    med = F.when(k % 2 == 1, F.element_at(arr, ((k + 1) / 2).cast("int"))).otherwise(
        (mid_lo + mid_hi) / 2.0
    )
    return daily.select(
        "event_type", "day", "n", F.round(med, 6).alias("median_7d")
    )


def q_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit of order totals: observed share of
    each leading digit vs the Benford expectation log10(1 + 1/d),
    plus the per-digit chi-square contribution — the classic
    fabricated-numbers screen as one hash aggregate over a per-row
    digit extraction (substring of the string form; totals are all
    ≥ 1 so no leading-zero handling is needed)."""
    orders = read_table(spark, sf_dir, "orders")
    digit = F.substring(F.col("o_totalprice").cast("string"), 1, 1).cast("int")
    counts = orders.groupBy(digit.alias("digit")).agg(
        F.count(F.lit(1)).alias("n")
    )
    total = counts.agg(F.sum("n").alias("__tot"))
    expected = F.log10(1 + 1 / F.col("digit"))
    share = F.col("n") / F.col("__tot")
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n",
            F.round(share, 6).alias("observed"),
            F.round(expected, 6).alias("benford"),
            F.round(
                (share - expected) * (share - expected) / expected * F.col("__tot"),
                4,
            ).alias("chi2_term"),
        )
    )


def q_mode_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Central-tendency report per customer segment: deterministic
    modal order priority (max count, ties → smallest value — pinned
    via max_by on a (count, value) ordering key rather than the
    engine's arbitrary mode pick) and the geometric mean of order
    totals (exp∘avg∘ln — the multiplicative average that one
    outlier order can't drag)."""
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    j = orders.join(
        F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"]
    )
    pri = j.groupBy("c_mktsegment", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("__n")
    )
    # deterministic mode: order by (count desc, value asc)
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("__n"), F.asc("o_orderpriority")
    )
    modes = (
        pri.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("c_mktsegment", F.col("o_orderpriority").alias("modal_priority"))
    )
    geo = j.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.exp(F.avg(F.log("o_totalprice"))), 4).alias("geo_mean_price"),
    )
    return geo.join(F.broadcast(modes), "c_mktsegment")


def q_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer spend per nation (inequality of
    wallet share — the Lorenz-curve complement to `q_hhi`'s supplier
    concentration): G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n over spend ranked
    ascending within nation (ties broken by custkey, shared with the
    oracle). One aggregate to per-customer spend, one window rank,
    one closing aggregate — all keyed on the nation."""
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    spend = (
        orders.join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .groupBy("c_nationkey", "c_custkey")
        .agg(F.sum("o_totalprice").alias("spend"))
    )
    w = Window.partitionBy("c_nationkey").orderBy("spend", "c_custkey")
    ranked = spend.withColumn("__i", F.row_number().over(w))
    return ranked.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(
            2 * F.sum(F.col("__i") * F.col("spend"))
            / (F.count(F.lit(1)) * F.sum("spend"))
            - (F.count(F.lit(1)) + 1) / F.count(F.lit(1)),
            6,
        ).alias("gini"),
    )


def q_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of lookup: for each purchase, the user's EARLIEST
    view at or after it ("did the buyer come back?"). Views are
    canonicalized per (user, second) — min event_id — so the match
    is deterministic in both engines; NULLs mean no later view.
    One union + one shuffle via the time-reversed running-last form
    (see :func:`~...relational.as_of_join_forward`)."""
    from fifa_data_pipeline_spark.operators.relational import (
        as_of_join_forward,
    )

    ev = read_table(spark, sf_dir, "events")
    ep = F.unix_timestamp("ts").cast("bigint")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", ep.alias("ep")
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .select("user_id", ep.alias("vep"), "event_id")
        .groupBy("user_id", "vep")
        .agg(F.min("event_id").alias("view_event_id"))
    )
    out = as_of_join_forward(
        purchases, views, "user_id", "ep", "vep", ["view_event_id", "vep"]
    )
    return out.select(
        "event_id",
        "user_id",
        "ep",
        F.col("next_view_event_id").alias("next_event_id"),
        F.col("next_vep").alias("next_ep"),
    )



QUERIES = {
    "q_autocorr": q_autocorr,
    "q_cusum": q_cusum,
    "q_rolling_median": q_rolling_median,
    "q_benford": q_benford,
    "q_mode_group": q_mode_group,
    "q_gini": q_gini,
    "q_asof_forward": q_asof_forward,
}

ORACLES = {
    "q_autocorr": f"""
        WITH daily AS ({_DAILY_SQL}),
        lagged AS (
          SELECT event_type, n,
                 LAG(n) OVER (PARTITION BY event_type ORDER BY day) AS prev_n
          FROM daily
        )
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
               ROUND(corr(n, prev_n), 6) AS autocorr_1
        FROM lagged WHERE prev_n IS NOT NULL GROUP BY event_type
    """,
    "q_cusum": f"""
        WITH daily AS ({_DAILY_SQL}),
        stats AS (
          SELECT event_type, AVG(n) AS mu, stddev_samp(n) AS sd
          FROM daily GROUP BY event_type
        )
        SELECT d.event_type, d.day, CAST(d.n AS BIGINT) AS n,
               -- "+ 0.0" folds IEEE -0.0 to +0.0: DuckDB's ROUND keeps
               -- the sign of a tiny negative sum, Spark's BigDecimal
               -- round has no signed zero — they'd stringify apart.
               ROUND(SUM(d.n - s.mu) OVER (PARTITION BY d.event_type
                                           ORDER BY d.day), 6) + 0.0
                 AS cusum,
               abs(SUM(d.n - s.mu) OVER (PARTITION BY d.event_type
                                         ORDER BY d.day)) > 2 * s.sd
                 AS drifted
        FROM daily d JOIN stats s ON d.event_type = s.event_type
    """,
    "q_rolling_median": f"""
        WITH daily AS ({_DAILY_SQL}),
        fr AS (
          SELECT event_type, day, n,
                 list_sort(list(CAST(n AS DOUBLE)) OVER (
                   PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS a
          FROM daily
        )
        SELECT event_type, day, CAST(n AS BIGINT) AS n,
               -- floor() pins the index: DuckDB's double→int CAST
               -- rounds half-to-even while Spark's truncates
               ROUND(CASE WHEN len(a) % 2 = 1
                          THEN a[CAST(floor((len(a) + 1) / 2) AS INTEGER)]
                          ELSE (a[CAST(floor((len(a) + 1) / 2) AS INTEGER)] +
                                a[CAST(floor(len(a) / 2 + 1) AS INTEGER)]) / 2.0
                     END, 6) AS median_7d
        FROM fr
    """,
    "q_benford": """
        WITH c AS (
          SELECT CAST(substr(CAST(o_totalprice AS VARCHAR), 1, 1) AS INTEGER)
                   AS digit,
                 COUNT(*) AS n
          FROM orders GROUP BY 1
        ), tot AS (SELECT SUM(n) AS t FROM c)
        SELECT digit, CAST(n AS BIGINT) AS n,
               ROUND(n / t, 6) AS observed,
               ROUND(log10(1 + 1.0 / digit), 6) AS benford,
               ROUND(pow(n / t - log10(1 + 1.0 / digit), 2)
                     / log10(1 + 1.0 / digit) * t, 4) AS chi2_term
        FROM c, tot
    """,
    "q_mode_group": """
        WITH j AS (
          SELECT c_mktsegment, o_orderpriority, o_totalprice
          FROM orders JOIN customer ON o_custkey = c_custkey
        ), pri AS (
          SELECT c_mktsegment, o_orderpriority, COUNT(*) AS n
          FROM j GROUP BY 1, 2
        ), modes AS (
          SELECT c_mktsegment, o_orderpriority AS modal_priority,
                 ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                    ORDER BY n DESC, o_orderpriority) AS rn
          FROM pri
        )
        SELECT g.c_mktsegment, g.n_orders, g.geo_mean_price,
               m.modal_priority
        FROM (
          SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_orders,
                 ROUND(exp(AVG(ln(o_totalprice))), 4) AS geo_mean_price
          FROM j GROUP BY 1
        ) g JOIN modes m ON g.c_mktsegment = m.c_mktsegment AND m.rn = 1
    """,
    "q_gini": """
        WITH spend AS (
          SELECT c_nationkey, c_custkey, SUM(o_totalprice) AS spend
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY 1, 2
        ), ranked AS (
          SELECT c_nationkey, spend,
                 ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                    ORDER BY spend, c_custkey) AS i
          FROM spend
        )
        SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_customers,
               ROUND(2 * SUM(i * spend) / (COUNT(*) * SUM(spend))
                     - (COUNT(*) + 1) / CAST(COUNT(*) AS DOUBLE), 6) AS gini
        FROM ranked GROUP BY c_nationkey
    """,
    "q_asof_forward": f"""
        WITH e AS (
          SELECT event_id, user_id, event_type, {_EPOCH} AS ep FROM events
        ), p AS (
          SELECT event_id, user_id, ep FROM e WHERE event_type = 'purchase'
        ), v AS (
          SELECT user_id, ep AS vep, MIN(event_id) AS view_event_id
          FROM e WHERE event_type = 'view' GROUP BY 1, 2
        )
        SELECT p.event_id, p.user_id, p.ep,
               v.view_event_id AS next_event_id, v.vep AS next_ep
        FROM p ASOF LEFT JOIN v
          ON p.user_id = v.user_id AND v.vep >= p.ep
    """,
}
