"""TPC-H suite completion: analogues of the 18 queries beyond
Q3/Q5/Q10/Q18 (see ``tpch.py``), adapted to the testdata schema.

The testdata star schema lacks ``partsupp`` and several TPC-H
columns (``l_commitdate``/``l_receiptdate``/``l_shipmode``/
``l_shipinstruct``, ``o_comment``, ``c_phone``, ``p_container``),
so five queries are *documented analogues* that preserve the plan
topology while substituting available columns:

- Q2/Q16/Q20 use **lineitem as the part↔supplier bridge** in place
  of partsupp (same correlated-min / distinct-count / nested-semi
  shapes).
- Q4/Q12/Q21 define "late" as ``l_shipdate > o_orderdate + N days``
  in place of the commit/receipt comparison; Q12 groups by
  ``l_linestatus`` in place of ``l_shipmode``.
- Q9 prices cost as ``0.5 * p_retailprice * l_quantity`` in place of
  ``ps_supplycost * l_quantity``.
- Q13 excludes an ``o_orderpriority`` class in place of the
  ``o_comment NOT LIKE`` filter; Q22 derives the "country code" as
  ``c_custkey % 5`` in place of ``substring(c_phone, 1, 2)``.

Every query keeps the canonical TPC-H plan posture, verified in
``tests/test_tpch.py``: broadcast hints appear ONLY on sides bounded
by construction — nation/region frames, 1-row scalar aggregates, and
HAVING key sets. Anything that scales with SF (orders in any form,
customer/supplier/part slices, filtered facts) carries no hint: AQE
promotes SMJ→BHJ at runtime when the side is actually under the
adaptive threshold, and keeps the shuffle join at cluster scale
where a pinned broadcast would OOM executors. The fact table crosses
at most one shuffle per aggregate grain, scans carry PushedFilters,
and every top-k is TakeOrderedAndProject with a full tiebreaker,
never a global sort.

Reference parity note: the reference repo has no decision-support
queries at all (SURVEY.md §2.5 — absences provided as extensions);
these exist because the engine claims the full analytics surface a
warehouse user expects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fifa_data_pipeline_spark.sources.io import read_table


def _rev():
    """Per-lineitem revenue term (lazy: needs an active session)."""
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# --------------------------------------------------------------- Q1
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary: the canonical map-side-combine aggregate.
    One narrow scan (4 pushed-down columns + the shipdate filter at
    the parquet reader), partial HashAggregate per partition, ONE
    6-row shuffle — the shape that must hold at any scale."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= "2001-09-01"
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(_rev()), 2).alias("sum_disc_price"),
        F.round(F.sum(_rev() * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


# --------------------------------------------------------------- Q2
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum-cost-supplier analogue (no partsupp: unit cost is the
    per-(part, supplier) MIN of ``l_extendedprice / l_quantity``
    observed in lineitem). The correlated-min subquery becomes the
    classic agg + equality-join-back: min cost per part re-joined to
    the per-supplier costs — exact double equality is safe because
    both sides carry the *same* unaggregated values and MIN is
    order-independent."""
    part = read_table(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 10) & (F.col("p_type") == "STANDARD")
    ).select("p_partkey", "p_type")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    supp = (
        read_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                nation.join(
                    F.broadcast(region),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                ).select("n_nationkey", "n_name")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    li = read_table(spark, sf_dir, "lineitem")
    cost = (
        # part/supplier slices scale with SF — AQE picks the strategy.
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("p_partkey", "p_type", "s_suppkey", "s_name",
                 "s_acctbal", "n_name")
        .agg(
            F.min(F.col("l_extendedprice") / F.col("l_quantity"))
            .alias("__cost")
        )
    )
    mincost = cost.groupBy(F.col("p_partkey").alias("__mpk")).agg(
        F.min("__cost").alias("__min_cost")
    )
    return (
        cost.join(
            mincost,
            (F.col("p_partkey") == F.col("__mpk"))
            & (F.col("__cost") == F.col("__min_cost")),
        )
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_type",
            F.round("__cost", 4).alias("supply_cost"),
        )
        .orderBy(
            F.desc("s_acctbal"), F.asc("n_name"), F.asc("s_name"),
            F.asc("p_partkey"),
        )
        .limit(100)
    )


# --------------------------------------------------------------- Q4
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority checking analogue: count Q3-1997 orders per
    priority that had at least one LATE lineitem (shipped > 60 days
    after the order date; the commit<receipt comparison in real
    TPC-H). EXISTS == left-semi join with the range predicate in the
    join condition, so the probe stays one pass and dedup is free."""
    orders = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-07-01")
        & (F.col("o_orderdate") < "1997-10-01")
    )
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    return (
        orders.join(
            li,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
            ),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# --------------------------------------------------------------- Q6
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-forecast filter-aggregate: every predicate reaches the
    parquet scan (PushedFilters on shipdate/discount/quantity), then
    an all-to-one single-row aggregate — zero joins, zero wide
    shuffles beyond the 1-row combine."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.round(
            F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2
        ).alias("revenue")
    )


# --------------------------------------------------------------- Q7
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-shipping: bilateral 1996-97 trade between NATION_3 and
    NATION_8 by ship year. The nation filter is applied to customer
    and supplier BEFORE their joins, shrinking the orders→customer
    side to 2/25 of orders — still fact-scale, so no hint: AQE
    decides the strategy once the runtime size is known. Only the
    25-row nation frame is pinned; lineitem shuffles once for the
    final 3-key aggregate."""
    nation = read_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_8")
    )
    cust_n = (
        read_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    ord_cust = (
        read_table(spark, sf_dir, "orders")
        .join(cust_n, F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "cust_nation")
    )
    supp_n = (
        read_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                nation.select(
                    F.col("n_nationkey").alias("__nk"),
                    F.col("n_name").alias("supp_nation"),
                )
            ),
            F.col("s_nationkey") == F.col("__nk"),
        )
        .select("s_suppkey", "supp_nation")
    )
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
    )
    return (
        li.join(ord_cust, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp_n, F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_3")
                & (F.col("cust_nation") == "NATION_8")
            )
            | (
                (F.col("supp_nation") == "NATION_8")
                & (F.col("cust_nation") == "NATION_3")
            )
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
    )


# --------------------------------------------------------------- Q8
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National market share: NATION_3's share of 1995-96 ECONOMY-part
    revenue sold to EUROPE customers, per order year. The share is a
    conditional-sum / sum ratio inside one aggregate — no second
    pass, no join back."""
    part = read_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "ECONOMY"
    ).select("p_partkey")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    eur_cust = (
        read_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(
                nation.join(
                    F.broadcast(region),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                ).select("n_nationkey")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    ord_eur = (
        read_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= "1995-01-01")
            & (F.col("o_orderdate") < "1997-01-01")
        )
        .join(eur_cust, F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", F.year("o_orderdate").alias("o_year"))
    )
    supp_n = (
        read_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                nation.select(
                    F.col("n_nationkey").alias("__nk"),
                    F.col("n_name").alias("supp_nation"),
                )
            ),
            F.col("s_nationkey") == F.col("__nk"),
        )
        .select("s_suppkey", "supp_nation")
    )
    li = read_table(spark, sf_dir, "lineitem")
    vol = (
        # part / EUROPE-orders / supplier all scale with SF — AQE's
        # runtime size check picks BHJ when a side is genuinely small.
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(ord_eur, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp_n, F.col("l_suppkey") == F.col("s_suppkey"))
    )
    return vol.groupBy("o_year").agg(
        F.round(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_3", _rev()).otherwise(
                    F.lit(0.0)
                )
            )
            / F.sum(_rev()),
            6,
        ).alias("mkt_share")
    )


# --------------------------------------------------------------- Q9
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-type profit analogue (no partsupp: unit cost proxied
    as ``0.5 * p_retailprice``): profit per supplier nation per order
    year for parts whose name contains 'gear'. Same star topology as
    real Q9, with every SF-scaling side (part slice, supplier,
    orders) left to AQE; the only wide shuffle is the final 2-key
    aggregate."""
    part = read_table(spark, sf_dir, "part").filter(
        F.col("p_name").contains("gear")
    ).select("p_partkey", "p_retailprice")
    nation = read_table(spark, sf_dir, "nation")
    supp_n = (
        read_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "n_name")
    )
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("o_year")
    )
    li = read_table(spark, sf_dir, "lineitem")
    # The profit terms are fixed-point (2-decimal prices), so double
    # sums can land EXACTLY on a half-cent and round differently per
    # accumulation order — sum in DECIMAL for exact, order-free math.
    amount = (
        _rev() - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
    ).cast("decimal(18,6)")
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp_n, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("n_name").alias("nation"), F.col("o_year"))
        .agg(
            F.round(F.sum(amount), 2).cast("double").alias("sum_profit")
        )
    )


# -------------------------------------------------------------- Q11
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Important-part value analogue (no partsupp: a part's "stock
    value" is its total lineitem extended price): parts whose value
    exceeds 0.08% of the global total. The global total is a 1-row
    aggregate broadcast into the filter (BroadcastNestedLoopJoin of
    one row) — the scalar-subquery-over-the-same-fact shape; the fact
    is scanned twice but shuffled only at the part grain."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice"
    )
    per_part = li.groupBy("l_partkey").agg(
        F.sum("l_extendedprice").alias("__value")
    )
    total = li.agg(
        (F.sum("l_extendedprice") * F.lit(0.0008)).alias("__threshold")
    )
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("__value") > F.col("__threshold"))
        .select(
            "l_partkey", F.round("__value", 2).alias("part_value")
        )
    )


# -------------------------------------------------------------- Q12
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-priority analogue (no l_shipmode: grouped by
    ``l_linestatus``; "late" = shipped > 30 days after order date):
    per line status, how many late 1997 shipments carried
    high-priority vs low-priority orders — the CASE-sum pivot
    aggregate."""
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


# -------------------------------------------------------------- Q13
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order-count distribution (the o_comment exclusion
    becomes an o_orderpriority exclusion): LEFT join so zero-order
    customers survive with count 0, then a second aggregate over the
    counts. Two shuffles by construction (custkey grain, then count
    grain) — the second is tiny."""
    cust = read_table(spark, sf_dir, "customer").select("c_custkey")
    orders = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    ).select("o_orderkey", "o_custkey")
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


# -------------------------------------------------------------- Q14
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion-revenue share for one ship month: conditional-sum /
    sum ratio over a broadcast part join — single row out, single
    1-row shuffle."""
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-09-01")
        & (F.col("l_shipdate") < "1997-10-01")
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", _rev()).otherwise(
                        F.lit(0.0)
                    )
                )
                / F.sum(_rev()),
                6,
            ).alias("promo_revenue")
        )
    )


# -------------------------------------------------------------- Q15
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier: per-supplier Q1-1996 revenue, keep the row(s)
    equal to the max. The "revenue view + scalar max subquery"
    becomes agg → 1-row max → broadcast equality join back — ties
    (multiple suppliers at the max) are preserved exactly as the SQL
    form does."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1996-04-01")
    )
    rev = li.groupBy("l_suppkey").agg(F.sum(_rev()).alias("__total"))
    top = rev.agg(F.max("__total").alias("__max"))
    supp = read_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    return (
        rev.join(F.broadcast(top))
        .filter(F.col("__total") == F.col("__max"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round("__total", 2).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


# -------------------------------------------------------------- Q16
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part-supplier-relationship count analogue (no partsupp: the
    bridge is DISTINCT (part, supplier) pairs observed in lineitem;
    the "complaint suppliers" NOT IN becomes an anti-join on
    negative account balance): distinct supplier count per
    (brand, type, size) over a filtered part set."""
    part = read_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad_supp = read_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey"
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(
            bad_supp,
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# -------------------------------------------------------------- Q17
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity-order revenue: Brand#3 lineitems whose quantity
    is under 20% of that part's average quantity. The correlated AVG
    subquery becomes a per-part aggregate broadcast back onto the
    same (already part-filtered) rows — the fact is scanned once per
    side but only the filtered slice, and nothing wide shuffles
    except the per-part aggregate."""
    pk = read_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#3"
    ).select("p_partkey")
    li = (
        read_table(spark, sf_dir, "lineitem")
        .join(pk, F.col("l_partkey") == F.col("p_partkey"))
        .select("l_partkey", "l_quantity", "l_extendedprice")
    )
    lim = li.groupBy(F.col("l_partkey").alias("__pk")).agg(
        (F.avg("l_quantity") * F.lit(0.2)).alias("__lim")
    )
    return (
        li.join(lim, F.col("l_partkey") == F.col("__pk"))
        .filter(F.col("l_quantity") < F.col("__lim"))
        .agg(
            F.round(F.sum("l_extendedprice") / F.lit(7.0), 2).alias(
                "avg_yearly"
            )
        )
    )


# -------------------------------------------------------------- Q19
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discounted-revenue with disjunctive predicates (containers and
    ship modes absent: the three OR branches pair brand, size range,
    and quantity range): the OR spans both join sides, so it
    evaluates post-join while the partkey equality still drives a
    broadcast hash join — the disjunction must NOT force a nested
    loop."""
    part = read_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    branch = (
        (
            (F.col("p_brand") == "Brand#4")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#14")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#24")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(
            part,
            (F.col("l_partkey") == F.col("p_partkey")) & branch,
        )
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
    )


# -------------------------------------------------------------- Q20
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Excess-shipment suppliers analogue (no partsupp availability:
    a supplier qualifies when their 1996 shipped quantity of
    'small *' parts exceeds half the average such quantity across
    suppliers): nested aggregate → threshold → SEMI join into the
    supplier dim, then the EUROPE nation filter. Same
    semi-join-on-an-aggregate topology as real Q20."""
    pk = read_table(spark, sf_dir, "part").filter(
        F.col("p_name").startswith("small")
    ).select("p_partkey")
    li = (
        read_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
        )
        .join(pk, F.col("l_partkey") == F.col("p_partkey"))
    )
    qty = li.groupBy("l_suppkey").agg(F.sum("l_quantity").alias("__qty"))
    thresh = qty.agg((F.avg("__qty") * F.lit(0.5)).alias("__half"))
    good = (
        qty.join(F.broadcast(thresh))
        .filter(F.col("__qty") > F.col("__half"))
        .select("l_suppkey")
    )
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    eur_nk = nation.join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey")
    return (
        read_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(good),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .join(
            F.broadcast(eur_nk),
            F.col("s_nationkey") == F.col("n_nationkey"),
            "left_semi",
        )
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


# -------------------------------------------------------------- Q21
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Waiting-orders analogue (no receipt/commit dates: the
    "supplier who kept the order waiting" is the UNIQUE supplier of
    the LAST-shipped lineitem of a multi-supplier 'F' order). The
    exists / not-exists pair becomes per-order aggregates: max ship
    date + distinct supplier count, re-joined at the max to find
    orders where exactly one supplier shipped last. Both aggregates
    shuffle at the order grain only; supplier names broadcast.

    r8 stage-share accounting (sf1, min-of-3 warm noop writes,
    cumulative): 3-col scan 0.17 s; + broadcast-semi probe of the
    ~730k 'F'-order keys over 6M lineitems 0.45 s; + the order-grain
    hash aggregate 0.76 s; full query (uniqueness filter + supplier
    broadcast join + name aggregate + top-20) 1.30 s — down from the
    1.99 s join-back form the r7 verdict flagged. DuckDB runs the
    oracle in 0.28 s; the residual is Spark's multi-stage dispatch
    (5 AQE stages) plus decimal128 aggregate buffers, not plan shape:
    the plan has ONE fact exchange, no sorts, no expand, and the
    alternatives (aggregate-before-semi-join: 1.57 s; struct-max
    two-level: 1.42 s; original join-back: 1.99 s) all measured
    slower."""
    orders_f = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    li = (
        read_table(spark, sf_dir, "lineitem")
        .join(
            # status-'F' orders are ~half the fact — never a pin.
            orders_f,
            F.col("l_orderkey") == F.col("o_orderkey"),
            "left_semi",
        )
        .select("l_orderkey", "l_suppkey", "l_shipdate")
    )
    # Single-aggregation form, NO fact re-join (r8: replaced the
    # stats-join-back-at-max-shipdate form — 1.9 s -> see BASELINE.md
    # at sf1). The exists/not-exists pair collapses to FOUR
    # hash-aggregable order-grain aggregates over the semi-joined
    # fact:
    #   - "order used >= 2 suppliers" = min(supp) != max(supp)
    #     (the r6 countDistinct>=2 trick — no expand, single pass);
    #   - "exactly one supplier shipped last" + "who" via an exact
    #     DECIMAL(38,0) encoding enc = micros(shipdate)*1e19 + supp:
    #     max(enc) carries (max ship date, LARGEST suppkey at it) and
    #     max with the complemented key (E-1-supp) carries the
    #     SMALLEST; the offender is unique iff the two agree. The
    #     session pins UTC, so unix_micros on the NTZ cast is an
    #     exact monotone bijection; suppkey is a non-negative BIGINT
    #     < 1e19 by type, so the mixed-radix encoding never collides
    #     and DECIMAL(38,0) holds any timestamp up to year ~300k.
    # Every aggregate is a primitive-buffer HashAggregate (the
    # earlier max(struct) forced Sort+SortAggregate pairs), so the
    # whole query is scan -> broadcast semi -> partial agg ->
    # ONE l_orderkey exchange (map-side combine shrinks the fact to
    # the order grain first) -> filter -> tiny joins.
    E = "CAST('10000000000000000000' AS DECIMAL(38,0))"
    enc = (
        "CAST(unix_micros(CAST(l_shipdate AS TIMESTAMP)) AS DECIMAL(38,0))"
        f" * {E}"
    )
    offender = (
        li.select(
            "l_orderkey",
            "l_suppkey",
            F.expr(f"{enc} + CAST(l_suppkey AS DECIMAL(38,0))").alias(
                "__enc_hi"
            ),
            F.expr(
                f"{enc} + ({E} - 1 - CAST(l_suppkey AS DECIMAL(38,0)))"
            ).alias("__enc_lo"),
        )
        .groupBy("l_orderkey")
        .agg(
            F.min("l_suppkey").alias("__s_min"),
            F.max("l_suppkey").alias("__s_max"),
            F.max("__enc_hi").alias("__hi"),
            F.max("__enc_lo").alias("__lo"),
        )
        .filter(
            # uniqueness via ONE pmod: __hi - __lo = s_hi + s_lo -
            # (E-1) (the date terms cancel — both maxes sit at the
            # max date), so s_hi == s_lo iff 2*s_hi equals that sum.
            (F.col("__s_min") != F.col("__s_max"))
            & F.expr(f"2 * pmod(__hi, {E}) = __hi - __lo + ({E} - 1)")
        )
        .select(F.expr(f"CAST(pmod(__hi, {E}) AS BIGINT)").alias("__supp"))
    )
    supp = read_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    return (
        offender.join(
            supp, F.col("__supp") == F.col("s_suppkey")
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


# -------------------------------------------------------------- Q22
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global-sales-opportunity analogue ("country code" =
    ``c_custkey % 5``; "never ordered" = no order since 2001-01-01):
    rich-but-dormant customers per code. The positive-balance average
    is a 1-row broadcast; the dormancy check is an anti-join against
    recent orders — customer shuffles only for the final code-grain
    aggregate."""
    cust = read_table(spark, sf_dir, "customer").withColumn(
        "cntrycode", (F.col("c_custkey") % 5).cast("int")
    ).filter(F.col("cntrycode").isin(0, 1, 2))
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("__avg")
    )
    recent = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= "2001-01-01"
    ).select("o_custkey")
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg"))
        .join(
            # date-filtered orders: tiny here, unbounded at 100 TB.
            recent,
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


QUERIES = {
    "q_tpch_q1": q_tpch_q1,
    "q_tpch_q2": q_tpch_q2,
    "q_tpch_q4": q_tpch_q4,
    "q_tpch_q6": q_tpch_q6,
    "q_tpch_q7": q_tpch_q7,
    "q_tpch_q8": q_tpch_q8,
    "q_tpch_q9": q_tpch_q9,
    "q_tpch_q11": q_tpch_q11,
    "q_tpch_q12": q_tpch_q12,
    "q_tpch_q13": q_tpch_q13,
    "q_tpch_q14": q_tpch_q14,
    "q_tpch_q15": q_tpch_q15,
    "q_tpch_q16": q_tpch_q16,
    "q_tpch_q17": q_tpch_q17,
    "q_tpch_q19": q_tpch_q19,
    "q_tpch_q20": q_tpch_q20,
    "q_tpch_q21": q_tpch_q21,
    "q_tpch_q22": q_tpch_q22,
}

ORACLES = {
    "q_tpch_q1": """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)
                 AS sum_disc_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)
                         * (1 + l_tax)), 2) AS sum_charge,
               ROUND(AVG(l_quantity), 6) AS avg_qty,
               ROUND(AVG(l_extendedprice), 6) AS avg_price,
               ROUND(AVG(l_discount), 6) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2001-09-01'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q_tpch_q2": """
        WITH cost AS (
          SELECT p_partkey, p_type, s_suppkey, s_name, s_acctbal, n_name,
                 MIN(l_extendedprice / l_quantity) AS c
          FROM lineitem
          JOIN part ON l_partkey = p_partkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          WHERE p_size <= 10 AND p_type = 'STANDARD'
            AND r_name = 'EUROPE'
          GROUP BY ALL
        )
        SELECT ROUND(s_acctbal, 2) AS s_acctbal, s_name, n_name,
               p_partkey, p_type, ROUND(c, 4) AS supply_cost
        FROM cost
        WHERE c = (SELECT MIN(c2.c) FROM cost c2
                   WHERE c2.p_partkey = cost.p_partkey)
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 100
    """,
    "q_tpch_q4": """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-07-01'
          AND o_orderdate < TIMESTAMP '1997-10-01'
          AND EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey
              AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        GROUP BY o_orderpriority
    """,
    "q_tpch_q6": """
        SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    """,
    "q_tpch_q7": """
        SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
               CAST(YEAR(l_shipdate) AS INT) AS l_year,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)
                 AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND ((sn.n_name = 'NATION_3' AND cn.n_name = 'NATION_8')
            OR (sn.n_name = 'NATION_8' AND cn.n_name = 'NATION_3'))
        GROUP BY 1, 2, 3
    """,
    "q_tpch_q8": """
        SELECT CAST(YEAR(o_orderdate) AS INT) AS o_year,
               ROUND(SUM(CASE WHEN sn.n_name = 'NATION_3'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END)
                     / SUM(l_extendedprice * (1 - l_discount)), 6)
                 AS mkt_share
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN region ON cn.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        WHERE p_type = 'ECONOMY' AND r_name = 'EUROPE'
          AND o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY 1
    """,
    "q_tpch_q9": """
        SELECT n_name AS nation,
               CAST(YEAR(o_orderdate) AS INT) AS o_year,
               CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                          - 0.5 * p_retailprice * l_quantity
                          AS DECIMAL(18,6))), 2) AS DOUBLE)
                 AS sum_profit
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN orders ON l_orderkey = o_orderkey
        WHERE p_name LIKE '%gear%'
        GROUP BY 1, 2
    """,
    "q_tpch_q11": """
        SELECT l_partkey,
               ROUND(SUM(l_extendedprice), 2) AS part_value
        FROM lineitem
        GROUP BY l_partkey
        HAVING SUM(l_extendedprice) >
               (SELECT SUM(l_extendedprice) * 0.0008 FROM lineitem)
    """,
    "q_tpch_q12": """
        SELECT l_linestatus,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND l_shipdate > o_orderdate + INTERVAL 30 DAY
        GROUP BY l_linestatus
    """,
    "q_tpch_q13": """
        SELECT c_count, COUNT(*) AS custdist
        FROM (
          SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer
          LEFT JOIN orders ON c_custkey = o_custkey
                          AND o_orderpriority <> '5-LOW'
          GROUP BY c_custkey)
        GROUP BY c_count
    """,
    "q_tpch_q14": """
        SELECT ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                     THEN l_extendedprice * (1 - l_discount)
                     ELSE 0 END)
                 / SUM(l_extendedprice * (1 - l_discount)), 6)
               AS promo_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-09-01'
          AND l_shipdate < TIMESTAMP '1997-10-01'
    """,
    "q_tpch_q15": """
        WITH rev AS (
          SELECT l_suppkey, SUM(l_extendedprice * (1 - l_discount)) AS t
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1996-04-01'
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, ROUND(t, 2) AS total_revenue
        FROM rev JOIN supplier ON l_suppkey = s_suppkey
        WHERE t = (SELECT MAX(t) FROM rev)
        ORDER BY s_suppkey
    """,
    "q_tpch_q16": """
        SELECT p_brand, p_type, p_size,
               COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
          AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
          AND l_suppkey NOT IN
              (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
    """,
    "q_tpch_q17": """
        SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand = 'Brand#3'
          AND l_quantity < (
            SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
            WHERE l2.l_partkey = lineitem.l_partkey
              AND l2.l_partkey IN
                  (SELECT p_partkey FROM part WHERE p_brand = 'Brand#3'))
    """,
    "q_tpch_q19": """
        SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)
               AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 25
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 35
               AND l_quantity BETWEEN 20 AND 30)
    """,
    "q_tpch_q20": """
        WITH qty AS (
          SELECT l_suppkey, SUM(l_quantity) AS q
          FROM lineitem
          JOIN part ON l_partkey = p_partkey
          WHERE p_name LIKE 'small%'
            AND l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1997-01-01'
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name
        FROM supplier
        WHERE s_suppkey IN
              (SELECT l_suppkey FROM qty
               WHERE q > (SELECT 0.5 * AVG(q) FROM qty))
          AND s_nationkey IN
              (SELECT n_nationkey FROM nation
               JOIN region ON n_regionkey = r_regionkey
               WHERE r_name = 'EUROPE')
        ORDER BY s_suppkey
    """,
    "q_tpch_q21": """
        WITH lif AS (
          SELECT l_orderkey, l_suppkey, l_shipdate
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE o_orderstatus = 'F'),
        stats AS (
          SELECT l_orderkey AS ok, MAX(l_shipdate) AS ms,
                 COUNT(DISTINCT l_suppkey) AS ns
          FROM lif GROUP BY 1),
        atmax AS (
          SELECT l.l_orderkey, COUNT(DISTINCT l.l_suppkey) AS nm,
                 MAX(l.l_suppkey) AS sk, ANY_VALUE(s.ns) AS ns
          FROM lif l JOIN stats s
            ON l.l_orderkey = s.ok AND l.l_shipdate = s.ms
          GROUP BY 1)
        SELECT s_name, COUNT(*) AS numwait
        FROM atmax JOIN supplier ON sk = s_suppkey
        WHERE nm = 1 AND ns >= 2
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 20
    """,
    "q_tpch_q22": """
        WITH c AS (
          SELECT c_custkey, c_acctbal,
                 CAST(c_custkey % 5 AS INT) AS cntrycode
          FROM customer
          WHERE CAST(c_custkey % 5 AS INT) IN (0, 1, 2))
        SELECT cntrycode, COUNT(*) AS numcust,
               ROUND(SUM(c_acctbal), 2) AS totacctbal
        FROM c
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM c
                           WHERE c_acctbal > 0)
          AND NOT EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey
              AND o_orderdate >= TIMESTAMP '2001-01-01')
        GROUP BY cntrycode
    """,
}
