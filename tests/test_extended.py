"""Unit tests for extended operators — as-of join edges, set ops,
rollup markers."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from fifa_data_pipeline_spark.operators import relational as R


def _t(minutes: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(minutes=minutes)


def test_as_of_join_basic_inclusive_and_missing(spark):
    left = spark.createDataFrame(
        [(1, _t(10), "p1"), (1, _t(0), "p0"), (2, _t(5), "p2")],
        ["user_id", "ts", "name"],
    )
    right = spark.createDataFrame(
        [(1, _t(10), 100), (1, _t(3), 101), (2, _t(6), 102)],
        ["user_id", "ts", "quote_id"],
    )
    out = R.as_of_join(left, right, "user_id", "ts", "ts", ["quote_id"])
    got = {r.name: r.prior_quote_id for r in out.collect()}
    # t=10 matches the equal-timestamp quote (inclusive); t=0 has no
    # prior quote -> NULL; user 2 at t=5 precedes its only quote -> NULL
    assert got == {"p1": 100, "p0": None, "p2": None}


def test_as_of_join_no_cross_key_leakage(spark):
    left = spark.createDataFrame([(1, _t(10), "a")], ["user_id", "ts", "name"])
    right = spark.createDataFrame([(2, _t(5), 7)], ["user_id", "ts", "quote_id"])
    out = R.as_of_join(left, right, "user_id", "ts", "ts", ["quote_id"]).collect()
    assert out[0].prior_quote_id is None


def test_semi_anti_partition(spark, sf_dir):
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    semi = R.semi_join(customer, orders, [("c_custkey", "o_custkey")])
    anti = R.anti_join(customer, orders, [("c_custkey", "o_custkey")])
    assert semi.count() + anti.count() == customer.count()


def test_set_ops(spark):
    a = spark.createDataFrame([(1,), (2,), (3,)], ["k"])
    b = spark.createDataFrame([(2,), (3,), (4,)], ["k"])
    assert {r.k for r in R.intersect_distinct(a, b).collect()} == {2, 3}
    assert {r.k for r in R.except_distinct(a, b).collect()} == {1}
    assert R.union_all(a, b).count() == 6


def test_rollup_has_grand_total(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = R.rollup_agg(
        li,
        ["l_returnflag"],
        [F.grouping("l_returnflag").cast("int").alias("g"), F.count(F.lit(1)).alias("n")],
    ).collect()
    total = [r for r in out if r.g == 1]
    assert len(total) == 1 and total[0].n == li.count()


def test_range_join_is_broadcast_nested_loop(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    bands = spark.createDataFrame(
        [("lo", 0.0, 100_000.0), ("hi", 100_000.0, 1e12)], ["band", "lo", "hi"]
    )
    j = R.range_join(
        orders, bands, (orders["o_totalprice"] >= bands["lo"]) & (orders["o_totalprice"] < bands["hi"])
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    assert j.count() == orders.count()  # bands partition the price space
