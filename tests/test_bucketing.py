"""Bucketed-table co-location: two tables bucketed on the join key
with equal bucket counts must join with NO shuffle exchange — the
defining scale property of write_bucketed."""

from __future__ import annotations

import pytest

from fifa_data_pipeline_spark.sources import io


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    assert "repo" not in warehouse or "/tmp" in warehouse
    orders = io.read_table(spark, sf_dir, "orders")
    lineitem = io.read_table(spark, sf_dir, "lineitem")
    io.write_bucketed(orders, "b_orders", ["o_orderkey"], 8, sort_by=["o_orderkey"])
    io.write_bucketed(lineitem, "b_lineitem", ["l_orderkey"], 8, sort_by=["l_orderkey"])
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            spark.table("b_lineitem")["l_orderkey"] == spark.table("b_orders")["o_orderkey"],
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: no shuffle either side
        assert j.count() == spark.table("b_lineitem").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_agg_avoids_shuffle(spark, bucketed_tables):
    from pyspark.sql import functions as F

    g = spark.table("b_orders").groupBy("o_orderkey").agg(F.count(F.lit(1)).alias("n"))
    plan = g._jdf.queryExecution().executedPlan().toString()
    # grouping on the bucket key reuses the bucketing — no exchange
    assert "Exchange" not in plan
    assert g.count() == spark.table("b_orders").count()
