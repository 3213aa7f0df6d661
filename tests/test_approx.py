"""Approximate aggregates must land within their error bounds of the
exact answers."""

from __future__ import annotations

from pyspark.sql import functions as F

from fifa_data_pipeline_spark.plans.extended import q_agg_approx


def test_approx_within_bounds(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    exact = {
        r.l_returnflag: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("n"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
        )
        .collect()
    }
    approx = {r.l_returnflag: r for r in q_agg_approx(spark, sf_dir).collect()}
    assert set(approx) == set(exact)
    for flag, a in approx.items():
        e = exact[flag]
        assert abs(a.approx_orders - e.n) / e.n < 0.05  # rsd=0.02, 2.5 sigma
        assert abs(a.p50_price - e.p50) / e.p50 < 0.02
        assert a.p99_price > a.p50_price
