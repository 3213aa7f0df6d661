"""Semantic invariants for the third extended batch (value parity vs
DuckDB is covered by test_oracle_parity for every query here)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fifa_data_pipeline_spark.plans import extended3 as X3
from fifa_data_pipeline_spark.sources.io import read_table


def test_hopping_window_covers_each_event_twice(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    n_events = ev.count()
    hopped = X3.q_window_hopping(spark, sf_dir)
    total = hopped.agg(F.sum("n_events")).collect()[0][0]
    # 2h window / 1h slide => every event is in exactly 2 windows.
    assert total == 2 * n_events


def test_basket_pairs_canonical_and_supported(spark, sf_dir):
    rows = X3.q_basket_pairs(spark, sf_dir).collect()
    assert len(rows) > 0
    assert all(r.p1 < r.p2 for r in rows)
    assert all(r.n_orders >= 2 for r in rows)


def test_ntile_buckets_balanced(spark, sf_dir):
    df = X3.q_ntile(spark, sf_dir)
    sizes = (
        df.filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy("quartile")
        .count()
        .collect()
    )
    counts = {r.quartile: r["count"] for r in sizes}
    assert set(counts) == {1, 2, 3, 4}
    # ntile spreads the remainder over the leading buckets: sizes
    # differ by at most one and are non-increasing.
    vals = [counts[q] for q in (1, 2, 3, 4)]
    assert max(vals) - min(vals) <= 1
    assert vals == sorted(vals, reverse=True)


def test_minmax_by_deterministic_on_unique_key(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders")
    top = (
        orders.orderBy(F.desc("o_orderkey"))
        .select("o_orderpriority", "o_totalprice")
        .limit(1)
        .collect()
    )
    df = X3.q_minmax_by(spark, sf_dir)
    row = df.filter(F.col("o_orderpriority") == top[0].o_orderpriority).collect()[0]
    assert row.price_last == round(top[0].o_totalprice, 6)


def test_basket_pairs_negative_partkey_routes_to_safe_key(spark, tmp_path):
    # r11 (ADVICE): the packed 8-byte pair key is exact only for
    # partkeys in [0, 2^31); a NEGATIVE partkey would sign-extend
    # across p2's bits. The footer min/max guard must route such data
    # to the two-column key and still count pairs exactly.
    li = spark.createDataFrame(
        [(1, -5), (1, 7), (2, -5), (2, 7), (3, -5)],
        "l_orderkey long, l_partkey long",
    )
    li.coalesce(1).write.parquet(str(tmp_path / "lineitem.parquet"))
    rows = X3.q_basket_pairs(spark, str(tmp_path)).collect()
    assert {(r.p1, r.p2): r.n_orders for r in rows} == {(-5, 7): 2}


def test_basket_pair_expansion_handles_duplicate_parts(spark):
    # order 1 basket [5, 5, 7]: the self-join semantics (p1 < p2 strict)
    # give (5,7) twice and never (5,5); order 2 makes the pair pass the
    # support>=2 filter.
    li = spark.createDataFrame(
        [(1, 5), (1, 5), (1, 7), (2, 5), (2, 7)],
        "l_orderkey long, l_partkey long",
    )
    from pyspark.sql import functions as F

    baskets = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list("l_partkey")).alias("ps")
    )
    pairs = baskets.select(
        F.explode(
            F.expr(
                "flatten(transform(ps, (x, i) ->"
                " transform(filter(slice(ps, i + 2, size(ps) - i - 1),"
                "                  y -> y > x),"
                "           y -> struct(x AS p1, y AS p2))))"
            )
        ).alias("pr")
    ).select("pr.p1", "pr.p2")
    counts = {(r.p1, r.p2): r.n for r in pairs.groupBy("p1", "p2").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {(5, 7): 3}
