"""Semantic invariants for the fifth extended batch (value parity vs
DuckDB is covered by test_oracle_parity for the oracle-checked ones)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fifa_data_pipeline_spark.operators.relational import salted_join
from fifa_data_pipeline_spark.plans import extended5 as X5
from fifa_data_pipeline_spark.sources.io import read_table


def test_stratified_sample_exact_n_per_stratum_and_stable(spark, sf_dir):
    df = X5.q_sample_stratified(spark, sf_dir)
    sizes = {r.l_returnflag: r["count"] for r in df.groupBy("l_returnflag").count().collect()}
    li = read_table(spark, sf_dir, "lineitem")
    strata = {r.l_returnflag for r in li.select("l_returnflag").distinct().collect()}
    assert set(sizes) == strata
    assert all(n == 200 for n in sizes.values())
    # Hash-order selection is deterministic: a rerun picks the same rows.
    again = {tuple(r) for r in X5.q_sample_stratified(spark, sf_dir).collect()}
    assert {tuple(r) for r in df.collect()} == again


def test_histogram_shares_sum_to_one(spark, sf_dir):
    df = X5.q_histogram(spark, sf_dir)
    rows = df.collect()
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert 25000 * r.bin <= r.lo <= r.hi < 25000 * (r.bin + 1)


def test_column_profile_bounds(spark, sf_dir):
    prof = {r.col_name: r for r in X5.q_column_profile(spark, sf_dir).collect()}
    n = read_table(spark, sf_dir, "orders").count()
    assert prof["o_orderkey"].n_nonnull == n
    assert prof["o_orderkey"].n_distinct == n  # primary key
    assert prof["o_orderstatus"].n_distinct <= 3
    for r in prof.values():
        assert r.n_distinct <= r.n_nonnull <= n


def test_pmi_sign_and_support(spark, sf_dir):
    rows = X5.q_pmi_bigrams(spark, sf_dir).collect()
    assert rows and all(r.n_pair >= 10 for r in rows)
    # Collocations (adjacent-pair affinity) must include positive-PMI
    # pairs; synthetic text also has independent-ish pairs below 0.
    assert any(r.pmi > 0 for r in rows)


def test_hll_rollup_within_error_bound(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders")
    exact = {
        r.o_orderpriority: r.d
        for r in orders.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("d"))
        .collect()
    }
    exact["ALL"] = orders.select("o_custkey").distinct().count()
    approx = {
        r.o_orderpriority: r.approx_custs
        for r in X5.q_hll_rollup(spark, sf_dir).collect()
    }
    assert set(approx) == set(exact)
    for k, est in approx.items():
        assert abs(est - exact[k]) / exact[k] < 0.05, (k, est, exact[k])


def test_salted_join_identical_to_plain_join(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
    )
    plain = sorted(map(tuple, li.join(orders, "l_orderkey").collect()))
    salted = sorted(map(tuple, salted_join(li, orders, ["l_orderkey"]).collect()))
    assert plain == salted
    # Left join keeps unmatched left rows exactly once (deterministic
    # sparse right side so most left rows are unmatched).
    sparse = orders.filter(F.col("l_orderkey") % 7 == 0)
    lplain = sorted(map(tuple, li.join(sparse, "l_orderkey", "left").collect()))
    lsalted = sorted(
        map(tuple, salted_join(li, sparse, ["l_orderkey"], how="left").collect())
    )
    assert lplain == lsalted
    with pytest.raises(ValueError):
        salted_join(li, orders, ["l_orderkey"], how="full")


def test_dq_checks_clean_testdata_passes(spark, sf_dir):
    rows = {r.check_name: r for r in X5.q_dq_checks(spark, sf_dir).collect()}
    assert len(rows) == 7
    # Driver testdata satisfies every constraint; a violation here
    # means the audit (or the data contract) broke.
    for name, r in rows.items():
        assert r.passed and r.n_violations == 0, name
