"""Plan-posture tests for the TPC-H-shape queries: the value of
these four is the join/agg topology, so the tests assert the
PHYSICAL plan, not just values (values are oracle-checked in
test_oracle_parity)."""

from __future__ import annotations

from fifa_data_pipeline_spark.plans import tpch


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q3_broadcasts_dims_and_takeordered(spark, sf_dir):
    plan = _plan(tpch.q_tpch_q3(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    # the selective dim filter reaches the parquet scan
    assert "PushedFilters" in plan and "BUILDING" in plan
    # the fact side never hash-shuffles before the aggregate:
    # only the broadcast exchange appears pre-agg
    assert "SortMergeJoin" not in plan


def test_q5_join_cycle_no_fact_shuffle(spark, sf_dir):
    plan = _plan(tpch.q_tpch_q5(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan


def test_q10_pushdown_and_topk(spark, sf_dir):
    plan = _plan(tpch.q_tpch_q10(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    # returnflag filter pushed into the lineitem scan
    assert "l_returnflag" in plan and "PushedFilters" in plan


def test_q18_semi_join_shape(spark, sf_dir):
    plan = _plan(tpch.q_tpch_q18(spark, sf_dir))
    # the HAVING key set joins back as a broadcast LeftSemi
    assert "LeftSemi" in plan
    assert "TakeOrderedAndProject" in plan


def test_q18_threshold_filters_rows(spark, sf_dir):
    rows = tpch.q_tpch_q18(spark, sf_dir).collect()
    assert len(rows) > 0
    assert all(r.total_qty > tpch.Q18_MIN_QTY for r in rows)
