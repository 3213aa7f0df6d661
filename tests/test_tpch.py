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


# ---- suite completion (plans/tpch2.py) --------------------------

from fifa_data_pipeline_spark.plans import tpch2


def test_q1_single_shuffle_partial_agg(spark, sf_dir):
    plan = _plan(tpch2.q_tpch_q1(spark, sf_dir))
    # map-side partial + final HashAggregate around ONE exchange
    assert plan.count("Exchange") == 1
    assert plan.count("HashAggregate") >= 2
    # shipdate predicate reaches the parquet reader
    assert "PushedFilters" in plan and "l_shipdate" in plan


def test_q6_pure_scan_aggregate(spark, sf_dir):
    plan = _plan(tpch2.q_tpch_q6(spark, sf_dir))
    assert "Join" not in plan
    # all three predicates pushed to the scan
    assert "l_discount" in plan and "l_quantity" in plan


def test_q19_disjunction_keeps_hash_join(spark, sf_dir):
    plan = _plan(tpch2.q_tpch_q19(spark, sf_dir))
    # the OR must not demote the equi-join to a nested loop
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q21_aggregates_at_order_grain_only(spark, sf_dir):
    plan = _plan(tpch2.q_tpch_q21(spark, sf_dir))
    assert "SortMergeJoin" not in plan
    assert "TakeOrderedAndProject" in plan


def test_q4_semi_join_with_range_predicate(spark, sf_dir):
    plan = _plan(tpch2.q_tpch_q4(spark, sf_dir))
    assert "LeftSemi" in plan
    # the equality drives the join; the date lag rides as a filter
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_q7_q8_aqe_promotes_unpinned_joins(spark, sf_dir):
    # The SF-scaling sides carry NO broadcast hint (a pinned hint
    # overrides AQE's size check and would OOM at 100 TB). The
    # contract is adaptive: the initial plan may hold SortMergeJoins,
    # but at this scale AQE's runtime statistics must promote them —
    # the FINAL plan (isFinalPlan=true after execution) stays
    # broadcast-heavy.
    for q in [tpch2.q_tpch_q7, tpch2.q_tpch_q8]:
        df = q(spark, sf_dir)
        df.collect()  # finalize the adaptive plan
        plan = _plan(df)
        assert "isFinalPlan=true" in plan
        assert plan.count("BroadcastHashJoin") >= 2


def test_q15_ties_preserved(spark, sf_dir):
    # the max-revenue equality join keeps ALL tied suppliers — pin
    # that the implementation does not row_number-truncate
    rows = tpch2.q_tpch_q15(spark, sf_dir).collect()
    assert len(rows) >= 1
    assert len({r.total_revenue for r in rows}) == 1
