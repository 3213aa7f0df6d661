"""Semantic invariants for the fourth extended batch (value parity vs
DuckDB is covered by test_oracle_parity for every query here)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fifa_data_pipeline_spark.operators import events as E
from fifa_data_pipeline_spark.plans import extended4 as X4
from fifa_data_pipeline_spark.sources.io import read_table


def test_cohort_week_zero_counts_every_user(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    n_users = ev.select("user_id").distinct().count()
    df = X4.q_cohort_retention(spark, sf_dir)
    # Every user is active in their own cohort's week 0 by definition.
    week0 = (
        df.filter(F.col("week_offset") == 0).agg(F.sum("n_users")).collect()[0][0]
    )
    assert week0 == n_users
    assert df.filter(F.col("week_offset") < 0).count() == 0


def test_funnel_is_monotonically_shrinking(spark, sf_dir):
    rows = {r.step: r.n_users for r in X4.q_funnel(spark, sf_dir).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1] >= rows[2] >= rows[3]
    assert rows[1] > 0


def test_scd2_intervals_tile_without_overlap(spark, sf_dir):
    df = X4.q_scd2(spark, sf_dir)
    # Per user: versions are 1..n, exactly one open interval (the
    # current status), and each valid_to equals the next valid_from.
    one_user = df.orderBy("user_id").limit(1).collect()[0].user_id
    hist = (
        df.filter(F.col("user_id") == one_user).orderBy("version").collect()
    )
    assert [r.version for r in hist] == list(range(1, len(hist) + 1))
    assert sum(1 for r in hist if r.valid_to is None) == 1
    for prev, nxt in zip(hist, hist[1:]):
        assert prev.valid_to == nxt.valid_from
        assert prev.event_type != nxt.event_type


def test_gap_islands_partition_day_counts(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders")
    n_days = (
        orders.select("o_custkey", F.to_date("o_orderdate").alias("d"))
        .distinct()
        .count()
    )
    df = X4.q_gap_islands(spark, sf_dir)
    # Islands partition the distinct (customer, day) set.
    assert df.agg(F.sum("n_days")).collect()[0][0] == n_days
    assert df.filter(
        F.col("end_day") - F.col("start_day") != F.col("n_days") - 1
    ).count() == 0


def test_session_window_matches_lag_form_on_non_boundary_data(spark, sf_dir):
    """The >= vs > gap-boundary rule only differs when a delta is
    exactly the gap (impossible at µs granularity in this data), so
    the native session_window sessions must coincide with the
    lag+cumsum sessionize output."""
    native = X4.q_session_window(spark, sf_dir)
    lag_form = E.sessionize(read_table(spark, sf_dir, "events"))
    a = {
        (r.user_id, r.session_start, r.session_last, r.n_events)
        for r in native.collect()
    }
    b = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in lag_form.collect()
    }
    assert a == b
