"""Python DataSource API connector tests: partitioned reads,
determinism across partition counts, and option plumbing."""

from __future__ import annotations

from fifa_data_pipeline_spark.sources.pydatasource import (
    SYNTH_SCHEMA,
    register,
    synth_row,
)


def _read(spark, **opts):
    register(spark)
    r = spark.read.format("synthetic_events")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_reads_expected_rows_and_schema(spark):
    df = _read(spark, n=1000, n_users=7, partitions=4)
    assert df.count() == 1000
    assert df.columns == ["event_id", "user_id", "event_type", "amount_cents"]
    rows = {r.event_id: r for r in df.collect()}
    for i in (0, 1, 999):
        eid, uid, et, cents = synth_row(i, 7)
        assert (rows[i].user_id, rows[i].event_type,
                rows[i].amount_cents) == (uid, et, cents)


def test_partition_count_is_honored_and_result_invariant(spark):
    a = _read(spark, n=500, partitions=1)
    b = _read(spark, n=500, partitions=13)
    assert b.rdd.getNumPartitions() == 13
    assert a.rdd.getNumPartitions() == 1
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}


def test_filters_and_projection_apply_after_scan(spark):
    df = _read(spark, n=2000).filter("event_type = 'click'").select(
        "event_id", "user_id"
    )
    got = df.count()
    want = sum(1 for i in range(2000) if synth_row(i, 100)[2] == "click")
    assert got == want
