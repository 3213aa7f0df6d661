"""Plan-asserted scale-posture tests: optimizations that only matter
(or only trigger) when both join sides are large — verified here by
forcing large-scale conditions onto the local data and reading the
optimized plan, the same way the bucketing/pushdown tests do."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture
def sf_dir():
    return "/root/testdata/sf0.001"


def test_runtime_bloom_filter_injected_when_broadcast_impossible(spark, sf_dir):
    """When the filtered build side of a shuffle join is too big to
    broadcast (the normal state at 100 TB), Spark injects a runtime
    bloom filter: the build side's join keys populate a bloom filter
    that pre-filters the probe side's scan, cutting shuffle volume by
    the build side's selectivity. Locally the dims always broadcast
    (so the rule correctly stays out of the way); forcing
    broadcast off and the app-side threshold down reproduces the
    at-scale plan so we can pin the behavior."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        od = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
            "o_totalprice > 400000"
        )
        j = li.join(od, li.l_orderkey == od.o_orderkey)
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan, plan[:2000]
        # row-count parity with the un-filtered join
        for k, v in saved.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)
        plain = li.join(od, li.l_orderkey == od.o_orderkey)
        for k, v in confs.items():
            spark.conf.set(k, v)
        assert j.count() == plain.count()
    finally:
        for k, v in saved.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)


def test_bloom_filter_not_injected_when_dim_broadcasts(spark, sf_dir):
    """With defaults, the tiny dim broadcasts and the bloom-filter
    rule correctly declines (a broadcast hash join already prunes the
    probe side with the exact key set)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    od = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        "o_totalprice > 400000"
    )
    j = li.join(od, li.l_orderkey == od.o_orderkey)
    plan = j._jdf.queryExecution().optimizedPlan().toString()
    assert "might_contain" not in plan


def test_avro_helpers_gate_on_missing_module(spark):
    """The container has no spark-avro; the helpers must fail with an
    actionable message (and would pass through transparently where
    the module is deployed)."""
    from fifa_data_pipeline_spark.sources import io as sio

    if sio._avro_available(spark):
        df = spark.range(3)
        sio.write_avro(df, "/tmp/avro_roundtrip")
        assert sio.read_avro(spark, "/tmp/avro_roundtrip").count() == 3
    else:
        with pytest.raises(RuntimeError, match="spark-avro"):
            sio.read_avro(spark, "/tmp/nope")


def test_python_datasource_partitioned_deterministic(spark):
    """Custom Python Data Source (Spark >=4.0): partition planning is
    honored by the scheduler, rows are deterministic across reads."""
    from fifa_data_pipeline_spark.sources.pydatasource import register

    register(spark)
    df = (
        spark.read.format("synth_events")
        .option("partitions", "3")
        .option("rowsPerPartition", "50")
        .load()
    )
    assert df.rdd.getNumPartitions() == 3
    rows = df.collect()
    assert len(rows) == 150
    assert {r.part for r in rows} == {0, 1, 2}
    assert all(0.0 <= r.value < 1.0 for r in rows)
    again = (
        spark.read.format("synth_events")
        .option("partitions", "3")
        .option("rowsPerPartition", "50")
        .load()
        .collect()
    )
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    # pushdown-style column pruning still applies (Project above scan)
    assert df.select("event_id").distinct().count() == 150
