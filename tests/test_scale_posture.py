"""Plan-asserted scale-posture tests: optimizations that only matter
(or only trigger) when both join sides are large — verified here by
forcing large-scale conditions onto the local data and reading the
optimized plan, the same way the bucketing/pushdown tests do."""

from __future__ import annotations

import re

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


def test_python_streaming_datasource_exactly_once_shape(spark, tmp_path):
    """Streaming Python data source: an availableNow drain consumes
    exactly maxBatches deterministic batches, and readBetweenOffsets
    replays any committed range bit-identically (the replayability
    contract exactly-once recovery rests on)."""
    from fifa_data_pipeline_spark.sources import pydatasource

    pydatasource.register(spark)
    out = str(tmp_path / "out")
    # three availableNow drains over ONE checkpoint: each restart
    # resumes from the committed offset and advances one batch — the
    # restart-recovery path of the offset contract
    for _ in range(3):
        stream = (
            spark.readStream.format("synth_events_stream")
            .option("rowsPerBatch", "5")
            .option("maxBatches", "3")
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    rows = sorted(
        spark.read.parquet(out).collect(), key=lambda r: r.event_id
    )
    assert len(rows) == 15
    assert [r.event_id for r in rows] == list(range(15))
    assert {r.batch for r in rows} == {0, 1, 2}
    # replay determinism: offsets [1,3) regenerate rows 5..14 exactly
    reader = pydatasource.SyntheticStreamReader(
        {"rowsperbatch": "5", "maxbatches": "3"}
    )
    replay = list(reader.readBetweenOffsets({"idx": 1}, {"idx": 3}))
    assert [t[0] for t in replay] == list(range(5, 15))
    got = {(r.event_id, r.batch, round(r.value, 12)) for r in rows[5:]}
    ref = {(t[0], t[1], round(t[2], 12)) for t in replay}
    assert got == ref


def test_python_datasource_writer_manifest_commit(spark, sf_dir, tmp_path):
    """The Python Data Source WRITER leg: per-task JSONL files + a
    driver-side manifest commit; the manifest row count equals the
    input and every listed file exists."""
    import json
    import os

    from fifa_data_pipeline_spark.sources.pydatasource import (
        JsonlSinkDataSource,
    )

    spark.dataSource.register(JsonlSinkDataSource)
    out = str(tmp_path / "jsonl_out")
    df = (
        spark.read.parquet(f"{sf_dir}/nation.parquet")
        .select("n_nationkey", "n_name")
        .repartition(4)
    )
    df.write.format("jsonl_sink").mode("append").option("path", out).save()

    with open(os.path.join(out, "_MANIFEST.json")) as fh:
        manifest = json.load(fh)
    assert manifest["rows"] == df.count()
    rows = []
    for f in manifest["files"]:
        p = os.path.join(out, f)
        assert os.path.exists(p)
        with open(p) as fh:
            rows += [json.loads(line) for line in fh]
    assert len(rows) == manifest["rows"]
    assert {r["n_name"] for r in rows} == {
        r.n_name for r in df.collect()
    }


def test_dynamic_partition_pruning_from_dim_filter(spark, sf_dir, tmp_path):
    """Join-driven partition pruning: the fact is partitioned on the
    join key and carries NO static filter — the dim side's filter
    must reach the fact scan as a runtime `dynamicpruning` subquery.
    At 100 TB this is the difference between scanning one date's
    partitions and scanning the table."""
    from fifa_data_pipeline_spark.sources.io import read_table

    path = str(tmp_path / "li_part")
    (
        read_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_quantity", "l_returnflag")
        .write.mode("overwrite")
        .partitionBy("l_returnflag")
        .parquet(path)
    )
    fact = spark.read.parquet(path)
    dim = spark.createDataFrame(
        [("R", "returned")], ["flag", "label"]
    ).filter(F.col("label") == "returned")
    joined = fact.join(
        dim, fact.l_returnflag == dim.flag
    ).groupBy("label").agg(F.sum("l_quantity").alias("q"))
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan
    assert joined.collect()[0]["label"] == "returned"


def test_cbo_stats_reorder_joins_filtered_dim_first(spark, sf_dir):
    """With ANALYZE'd stats + CBO join reorder, the written join
    order (customer ⋈ orders, THEN the 1-row nation filter) is
    rewritten to join the selective dim first — the reorder that
    keeps a 100 TB intermediate from ever materializing."""
    from fifa_data_pipeline_spark.sources.io import read_table

    for t in ["customer", "orders", "nation"]:
        read_table(spark, sf_dir, t).write.mode("overwrite").saveAsTable(
            f"cbo_{t}"
        )
        spark.sql(f"ANALYZE TABLE cbo_{t} COMPUTE STATISTICS")
    try:
        confs = {
            "spark.sql.cbo.enabled": "true",
            "spark.sql.cbo.joinReorder.enabled": "true",
        }
        old = {k: spark.conf.get(k) for k in confs}
        for k, v in confs.items():
            spark.conf.set(k, v)
        try:
            df = spark.sql(
                """
                SELECT n_name, COUNT(*) AS n
                FROM cbo_customer
                JOIN cbo_orders ON o_custkey = c_custkey
                JOIN cbo_nation ON c_nationkey = n_nationkey
                WHERE n_name = 'NATION_3'
                GROUP BY n_name
                """
            )
            txt = df._jdf.queryExecution().optimizedPlan().toString()
            # left-deep reordered tree prints the first-joined (dim)
            # relation before the demoted big side
            assert txt.index("cbo_nation") < txt.index("cbo_orders")
            assert df.collect()[0]["n"] > 0
        finally:
            for k, v in old.items():
                spark.conf.set(k, v)
    finally:
        for t in ["customer", "orders", "nation"]:
            spark.sql(f"DROP TABLE IF EXISTS cbo_{t}")


def test_suggest_shuffle_partitions_sizing_rule():
    from fifa_data_pipeline_spark.session import (
        default_parallelism,
        suggest_shuffle_partitions,
    )

    # tiny input floors at the core count
    assert suggest_shuffle_partitions(10 * 1024) == default_parallelism()
    # 1 TB parquet at 3x expansion / 128 MB targets -> ~24576 parts
    one_tb = 1024 ** 4
    assert suggest_shuffle_partitions(one_tb) == 24576
    # halving the target doubles the count (monotone in both knobs)
    assert suggest_shuffle_partitions(
        one_tb, target_partition_bytes=64 * 1024 * 1024
    ) == 49152


def test_nested_struct_column_pruning_reaches_scan(spark, sf_dir, tmp_path):
    """Nested-schema pruning: selecting one leaf of a struct column
    must narrow the parquet ReadSchema to that leaf — at 100 TB with
    wide metadata structs, reading `meta.width` must not drag the
    whole struct (or the payload sibling) off disk."""
    from fifa_data_pipeline_spark.operators.multimodal import (
        attach_payload,
    )
    from fifa_data_pipeline_spark.sources.io import read_table

    path = str(tmp_path / "media")
    attach_payload(read_table(spark, sf_dir, "documents")).write.mode(
        "overwrite"
    ).parquet(path)
    df = spark.read.parquet(path).select(
        "doc_id", F.col("meta.width").alias("w")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"ReadSchema: (\S+)", plan)
    assert m, plan
    schema = m.group(1)
    assert "width" in schema
    # siblings pruned: neither the binary payload nor other struct
    # leaves reach the scan
    assert "payload" not in schema and "media_format" not in schema


def test_aqe_splits_skewed_join_partition(spark):
    """AQE skew-join handling actually fires on a skewed key: the
    final adaptive plan's shuffle read marks the split partition
    (``skew``). Instructive detail baked into the fixture: the pad
    column must be INCOMPRESSIBLE (md5, not a constant) — skew
    detection measures compressed shuffle bytes, so a compressible
    hot key can hide below the threshold while still dominating
    task runtime."""
    import io
    from contextlib import redirect_stdout

    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
            "256KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "128KB",
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(0, 400000).select(
            F.when(F.col("id") % 4 == 0, 7)
            .otherwise(F.col("id") % 5000)
            .alias("k"),
            F.md5(F.col("id").cast("string")).alias("pad"),
        )
        right = spark.range(0, 5000).select(
            F.col("id").alias("k"), F.rand(2).alias("w")
        )
        j = left.join(right, "k").select(
            F.sum(F.length("pad")).alias("s")
        )
        j.collect()
        buf = io.StringIO()
        with redirect_stdout(buf):
            j.explain("formatted")
        assert "skew" in buf.getvalue().lower()
    finally:
        for k, v in old.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)


def test_aqe_splits_skewed_join_partitions(spark):
    """The skew posture the suite relies on (salting is the manual
    fallback — q_join_salted): AQE must detect a hot key at runtime
    and split its partition (skew=true in the finalized SMJ). Thresholds
    are lowered session-locally so a test-sized hot key trips the
    same machinery a 100 TB skew does, and restored after."""
    import pyspark.sql.functions as F

    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "64KB",
        )
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB"
        )
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2"
        )
        # force a shuffle join so the skew handler (not broadcast)
        # is what AQE exercises
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"
        )
        left = spark.range(0, 200_000).select(
            F.when(F.col("id") % 10 != 0, F.lit(0))
            .otherwise(F.col("id")).alias("k"),
            F.concat(F.lit("p" * 64), F.col("id").cast("string")).alias(
                "pad"
            ),
        )
        right = spark.range(0, 50_000).select(
            F.when(F.col("id") % 10 != 0, F.lit(0))
            .otherwise(F.col("id")).alias("k"),
            F.col("id").alias("rv"),
        )
        # aggregate over pad so column pruning can't strip the bytes
        # that make the hot partition big enough to classify as skew
        j = left.join(right, "k").select(F.sum(F.length("pad")))
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
        assert "skewed" in plan  # AQEShuffleRead ... skewed
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
