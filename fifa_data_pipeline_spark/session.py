"""SparkSession factory with a scale-aware default configuration.

The reference delegates all engine configuration to BigQuery and a
3-node Dataproc cluster (reference ``terraform/main.tf:104-127``,
``prefect/spark/fifa_spark.py:15-17``); our engine owns its session
config instead. Defaults are chosen so the same code runs correctly
on ``local[N]`` for tests and would behave sanely on a large cluster:

- AQE on (runtime join-strategy demotion, partition coalescing, skew
  join splitting) — the main lever that keeps a static plan viable at
  100x the data.
- ``spark.sql.shuffle.partitions`` sized to the local core count; on
  a real cluster AQE's coalescing makes a high initial value cheap.
- Session timezone pinned to UTC so timestamp semantics are stable
  and match the DuckDB oracle (naive timestamps).
- Arrow enabled for all Pandas UDF / toPandas exchange.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    """Core count the driver told us to use (bench contract)."""
    return int(os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8)))


def get_spark(
    app_name: str = "fifa-data-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    On a real cluster ``master`` comes from spark-submit; locally we
    default to ``local[$SPARK_GRAFT_CPUS]``.
    """
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # parallelismFirst=true (the default) makes AQE ignore the
        # advisory size and keep ~defaultParallelism partitions even
        # when each holds a few KB — pure task-dispatch overhead on
        # small inputs. false is what the Spark tuning guide
        # recommends on clusters: coalesce to the advisory size, so
        # partition count tracks DATA VOLUME. At 100 TB this is a
        # no-op (post-shuffle partitions already exceed any advisory
        # size; coalescing never splits), while small/intermediate
        # stages stop paying for idle tasks. Measured −12% on the
        # light-query floor at sf0.1. Advisory default 2m suits
        # sub-GB local runs; set SPARK_GRAFT_ADVISORY_PARTITION_BYTES
        # to 64-256m on a real cluster.
        .config(
            "spark.sql.adaptive.coalescePartitions.parallelismFirst",
            "false",
        )
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("SPARK_GRAFT_ADVISORY_PARTITION_BYTES", "2m"),
        )
        # Join-strategy configs deliberately stay DEFAULT (r11): both
        # preferSortMergeJoin=false and the AQE SMJ->SHJ rewrite
        # (maxShuffledHashJoinLocalMapThreshold=advisory) were
        # measured on the 10 SMJ headline queries with order-BALANCED
        # same-session A/Bs — sf0.1 totals 6.04/6.08/6.25 and sf1
        # 12.41 vs 12.32 (a <1% wash; a fixed-order A/B showed a fake
        # -14% from warmup bias, see OPTIMIZATION_r11.md). No
        # demonstrated win, so no plan-affecting global change.
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.session.timeZone", "UTC")
        # The recursive-CTE row guardrail defaults to 1M — three hops
        # of a dense duplicate-fingerprint closure exceed that by
        # sf1 (every replicated doc group contributes O(copies²)
        # edges). Raised engine-wide: the closure queries bound DEPTH
        # structurally (hop guard + DAG edges); the row ceiling is a
        # runaway-recursion net, not a sizing knob.
        .config("spark.sql.cteRecursionRowLimit", "100000000")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Split-size lever (the "size maxPartitionBytes" knob): 8m
        # keeps genuinely multi-row-group small files parallel across
        # cores. NOTE the local testdata files are each ONE row group,
        # which byte splits cannot parallelize (a row group is read
        # whole by the split holding its midpoint) — a controlled A/B
        # at sf0.1 shows 8m vs 128m makes no measurable difference on
        # this data (SCALE.md); scan parallelism there comes from
        # layout + spread(). On a real cluster with many-file inputs,
        # set SPARK_GRAFT_MAX_PARTITION_BYTES=128m — at 100 TB the
        # default split count is already ≫ cores and smaller splits
        # only add scheduling overhead.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "8m"),
        )
        # Parquet TIMESTAMP(NANOS) (events.ts) is otherwise rejected;
        # read as int64 nanos and rebuild µs timestamps in io.read_table
        # (truncation ns→µs matches DuckDB's read of the same file).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g"))
    )
    if master is not None:
        builder = builder.master(master)
    elif "SPARK_MASTER" not in os.environ:
        builder = builder.master(f"local[{cpus}]")
    # Parameterized config hook (r12): ';'-separated k=v pairs, e.g.
    # SPARK_GRAFT_EXTRA_CONF='spark.io.compression.codec=zstd'.
    # Exists so codec/fetch A/Bs (and cluster submits) can vary conf
    # without code edits; defaults above stay the bench posture.
    # Caller-passed extra_conf still wins (applied last).
    for kv in os.environ.get("SPARK_GRAFT_EXTRA_CONF", "").split(";"):
        if kv.strip():
            k, v = kv.split("=", 1)
            builder = builder.config(k.strip(), v.strip())
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def suggest_shuffle_partitions(
    input_bytes: int,
    target_partition_bytes: int = 128 * 1024 * 1024,
    expansion: float = 3.0,
    min_partitions: int | None = None,
) -> int:
    """Size ``spark.sql.shuffle.partitions`` for a job's input: aim
    for ~``target_partition_bytes`` of UNCOMPRESSED shuffle data per
    partition (``expansion`` ≈ parquet→row-format blowup, default 3×)
    so a partition's build side fits executor memory without spill,
    floored at the core count so small jobs still use the machine.

    Worked example — 100 TB parquet input, 128 MB targets, 3×
    expansion → ~2.4 M partitions: far beyond the 200 default, which
    at that scale would put 1.5 TB in each reducer. Pair with AQE
    coalescing: overshoot here is cheap (AQE merges tiny partitions
    at runtime), undershoot is an OOM. Skewed keys need salting
    regardless — sizing fixes the average, not the maximum.
    """
    import math

    floor = min_partitions or default_parallelism()
    return max(
        floor,
        math.ceil(input_bytes * expansion / target_partition_bytes),
    )
