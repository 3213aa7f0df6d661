"""The reference's end-to-end pipeline as ONE orchestrated function
(reference ``prefect/flows/etl_kaggle_to_big_query.py:207-225``,
``etl_general_fifa_flow``), Spark-first:

| reference stage | here |
|---|---|
| Kaggle download + GCS upload (S1/S2, ``:21-62``) | `land_csvs` exports the source tables to a CSV landing zone (the engine ingests landed files; the HTTP fetch itself is out-of-engine by design, SURVEY §2.1) |
| external tables, inferred schema (S3/S4, ``:65-78,114-127``) | `read_csv_inferred` + temp views |
| CTAS materialize: typed + filtered + partitioned + clustered (S5/S6, ``:81-111,130-163``) | cast projection + quality filter + `write_clustered` |
| Dataproc Spark job: the analytics query (``fifa_spark.py``) | `flagship_from` over the MATERIALIZED tables |
| BigQuery sink (S8, ``fifa_spark.py:102-104``) | `write_table` parquet |

Every stage is CREATE-OR-REPLACE idempotent (mode="overwrite"),
matching the reference's re-runnable monthly batch; unlike the
reference (which logs and ignores the Dataproc return code,
``:204``), failures propagate.

Scale: the landing/external stages are per-row streams (no shuffle);
materialization shuffles once per table on the partition column
(`write_clustered`); the flagship's plan is unchanged from
`plans/flagship.py` (3 exchanges). The CSV hop exists for reference
parity — a production pipeline at 100 TB lands parquet and skips
straight to materialize.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fifa_data_pipeline_spark.plans.flagship import flagship_from
from fifa_data_pipeline_spark.sources.io import (
    read_csv_inferred,
    read_table,
    write_clustered,
    write_csv,
    write_table,
)

#: (table, cast-projection, quality filter, partition col, cluster cols)
#: — the analogue of the reference's two CTAS statements
#: (16/19-column cast lists + WHERE, ``etl_kaggle_to_big_query.py:86-163``).
_MATERIALIZE = {
    "orders": (
        {
            "o_orderkey": "bigint",
            "o_custkey": "bigint",
            "o_orderstatus": "string",
            "o_totalprice": "double",
            "o_orderdate": "timestamp",
            "o_orderpriority": "string",
        },
        "o_orderkey IS NOT NULL",
        "o_orderstatus",
        ["o_custkey", "o_orderdate"],
    ),
    "lineitem": (
        {
            "l_orderkey": "bigint",
            "l_partkey": "bigint",
            "l_suppkey": "bigint",
            "l_linenumber": "int",
            "l_quantity": "double",
            "l_extendedprice": "double",
            "l_discount": "double",
            "l_tax": "double",
            "l_returnflag": "string",
            "l_linestatus": "string",
            "l_shipdate": "timestamp",
        },
        "l_orderkey IS NOT NULL",
        "l_returnflag",
        ["l_orderkey", "l_partkey"],
    ),
    "customer": (
        {
            "c_custkey": "bigint",
            "c_name": "string",
            "c_nationkey": "int",
            "c_acctbal": "double",
            "c_mktsegment": "string",
        },
        "c_custkey IS NOT NULL",
        "c_mktsegment",
        ["c_custkey"],
    ),
    "nation": (
        {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
        "n_nationkey IS NOT NULL",
        "n_regionkey",
        ["n_nationkey"],
    ),
}


def land_csvs(spark: SparkSession, sf_dir: str, landing_dir: str) -> None:
    """S1/S2 analogue: export the four source tables as CSV into the
    landing zone (the reference lands Kaggle CSVs in GCS ``raw/``)."""
    for name in _MATERIALIZE:
        write_csv(read_table(spark, sf_dir, name), os.path.join(landing_dir, name))


def materialize(spark: SparkSession, landing_dir: str, warehouse_dir: str) -> None:
    """S3-S6: schema-on-read external scan of each landed CSV, then
    the typed/filtered/partitioned/clustered CREATE-OR-REPLACE
    materialization."""
    for name, (casts, quality, part_col, cluster_cols) in _MATERIALIZE.items():
        ext = read_csv_inferred(spark, os.path.join(landing_dir, name))
        ext.createOrReplaceTempView(f"ext_{name}")  # S3/S4 register
        typed = ext.select(
            *[F.col(c).cast(t).alias(c) for c, t in casts.items()]
        ).filter(F.expr(quality))
        write_clustered(
            typed,
            os.path.join(warehouse_dir, name),
            partition_by=[part_col],
            cluster_by=cluster_cols,
        )


def etl_flow(
    spark: SparkSession, sf_dir: str, landing_dir: str, warehouse_dir: str,
    result_path: str,
) -> DataFrame:
    """The whole pipeline, strictly ordered like the reference flow;
    returns the flagship result DataFrame (also written to
    ``result_path``). Re-running overwrites every artifact —
    idempotent batch semantics."""
    land_csvs(spark, sf_dir, landing_dir)
    materialize(spark, landing_dir, warehouse_dir)
    tables = {
        name: spark.read.parquet(os.path.join(warehouse_dir, name))
        for name in _MATERIALIZE
    }
    result = flagship_from(
        tables["orders"], tables["lineitem"], tables["customer"], tables["nation"]
    )
    write_table(result, result_path)
    return spark.read.parquet(result_path)


# ---------------------------------------------------------------------------
# Scheduling surface: the reference deploys this flow on a monthly
# cron — `prefect deployment build … --cron "0 0 1 * *"` (reference
# README.md:112) — with Prefect supplying the trigger, catch-up
# decision, and retry loop. An in-process engine owns that contract
# itself: a pure cron evaluator plus a durable-watermark runner with
# bounded retries. Both are driver-side only (no cluster cost).
# ---------------------------------------------------------------------------

import datetime as _dt
import json as _json


def next_run_after(
    last: "_dt.datetime", cron: str = "0 0 1 * *"
) -> "_dt.datetime":
    """First instant STRICTLY after ``last`` matching a 5-field cron
    expression (minute hour day-of-month month day-of-week; ``*``,
    lists ``a,b``, ranges ``a-b``, steps ``*/n`` supported — the
    subset the reference's schedule and common variants use).

    Standard cron day semantics: when BOTH day-of-month and
    day-of-week are restricted, a day matches if EITHER does.
    Deterministic pure function — the testable core that a cron
    trigger wraps; search is bounded at 366 days."""

    def parse(field: str, lo: int, hi: int) -> set[int]:
        out: set[int] = set()
        for part in field.split(","):
            step = 1
            if "/" in part:
                part, s = part.split("/")
                step = int(s)
            if part == "*":
                rng = range(lo, hi + 1)
            elif "-" in part:
                a, b = part.split("-")
                rng = range(int(a), int(b) + 1)
            else:
                rng = range(int(part), int(part) + 1)
            out |= set(range(rng.start, rng.stop, step) if step > 1
                       else rng)
        return out

    f = cron.split()
    if len(f) != 5:
        raise ValueError(f"cron needs 5 fields, got {cron!r}")
    mins, hrs = parse(f[0], 0, 59), parse(f[1], 0, 23)
    doms, mons = parse(f[2], 1, 31), parse(f[3], 1, 12)
    dows = {d % 7 for d in parse(f[4], 0, 7)}  # 0 and 7 = Sunday
    dom_any, dow_any = f[2] == "*", f[4] == "*"

    t = (last + _dt.timedelta(minutes=1)).replace(second=0, microsecond=0)
    for _ in range(366 * 24 * 60):
        dow = (t.weekday() + 1) % 7  # cron: 0=Sunday
        day_ok = (
            (t.day in doms and dow in dows)
            if (dom_any or dow_any)
            else (t.day in doms or dow in dows)
        )
        if t.month in mons and day_ok and t.hour in hrs and t.minute in mins:
            return t
        t += _dt.timedelta(minutes=1)
    raise ValueError(f"no match within a year for {cron!r}")


def run_scheduled(
    flow,
    state_path: str,
    now: "_dt.datetime",
    cron: str = "0 0 1 * *",
    max_retries: int = 3,
    backoff_seconds: float = 0.0,
    sleep=None,
) -> dict:
    """Durable-watermark scheduled execution of an idempotent flow:
    the analogue of the reference's Prefect deployment (monthly cron,
    platform-side retries) for an engine that owns its own trigger.

    Reads the last-success watermark from ``state_path``, decides
    due-ness via :func:`next_run_after`, and when due runs ``flow()``
    with up to ``max_retries`` retries (constant ``backoff_seconds``
    between attempts, injectable ``sleep`` for tests). On success the
    watermark advances ATOMICALLY (write-temp + rename) to the
    scheduled fire time — not the wall-clock — so a late catch-up run
    satisfies exactly one fire and the next due-ness is computed from
    the schedule grid. The flow must be idempotent (every stage here
    is CREATE-OR-REPLACE), which makes crash-then-rerun safe: an
    un-advanced watermark just re-fires the same slot.

    Returns ``{"ran": bool, "fire_time": iso|None, "attempts": int}``.
    """
    import os
    import time as _time

    sleep = sleep or _time.sleep
    state = None
    if os.path.exists(state_path):
        with open(state_path) as fh:
            state = _json.load(fh)
    last = (
        _dt.datetime.fromisoformat(state["last_fire"])
        if state
        else now - _dt.timedelta(days=366)
    )
    fire = next_run_after(last, cron)
    if fire > now:
        return {"ran": False, "fire_time": None, "attempts": 0}
    # collapse missed fires onto the LATEST due slot (catchup=False):
    # the flow is an idempotent full-refresh batch, so N missed
    # months need one run, not N — and the watermark then sits on the
    # schedule grid point that run satisfied
    while True:
        nxt = next_run_after(fire, cron)
        if nxt > now:
            break
        fire = nxt
    attempts = 0
    while True:
        attempts += 1
        try:
            flow()
            break
        except Exception:
            if attempts > max_retries:
                raise
            sleep(backoff_seconds)
    tmp = state_path + ".tmp"
    with open(tmp, "w") as fh:
        _json.dump({"last_fire": fire.isoformat()}, fh)
    os.replace(tmp, state_path)
    return {"ran": True, "fire_time": fire.isoformat(), "attempts": attempts}


# ---------------------------------------------------------------------------
# Registry surface (VERDICT r3 #7): the lifecycle twin as a driver-
# checked query. The flow's CSV-landing → typed materialize →
# flagship chain must reproduce the flagship result EXACTLY — the
# CSV hop is value-roundtrip-safe (Spark writes doubles at shortest
# roundtrip precision; timestamps re-cast from ISO strings) and the
# quality filters are no-ops on key-complete testdata, so the
# flagship's own DuckDB oracle is the oracle for the whole flow.
# ---------------------------------------------------------------------------


def q_etl_flow(spark: SparkSession, sf_dir: str):
    """Run the full reference-shaped ETL flow (land → materialize →
    flagship → sink) into a temp workspace and return the sunk
    result."""
    import tempfile

    base = tempfile.mkdtemp(prefix="spark_graft_etl_")
    return etl_flow(
        spark,
        sf_dir,
        os.path.join(base, "landing"),
        os.path.join(base, "warehouse"),
        os.path.join(base, "result"),
    )


from fifa_data_pipeline_spark.plans.flagship import FLAGSHIP_ORACLE  # noqa: E402

QUERIES = {"q_etl_flow": q_etl_flow}
ORACLES = {"q_etl_flow": FLAGSHIP_ORACLE}
