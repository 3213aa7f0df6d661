"""Custom connector via the Spark 4 Python DataSource API.

Reference parity note: the reference's only custom ingestion is the
Kaggle HTTP download shim (``etl_kaggle_to_big_query.py:30-60``,
out-of-engine per SURVEY §2.1 row S1). This module exercises the
engine-side half of that story — the PYTHON DATASOURCE API
(pyspark.sql.datasource, new in Spark 4): how a bespoke feed
(an internal API, a proprietary format, a synthetic load generator)
becomes a first-class ``spark.read.format(...)`` source with
partition-parallel reads, instead of a driver-side download +
re-upload.

``SyntheticEventsDataSource`` is a deterministic event generator:
row ``i`` is a pure integer function of ``i`` (Knuth multiplicative
mixing — no RNG, no time), so

- the read is PARTITIONED: each InputPartition owns a disjoint
  [start, end) row range and generates independently — the same
  contract a real connector uses to scale across executors;
- every emitted row is reproducible and ORACLE-ABLE: the DuckDB twin
  regenerates the identical rows from ``range(n)`` with the same
  arithmetic, so the round-trip through the DataSource API is
  value-hash-checked, not just smoke-tested.

Batch reader only — the streaming side of the synthetic feed is
covered by the rate-limited file streams in ``streaming/``.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

#: Knuth's multiplicative hash constant (2^32 / phi) — public domain
#: mixing arithmetic, exactly reproducible in any engine with 64-bit
#: integers.
_MIX = 2654435761

SYNTH_SCHEMA = (
    "event_id BIGINT, user_id BIGINT, event_type STRING, "
    "amount_cents BIGINT"
)

_TYPES = ("click", "view", "purchase", "signup", "error")


def synth_row(i: int, n_users: int) -> tuple:
    """Row ``i`` of the synthetic feed — shared by the partition
    reader and the unit tests; the DuckDB oracle inlines the same
    expressions."""
    h = (i * _MIX) % 9007199254740993  # below 2^53: exact in doubles
    return (
        i,
        h % n_users,
        _TYPES[h % 5],
        (h % 100000) - 50000,
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int, n_users: int):
        self.start, self.end, self.n_users = start, end, n_users


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 10000))
        self.n_users = int(options.get("n_users", 100))
        self.n_partitions = int(options.get("partitions", 8))

    def partitions(self):
        step = max(1, -(-self.n // self.n_partitions))
        return [
            _RangePartition(lo, min(lo + step, self.n), self.n_users)
            for lo in range(0, self.n, step)
        ]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            yield synth_row(i, partition.n_users)


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch feed over the SAME deterministic row function:
    offsets are row indices, each trigger serves the next
    ``batch_rows`` rows until ``n`` is exhausted — so a drained
    ``availableNow`` run produces EXACTLY the batch read's rows and
    the streaming path shares the batch oracle. ``initialOffset``/
    ``read``/``readBetweenOffsets`` is the replay contract: any
    offset range can be re-served after a crash (the generator is a
    pure function of the range)."""

    def __init__(self, options):
        self.n = int(options.get("n", 10000))
        self.n_users = int(options.get("n_users", 100))
        self.batch_rows = int(options.get("batch_rows", 1000))

    def initialOffset(self) -> dict:
        return {"i": 0}

    def read(self, start: dict):
        lo = int(start["i"])
        hi = min(lo + self.batch_rows, self.n)
        return (
            iter([synth_row(i, self.n_users) for i in range(lo, hi)]),
            {"i": hi},
        )

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            [
                synth_row(i, self.n_users)
                for i in range(int(start["i"]), int(end["i"]))
            ]
        )

    def commit(self, end: dict) -> None:
        pass


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return SYNTH_SCHEMA

    def reader(self, schema) -> SyntheticEventsReader:
        return SyntheticEventsReader(self.options)

    def simpleStreamReader(self, schema) -> SyntheticEventsStreamReader:
        return SyntheticEventsStreamReader(self.options)


class _ShardCommit(WriterCommitMessage):
    def __init__(self, tmp_path: str, n_rows: int):
        self.tmp_path, self.n_rows = tmp_path, n_rows


class JsonlShardWriter(DataSourceWriter):
    """Two-phase-commit JSONL shard sink: each task writes its rows
    to a UUID-named ``.tmp`` file and reports it in a commit message;
    the DRIVER's ``commit`` renames every temp shard to its final
    ``part-NNNNN.jsonl`` name and writes a ``_SUCCESS`` manifest with
    the row total — so readers either see the complete committed
    output or (after ``abort`` unlinks the temps) none of it. The
    same task-attempt / driver-commit split every exactly-once file
    sink is built on; speculative or retried tasks leave at most
    orphaned temps, never half-visible data."""

    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_shards writer requires a path")
        self.overwrite = overwrite

    def write(self, iterator) -> _ShardCommit:
        import json
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f".{uuid.uuid4().hex}.tmp")
        n = 0
        with open(tmp, "w") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _ShardCommit(tmp, n)

    def commit(self, messages) -> None:
        import json
        import os

        total = 0
        for idx, m in enumerate(sorted(
            (m for m in messages if m is not None),
            key=lambda m: m.tmp_path,
        )):
            final = os.path.join(self.path, f"part-{idx:05d}.jsonl")
            os.replace(m.tmp_path, final)
            total += m.n_rows
        with open(os.path.join(self.path, "_SUCCESS"), "w") as fh:
            json.dump({"rows": total}, fh)

    def abort(self, messages) -> None:
        import os

        for m in messages:
            if m is not None and os.path.exists(m.tmp_path):
                os.unlink(m.tmp_path)


class JsonlShardsDataSource(DataSource):
    """Write-side twin of the connector story: ``df.write.format(
    "jsonl_shards").option("path", ...)``."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_shards"

    def writer(self, schema, overwrite: bool) -> JsonlShardWriter:
        return JsonlShardWriter(self.options, overwrite)


def register(spark) -> None:
    """Idempotently register the sources on a session."""
    spark.dataSource.register(SyntheticEventsDataSource)
    spark.dataSource.register(JsonlShardsDataSource)
