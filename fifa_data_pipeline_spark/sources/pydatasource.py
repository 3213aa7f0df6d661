"""Custom connector via the Python Data Source API (Spark ≥4.0,
SPARK-44076): the pure-Python path for building sources/sinks the
engine doesn't ship — schema declaration, partition planning, and
per-partition row generation, with no JVM code.

The reference's only custom ingestion is a Python download step
outside the engine (SURVEY.md §2.1 S1); this is the in-engine
equivalent surface: a format registered on the session and read with
``spark.read.format(...)`` like any built-in source. The demo source
generates a deterministic synthetic event table — partitioned,
seeded, reproducible on any cluster shape — the pattern a real
connector (internal REST feed, bespoke file format, queue snapshot)
follows verbatim: ``partitions()`` defines the parallelism the
scheduler sees, ``read(partition)`` runs on executors.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

#: Knuth multiplicative hash constant — deterministic pseudo-values.
_MIX = 2654435761


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("synth_events")`` — options:
    ``partitions`` (default 4), ``rowsPerPartition`` (default 100),
    ``seed`` (default 42)."""

    @classmethod
    def name(cls) -> str:
        return "synth_events"

    def schema(self) -> str:
        return "event_id bigint, part int, value double"

    def reader(self, schema) -> "SyntheticEventsReader":
        return SyntheticEventsReader(self.options)


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n_parts = int(options.get("partitions", "4"))
        self.rows_per = int(options.get("rowsperpartition", "100"))
        self.seed = int(options.get("seed", "42"))

    def partitions(self) -> Sequence[InputPartition]:
        # One InputPartition per task: this IS the source's
        # parallelism contract to the scheduler.
        return [InputPartition(i) for i in range(self.n_parts)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        i = partition.value
        for r in range(self.rows_per):
            gid = i * self.rows_per + r
            h = (gid * _MIX + self.seed) % (2**32)
            yield (gid, i, h / 2**32)


def register(spark) -> None:
    """Register the demo sources on a session (idempotent)."""
    spark.dataSource.register(SyntheticEventsDataSource)
    spark.dataSource.register(SyntheticEventsStreamSource)


# ---------------------------------------------------------------------------
# Streaming Python data source (SimpleDataSourceStreamReader)
# ---------------------------------------------------------------------------

class SyntheticEventsStreamSource(DataSource):
    """``spark.readStream.format("synth_events_stream")`` — the
    STREAMING half of the Python Data Source API: the reader owns its
    offset (a monotonically increasing batch index), the engine owns
    exactly-once bookkeeping (offsets land in the checkpoint log;
    ``readBetweenOffsets`` replays a committed range after restart).
    Options: ``rowsPerBatch`` (default 10), ``maxBatches`` (default 3
    — after which ``read`` stops advancing the offset, so an
    ``availableNow`` drain terminates), ``seed``.

    A real connector (queue consumer, HTTP cursor feed) follows this
    shape verbatim: offsets must be replayable — the DETERMINISM of
    read-between-offsets, not the checkpoint, is what makes the
    pipeline exactly-once end to end."""

    @classmethod
    def name(cls) -> str:
        return "synth_events_stream"

    def schema(self) -> str:
        return "event_id bigint, batch int, value double"

    def simpleStreamReader(self, schema) -> "SyntheticStreamReader":
        return SyntheticStreamReader(self.options)


class SyntheticStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict) -> None:
        self.rows_per = int(options.get("rowsperbatch", "10"))
        self.max_batches = int(options.get("maxbatches", "3"))
        self.seed = int(options.get("seed", "42"))

    def initialOffset(self) -> dict:
        return {"idx": 0}

    def _rows(self, idx: int) -> list[tuple]:
        out = []
        for r in range(self.rows_per):
            gid = idx * self.rows_per + r
            h = (gid * _MIX + self.seed) % (2**32)
            out.append((gid, idx, h / 2**32))
        return out

    def read(self, start: dict):
        idx = start["idx"]
        if idx >= self.max_batches:
            return iter([]), start  # no progress -> availableNow ends
        return iter(self._rows(idx)), {"idx": idx + 1}

    def readBetweenOffsets(self, start: dict, end: dict):
        rows: list[tuple] = []
        for idx in range(start["idx"], end["idx"]):
            rows.extend(self._rows(idx))
        return iter(rows)

    def commit(self, end: dict) -> None:
        pass  # nothing external to acknowledge for a synthetic feed
