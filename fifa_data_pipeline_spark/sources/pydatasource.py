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

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

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
    """Register the demo source on a session (idempotent)."""
    spark.dataSource.register(SyntheticEventsDataSource)
