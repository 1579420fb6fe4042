"""Custom Python DataSource (Spark 4 extension point).

The reference's only ingestion is a CSV read (ipynb:187); a complete
engine also needs the CONNECTOR story: Spark 4's Python DataSource API
lets a pure-Python source plug into the scan planner with partition-
parallel reads (one ``read`` call per ``InputPartition``, executed on the
workers, Arrow-batched back).

``SyntheticEventsDataSource`` is a deterministic generator source: every
row is a pure integer-arithmetic function of its id, so an independent
SQL engine can reproduce the scan bit-for-bit — the correctness gate for
the connector plumbing itself (schema, partitioning, option passing).
A real connector (REST cursor, message queue, proprietary format) swaps
the generator for I/O behind the same partition interface.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

# 32-bit Knuth multiplicative-hash constant: value mixing stays in exact
# BIGINT range so DuckDB reproduces it with integer ops.
_MIX = 2654435761
_MOD = 2**31


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_partitions = int(options.get("n_partitions", 8))
        self.n_users = int(options.get("n_users", 50))

    def partitions(self) -> list[InputPartition]:
        step = max(1, -(-self.n_rows // self.n_partitions))
        return [
            _RangePartition(lo, min(lo + step, self.n_rows))
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            mixed = (i * _MIX) % _MOD
            yield (
                i,
                mixed % self.n_users,
                round(mixed / _MOD * 100.0, 6),
            )


class SyntheticEventsDataSource(DataSource):
    """spark.read.format("synthetic_events").option("n_rows", ...).load()"""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return "event_id bigint, user_id bigint, value double"

    def reader(self, schema) -> SyntheticEventsReader:
        return SyntheticEventsReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the custom source on a session."""
    spark.dataSource.register(SyntheticEventsDataSource)
