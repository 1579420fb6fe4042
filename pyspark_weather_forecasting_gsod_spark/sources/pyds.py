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

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

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

    def simpleStreamReader(self, schema) -> "SyntheticEventsStreamReader":
        return SyntheticEventsStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the custom source on a session."""
    spark.dataSource.register(SyntheticEventsDataSource)


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Streaming side of the connector: offsets are row positions in the
    same deterministic generator, advanced ``rows_per_batch`` per
    micro-batch up to ``n_rows`` — a replayable stream (same offset range
    always yields the same rows, so failure recovery re-reads
    identically, the property a real queue connector must provide)."""

    def __init__(self, options: dict):
        self.n_rows = int(options.get("n_rows", 1000))
        self.rows_per_batch = int(options.get("rows_per_batch", 250))
        self.n_users = int(options.get("n_users", 50))

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def read(self, start: dict):
        lo = start["pos"]
        hi = min(lo + self.rows_per_batch, self.n_rows)
        return iter(self._rows(lo, hi)), {"pos": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._rows(start["pos"], end["pos"]))

    def _rows(self, lo: int, hi: int) -> list[tuple]:
        out = []
        for i in range(lo, hi):
            mixed = (i * _MIX) % _MOD
            out.append((i, mixed % self.n_users, round(mixed / _MOD * 100.0, 6)))
        return out


def run_python_source_stream(
    spark,
    n_rows: int = 1000,
    rows_per_batch: int = 250,
    n_users: int = 50,
    timeout_sec: int = 120,
):
    """Drive the streaming connector to completion and return the final
    per-user aggregate table.

    ``Trigger.AvailableNow`` is unsupported for Python stream sources
    (Spark falls back to ONE micro-batch), so this uses a continuous
    trigger and polls ``lastProgress`` until the source offset reaches
    ``n_rows`` — i.e. every batch has committed. Complete-mode memory sink
    then holds the aggregate over the whole stream, which must equal the
    batch aggregate over the same generator (the SQL oracle).
    """
    import uuid

    from pyspark.sql import functions as F

    # lazy import: sources must not import streaming at module load
    from ..streaming.stream import (
        _drain_memory_sink,
        _poll_until_offset,
        derived_state_partitions,
        scoped_shuffle_partitions,
    )

    register(spark)
    # size-derived state partitions (r12): rows are 3 numerics ~32 B
    parts = derived_state_partitions(spark, n_rows * 32)
    with scoped_shuffle_partitions(spark, parts):
        stream = (
            spark.readStream.format("synthetic_events")
            .option("n_rows", str(n_rows))
            .option("rows_per_batch", str(rows_per_batch))
            .option("n_users", str(n_users))
            .load()
        )
        agg = stream.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        name = f"pyds_stream_{uuid.uuid4().hex[:8]}"
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(processingTime="0 seconds")
            .start()
        )
        # shared poll: raises the stream's own exception on failure instead
        # of masking it as a timeout, and stops the query either way
        _poll_until_offset(q, n_rows, timeout_sec, name)
        return _drain_memory_sink(spark, name)
