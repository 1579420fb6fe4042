"""Custom stateful streaming operator via ``applyInPandasWithState``.

The Spark-native escape hatch for operators Structured Streaming's built-in
aggregations can't express: per-key arbitrary state carried across
micro-batches, updated with Arrow-batched pandas code. Demonstrated here as
running per-user event totals — state is a (count, sum) pair per user that
survives across batches; each batch emits the updated totals for the keys it
touched.

At scale: state lives in the state store (RocksDB provider in production),
partitioned by key; a watermark + ``GroupStateTimeout`` bounds state size
for keys that go quiet.
"""

from __future__ import annotations

import uuid
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .stream import _await_or_raise, read_events_stream

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)


def _update_totals(key, pdfs: Iterator, state: GroupState) -> Iterator:
    import pandas as pd

    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "sum_value": [s]})


def streaming_user_totals(
    spark: SparkSession, sf_dir: str, timeout_sec: int = 120
) -> DataFrame:
    """Run the stateful running-totals operator over the events stream
    (AvailableNow → memory sink, update mode) and return the final state.

    With a single AvailableNow batch the emitted totals equal the batch
    ``groupBy(user_id).count/sum`` — which is exactly what the oracle
    checks; multi-batch incremental behavior is exercised in pytest with
    ``maxFilesPerTrigger``."""
    stream = read_events_stream(spark, sf_dir).select("user_id", "value")
    out = stream.groupBy("user_id").applyInPandasWithState(
        _update_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = f"stateful_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory").queryName(name)
        .outputMode("update").trigger(availableNow=True).start()
    )
    _await_or_raise(q, timeout_sec, "stateful user totals")
    # update mode appends one row per key per batch: keep each key's LATEST
    # state. The running count is strictly monotonic across batches, so it
    # is its own reliable ordering (row order of a re-read memory table is
    # not batch order).
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    t = spark.table(name)
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        t.withColumn("__rn", F.row_number().over(w))
        .filter("__rn = 1")
        .select("user_id", "n_events", F.round("sum_value", 4).alias("sum_value"))
    )
