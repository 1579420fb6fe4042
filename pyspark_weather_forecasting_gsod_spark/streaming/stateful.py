"""Custom stateful streaming operator via ``applyInPandasWithState``.

The Spark-native escape hatch for operators Structured Streaming's built-in
aggregations can't express: per-key arbitrary state carried across
micro-batches, updated with Arrow-batched pandas code. Demonstrated here as
running per-user event totals — state is a (count, sum, non-null count)
triple per user that survives across batches; each batch emits the updated
totals for the keys it touched.

At scale: state lives in the state store (RocksDB provider in production),
partitioned by key; a watermark + ``GroupStateTimeout`` bounds state size
for keys that go quiet.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .stream import read_events_stream, run_update_mode, take_latest_per_key

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("n_vals", T.LongType()),
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

    n, s, k = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        c = int(pdf["value"].count())
        if c:
            # pandas .sum() over an all-NaN series returns 0.0 — guarding
            # on the non-null count keeps SQL semantics: SUM of no values
            # is NULL, not 0 (r06 review)
            k += c
            s += float(pdf["value"].sum())
    state.update((n, s, k))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "sum_value": [s if k else None],
        }
    )


def user_totals_from_stream(
    spark: SparkSession, stream: DataFrame, timeout_sec: int = 120
) -> DataFrame:
    """Core runner over ANY (user_id, value) stream — the multi-batch
    pytest injects a maxFilesPerTrigger=1 multi-file source here so the
    ``state.exists`` restore path genuinely executes across batches."""
    from pyspark.sql import functions as F

    out = stream.select("user_id", "value").groupBy("user_id").applyInPandasWithState(
        _update_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    t = run_update_mode(spark, out, timeout_sec, "stateful")
    # update mode appends one row per key per batch; the running count is
    # strictly monotonic, so it orders each key's emissions reliably
    latest = take_latest_per_key(t, "user_id", "n_events")
    return latest.select(
        "user_id", "n_events", F.round("sum_value", 4).alias("sum_value")
    )


def streaming_user_totals(
    spark: SparkSession, sf_dir: str, timeout_sec: int = 120
) -> DataFrame:
    """Run the stateful running-totals operator over the events stream
    (AvailableNow → memory sink, update mode) and return the final state.

    With a single AvailableNow batch the emitted totals equal the batch
    ``groupBy(user_id).count/sum`` — which is exactly what the oracle
    checks; the cross-batch state-restore path is exercised by the
    multi-file pytest through ``user_totals_from_stream``."""
    from .stream import (
        derived_state_partitions,
        events_input_bytes,
        scoped_shuffle_partitions,
    )

    parts = derived_state_partitions(spark, events_input_bytes(sf_dir))
    with scoped_shuffle_partitions(spark, parts):
        return user_totals_from_stream(
            spark, read_events_stream(spark, sf_dir), timeout_sec
        )
