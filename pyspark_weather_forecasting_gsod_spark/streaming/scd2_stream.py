"""Streaming SCD2 / CDC-history maintenance.

``run_streaming_scd2`` consumes the replayable Python-source event stream
as a CDC feed (each event = an attribute observation for its entity) and
maintains a type-2 history table incrementally in ``foreachBatch``: per
micro-batch it re-derives version chains ONLY for the entities the batch
touched — the current open row participates as a pseudo-event at its own
``valid_from``, so an unchanged attribute extends the open row (original
``valid_from`` preserved) while a change closes it at the event position
and opens a new version. Untouched entities and already-closed history
pass through by reference.

Batch-boundary independence is the correctness claim: the final table
must equal the one-pass batch derivation (change points via LAG, spans
via LEAD) over the full generator — which is the DuckDB oracle, so
micro-batching provably cannot alter the history. Cost per batch: one
semi/anti key split + one window over (affected entities' open rows +
batch events) — work scales with the delta, not the accumulated history,
the same property as ``scd2_apply``.

Ordering contract: the source must deliver each entity's events in
non-decreasing position order across batches (true for offset-ranged
replayable sources — Kafka partitions, the Python source here). Late
cross-batch events would need a watermarked reorder buffer upstream.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def scd2_versions_from_events(
    events: DataFrame,
    key_col: str = "user_id",
    pos_col: str = "event_id",
    attr_col: str = "attr",
) -> DataFrame:
    """Batch primitive: collapse an ordered event feed into SCD2 version
    rows — change points via LAG, validity spans via LEAD. One window
    exchange on the entity key."""
    w = Window.partitionBy(key_col).orderBy(pos_col)
    chg = (
        events.withColumn("__prev", F.lag(attr_col).over(w))
        .filter(F.col("__prev").isNull() | (F.col("__prev") != F.col(attr_col)))
        .drop("__prev")
    )
    return chg.select(
        key_col,
        attr_col,
        F.col(pos_col).alias("valid_from"),
        F.lead(pos_col).over(w).alias("valid_to"),
        F.lead(pos_col).over(w).isNull().alias("is_current"),
    )


def run_streaming_scd2(
    spark: SparkSession,
    n_rows: int = 1000,
    rows_per_batch: int = 250,
    n_users: int = 20,
    timeout_sec: int = 120,
) -> DataFrame:
    """Drive the CDC feed to completion and return the final history table
    (user_id, attr, valid_from, valid_to, is_current). ``attr`` is the
    event value's quartile bucket, so consecutive same-bucket events
    genuinely extend the open row instead of versioning every event."""
    from ..sources.pyds import register
    from .stream import derived_state_partitions, scoped_shuffle_partitions

    register(spark)
    # foreachBatch body windows/joins per batch: scope its shuffle width
    # to the (tiny, n_rows-derived) input too
    parts = derived_state_partitions(spark, n_rows * 32)
    with scoped_shuffle_partitions(spark, parts):
        return _run_streaming_scd2(
            spark, n_rows, rows_per_batch, n_users, timeout_sec
        )


def _run_streaming_scd2(
    spark: SparkSession,
    n_rows: int,
    rows_per_batch: int,
    n_users: int,
    timeout_sec: int,
) -> DataFrame:
    stream = (
        spark.readStream.format("synthetic_events")
        .option("n_rows", str(n_rows))
        .option("rows_per_batch", str(rows_per_batch))
        .option("n_users", str(n_users))
        .load()
    )
    state: dict = {"dim": None, "batches": 0, "applied": set()}

    def _advance(batch_df: DataFrame, batch_id: int) -> None:
        # foreachBatch is at-least-once: a redelivered batch must not
        # advance the dimension twice (the rederive is not idempotent —
        # replayed events could close and reopen versions; r06 review)
        if batch_id in state["applied"]:
            return
        state["applied"].add(batch_id)
        b = batch_df.select(
            "user_id",
            "event_id",
            F.floor(F.col("value") / F.lit(25.0)).cast("long").alias("attr"),
        )
        if b.isEmpty():
            return
        state["batches"] += 1
        dim = state["dim"]
        if dim is None:
            new_dim = scd2_versions_from_events(b)
        else:
            affected = b.select("user_id").distinct()
            untouched = dim.join(affected, "user_id", "left_anti")
            touched = dim.join(affected, "user_id", "left_semi")
            closed = touched.filter(~F.col("is_current"))
            open_as_event = touched.filter(F.col("is_current")).select(
                "user_id", F.col("valid_from").alias("event_id"), "attr"
            )
            rederived = scd2_versions_from_events(open_as_event.unionByName(b))
            new_dim = untouched.unionByName(closed).unionByName(rederived)
        # materialize so the next batch builds on data, not on a lineage
        # growing by one window per batch
        state["dim"] = new_dim.localCheckpoint(eager=True)

    q = (
        stream.writeStream.foreachBatch(_advance)
        .trigger(processingTime="0 seconds")
        .queryName(f"scd2_stream_{uuid.uuid4().hex[:8]}")
        .start()
    )
    from .stream import _poll_until_offset

    _poll_until_offset(q, n_rows, timeout_sec, "scd2 stream")
    if state["batches"] < 2:
        raise AssertionError(
            "streaming_scd2 must exercise multiple micro-batches "
            f"(got {state['batches']}); raise n_rows or lower rows_per_batch"
        )
    return state["dim"]
