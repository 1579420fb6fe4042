"""Event-time windowing over the events table (batch API).

The reference is batch-only (SURVEY.md §2.12); these are the
"streaming-shaped" extensions: tumbling / sliding / session windows via
``F.window`` and ``F.session_window``, usable identically in batch and
Structured Streaming (streaming/stream.py wires the same aggregations to
``readStream``). Window starts are emitted as epoch integers so results are
timezone-representation-free across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _agg_exprs(value_col: str) -> list[Column]:
    return [
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(value_col), 4).alias("sum_value"),
    ]


def tumbling_agg(
    df: DataFrame, ts_col: str = "ts", value_col: str = "value", duration: str = "1 hour"
) -> DataFrame:
    """Non-overlapping event-time windows; epoch-aligned starts."""
    win = F.window(ts_col, duration)
    return (
        df.groupBy(win.alias("w"))
        .agg(*_agg_exprs(value_col))
        .select(
            F.unix_timestamp("w.start").alias("ws"),
            "n_events",
            "sum_value",
        )
    )


def sliding_agg(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    duration: str = "1 hour",
    slide: str = "30 minutes",
) -> DataFrame:
    """Overlapping windows: each event lands in duration/slide windows."""
    win = F.window(ts_col, duration, slide)
    return (
        df.groupBy(win.alias("w"))
        .agg(*_agg_exprs(value_col))
        .select(F.unix_timestamp("w.start").alias("ws"), "n_events", "sum_value")
    )


def session_agg(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap: str = "30 minutes",
) -> DataFrame:
    """Gap-based session windows per key (``F.session_window``): sessions
    merge while consecutive events are < gap apart. Session start is emitted
    at microsecond precision (``unix_micros``) — second-truncation would
    misplace boundaries for events within the same second."""
    win = F.session_window(ts_col, gap)
    return (
        df.groupBy(F.col(key_col), win.alias("w"))
        .agg(*_agg_exprs(value_col))
        .select(
            F.col(key_col),
            F.unix_micros("w.start").alias("session_start_us"),
            "n_events",
            "sum_value",
        )
    )
