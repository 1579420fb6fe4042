"""Profiling operators: numeric and categorical column summaries.

Reference equivalents: C7 ``profile_numeric`` (ipynb:631-646 — per-column
mean/stddev/median/mode/distinct, one job per statistic per column) and C8
``profile_categorical`` (ipynb:766-768). Here all per-column statistics are
computed in ONE aggregation pass (a single scan at any column count); mode
uses ``F.mode`` (Spark ≥3.4) which is a deterministic built-in with
``deterministic=True`` tie-break unavailable — for oracle-checked queries use
``operators.relational.mode_top1`` instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_numeric(df: DataFrame, columns: list[str]) -> DataFrame:
    """One-row summary: mean/stddev/min/max/exact-median/distinct per column,
    single pass (reference runs ~5 jobs per column; ipynb:633-643)."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in columns:
        aggs += [
            F.mean(c).alias(f"mean_{c}"),
            F.stddev(c).alias(f"stddev_{c}"),
            F.min(c).alias(f"min_{c}"),
            F.max(c).alias(f"max_{c}"),
            F.median(c).alias(f"median_{c}"),
            F.count_distinct(F.col(c)).alias(f"distinct_{c}"),
        ]
    return df.agg(*aggs)


def profile_categorical(df: DataFrame, columns: list[str]) -> DataFrame:
    """Distinct-category counts per column, single pass (reference C8)."""
    aggs = [F.count_distinct(F.col(c)).alias(f"distinct_{c}") for c in columns]
    return df.agg(*aggs)
