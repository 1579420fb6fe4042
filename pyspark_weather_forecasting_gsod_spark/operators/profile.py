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


#: Above this many rows, ``profile_numeric`` swaps ``F.median`` (whole-group
#: value buffer in one agg buffer — the thing that cannot hold a 100 TB
#: global group) for the bounded-memory ``scalable_exact_median``. The
#: default keeps every test/bench scale on the single-pass plan while the
#: production-scale path engages automatically.
SCALABLE_MEDIAN_OVER = 50_000_000


def profile_numeric(
    df: DataFrame,
    columns: list[str],
    scalable_median_over: int | None = SCALABLE_MEDIAN_OVER,
) -> DataFrame:
    """One-row summary: mean/stddev/min/max/exact-median/distinct per column,
    single pass (reference runs ~5 jobs per column; ipynb:631-646).

    ``F.median`` buffers the entire (global) group's values in the agg
    buffer; above ``scalable_median_over`` rows (O(threshold) limit-probe,
    never a full count) the medians switch to
    ``quantiles.scalable_exact_median`` — identical exact semantics
    (mean-of-middle-two), bounded memory via GK-sketch range narrowing —
    while every other statistic stays in the one aggregation pass. Pass
    ``None`` to force the single-pass plan regardless of size."""
    use_scalable = False
    if scalable_median_over is not None and columns:
        probe = df.limit(scalable_median_over + 1).count()
        use_scalable = probe > scalable_median_over

    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in columns:
        aggs += [
            F.mean(c).alias(f"mean_{c}"),
            F.stddev(c).alias(f"stddev_{c}"),
            F.min(c).alias(f"min_{c}"),
            F.max(c).alias(f"max_{c}"),
            *([] if use_scalable else [F.median(c).alias(f"median_{c}")]),
            F.count_distinct(F.col(c)).alias(f"distinct_{c}"),
        ]
    out = df.agg(*aggs)
    if use_scalable:
        from .quantiles import scalable_exact_median

        for c in columns:
            out = out.withColumn(
                f"median_{c}", F.lit(scalable_exact_median(df, c))
            )
        # restore the canonical column order of the single-pass plan
        ordered = ["n_rows"] + [
            f"{s}_{c}"
            for c in columns
            for s in ("mean", "stddev", "min", "max", "median", "distinct")
        ]
        out = out.select(*ordered)
    return out


def profile_categorical(df: DataFrame, columns: list[str]) -> DataFrame:
    """Distinct-category counts per column, single pass (reference C8)."""
    aggs = [F.count_distinct(F.col(c)).alias(f"distinct_{c}") for c in columns]
    return df.agg(*aggs)


def grouped_linear_trend(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group ordinary-least-squares trend line in ONE aggregate pass —
    the "millions of tiny regressions" shape (per-station temperature
    trends, per-user drift): closed-form OLS from the five sufficient
    statistics, so a hash aggregate replaces fitting millions of MLlib
    models. Returns (group, n, slope, intercept, r2); groups with < 2
    points or zero x-variance yield NULL slope.

    Computed from CENTERED moments (``covar_samp``/``var_samp`` — Spark's
    merge-stable update formulas) rather than raw Σx/Σx² sums: the raw
    form's ``n·Σx² − (Σx)²`` cancels catastrophically for large-magnitude
    x like epoch seconds, losing ~7 of double's 16 digits on a month of
    hourly data (r06 review). The centered aggregates remain partial-
    mergeable, so the per-shard rollup story is unchanged."""
    agg = df.filter(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("__n"),
        F.covar_samp(x_col, y_col).alias("__cov"),
        F.var_samp(x_col).alias("__varx"),
        F.avg(x_col).alias("__mx"),
        F.avg(y_col).alias("__my"),
        F.corr(x_col, y_col).alias("__r"),
    )
    slope = F.when(
        (F.col("__n") >= 2) & (F.col("__varx") != 0),
        F.col("__cov") / F.col("__varx"),
    )
    intercept = F.col("__my") - slope * F.col("__mx")
    return agg.select(
        *group_cols,
        F.col("__n").cast("long").alias("n"),
        slope.alias("slope"),
        intercept.alias("intercept"),
        (F.col("__r") * F.col("__r")).alias("r2"),
    )
