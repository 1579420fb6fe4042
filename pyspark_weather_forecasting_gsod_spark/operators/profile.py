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
    single pass over the data (reference runs ~5 jobs per column;
    ipynb:631-646).

    Medians never ride inside the main aggregate (r11): ``F.median``'s
    value buffer is non-spillable O(n) in one task, and combined with the
    ``count_distinct`` columns the RewriteDistinctAggregates Expand
    triples the input stream through that buffer — measured 8.6 s at
    sf0.1 for an aggregate whose parts cost 0.9 s + 3.1 s. Instead the
    cheap statistics stay in ONE codegen'd pass and each median attaches
    as a lazily cross-joined 1-row frame from
    ``quantiles.exact_median_frame`` (frequency-table order statistics,
    identical values and FP arithmetic to ``F.median``, bounded by
    |distinct| — measured 2.6× faster end-to-end). Above
    ``scalable_median_over`` rows (O(threshold) limit-probe, never a full
    count) medians switch to ``quantiles.scalable_exact_median``
    (GK-sketch range narrowing, bounded memory at any cardinality). Pass
    ``None`` to force the legacy all-in-one-aggregate plan (the semantic
    oracle the other two paths are tested against)."""
    use_scalable = False
    if scalable_median_over is not None and columns:
        probe = df.limit(scalable_median_over + 1).count()
        use_scalable = probe > scalable_median_over
    in_agg_median = scalable_median_over is None

    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in columns:
        aggs += [
            F.mean(c).alias(f"mean_{c}"),
            F.stddev(c).alias(f"stddev_{c}"),
            F.min(c).alias(f"min_{c}"),
            F.max(c).alias(f"max_{c}"),
            *([F.median(c).alias(f"median_{c}")] if in_agg_median else []),
            F.count_distinct(F.col(c)).alias(f"distinct_{c}"),
        ]
    out = df.agg(*aggs)
    if in_agg_median:
        return out
    if use_scalable:
        from .quantiles import scalable_exact_median

        for c in columns:
            out = out.withColumn(
                f"median_{c}", F.lit(scalable_exact_median(df, c))
            )
    else:
        from .quantiles import exact_median_frame

        for c in columns:
            out = out.crossJoin(
                F.broadcast(exact_median_frame(df, c, f"median_{c}"))
            )
    # restore the canonical column order of the single-pass plan
    ordered = ["n_rows"] + [
        f"{s}_{c}"
        for c in columns
        for s in ("mean", "stddev", "min", "max", "median", "distinct")
    ]
    return out.select(*ordered)


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
