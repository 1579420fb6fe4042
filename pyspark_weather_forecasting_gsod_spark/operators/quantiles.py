"""Exact quantiles at scale.

``F.median`` / ``F.percentile`` (A2-A4) buffer every group's values in an
aggregation buffer — fine when group sizes are bounded (per-station medians),
but a GLOBAL exact median over 100 TB would materialize one group of 10^12
values. ``scalable_exact_median`` computes the same exact result with bounded
memory: iteratively narrow the candidate value range with a Greenwald-Khanna
sketch (``percentile_approx``, whose rank error ≤ n/accuracy is a hard
guarantee), count-and-discard everything outside the range, and finish with a
distributed sort of the final small slice. Each iteration shrinks the slice
by ~2·eps, so even 10^12 rows reach ``max_exact`` in 2-3 passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scalable_exact_median(
    df: DataFrame,
    column: str,
    eps: float = 1e-3,
    max_exact: int = 2_000_000,
    max_iters: int = 8,
) -> float | None:
    """Exact median of ``column`` (nulls ignored) with bounded memory.

    Matches ``F.median`` / DuckDB ``median`` semantics: the mean of the two
    middle elements for even counts. Returns None on empty input.
    """
    work = df.select(F.col(column).alias("v")).filter(F.col("v").isNotNull())
    n = work.count()
    if n == 0:
        return None
    k1, k2 = (n - 1) // 2, n // 2  # 0-based target ranks
    offset = 0
    cnt = n
    accuracy = max(int(4.0 / eps), 100)

    for _ in range(max_iters):
        if cnt <= max_exact:
            break
        # target ranks inside the current slice
        t_mid = ((k1 - offset) + (k2 - offset)) / 2.0
        q = t_mid / cnt
        q_lo, q_hi = max(0.0, q - eps), min(1.0, q + eps)
        lo, hi = work.agg(
            F.percentile_approx("v", F.array(F.lit(q_lo), F.lit(q_hi)), accuracy).alias("b")
        ).first()["b"]
        # sketch rank error ≤ cnt/accuracy = cnt·eps/4, so the true target
        # ranks are strictly inside [lo, hi]
        stats = work.agg(
            F.sum((F.col("v") < lo).cast("long")).alias("below"),
            F.sum(((F.col("v") >= lo) & (F.col("v") <= hi)).cast("long")).alias("inside"),
        ).first()
        offset += int(stats["below"])
        cnt = int(stats["inside"])
        work = work.filter((F.col("v") >= lo) & (F.col("v") <= hi))

    # final exact pass on the bounded slice (single-partition sort is fine
    # at ≤ max_exact rows)
    w = Window.orderBy("v")
    ranked = work.withColumn("rk", F.row_number().over(w) - 1 + offset)
    picks = ranked.filter(F.col("rk").isin(k1, k2)).agg(F.avg("v").alias("m")).first()
    return float(picks["m"])


def quantile_bins(
    df: DataFrame,
    value_col: str,
    n_bins: int = 10,
    bin_col: str = "bin",
) -> DataFrame:
    """Equal-frequency discretization (quantile binning) — the ML
    feature-prep transform behind `QuantileDiscretizer`, done the
    scale-correct two-phase way: ONE aggregate computes the n_bins-1
    interior boundaries (exact percentiles with linear interpolation),
    then a broadcast of that single row turns assignment into a map-only
    array fold (``bin = #{boundaries below x}``) fused into the scan — no
    sort, no shuffle of the data itself, unlike NTILE which plans a
    global sort.

    Deterministic: boundaries are exact percentiles, the fold is pure
    arithmetic, so (unlike MLlib's approx-quantile-backed discretizer)
    the binning is reproducible and engine-portable. Ties at a boundary
    go to the lower bin (strict ``>``). NULL values get a NULL bin —
    without the guard, ``IF(NULL > b, 1, 0)`` is 0 for every boundary and
    NULLs silently polluted bin 0 (r06 review).

    Scale note: exact ``percentile`` buffers the column in one aggregate
    task — fine to ~10M rows; beyond that derive the boundaries from
    ``histogram_table``/``histogram_quantiles`` (deterministic, mergeable,
    error ≤ bin width) or ``percentile_approx`` and keep the identical
    map-only assignment stage."""
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    probs = [i / n_bins for i in range(1, n_bins)]
    bounds = df.agg(
        F.expr(
            f"percentile({value_col}, array({', '.join(f'{p!r}D' for p in probs)}))"
        ).alias("__bounds")
    )
    assign = F.expr(
        f"IF({value_col} IS NULL, NULL, "
        f"aggregate(__bounds, 0, (acc, b) -> acc + IF({value_col} > b, 1, 0)))"
    )
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(bin_col, assign)
        .drop("__bounds")
    )
