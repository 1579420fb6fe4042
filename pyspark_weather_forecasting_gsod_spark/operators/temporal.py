"""Temporal joins Spark lacks natively: as-of join and tolerance range join.

Both are implemented in the scale-correct shapes:

  * ``asof_join`` — union-merge: tag both sides, union, one window pass per
    key ordered by time carries the latest right-side payload forward
    (``last(..., ignorenulls)``), filter back to left rows. ONE shuffle on
    the key, no per-row range scan, no correlated subquery — the
    sort-merge-asof shape (pandas ``merge_asof``'s distributed equivalent).
  * ``range_join_within`` — |tL − tR| ≤ tolerance joins explode if written
    as a theta join (Catalyst falls back to BroadcastNestedLoopJoin). The
    scalable form buckets both sides by ``floor(t / tolerance)``, joins each
    left bucket to its 3 adjacent right buckets (equi-join → hashable,
    AQE-optimizable), then applies the exact predicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts`` ≤ ``left_ts`` within the same ``key`` (at-or-before; ties
    at identical timestamps match; multiple right rows sharing a timestamp
    resolve deterministically by payload hash). Right payload columns
    arrive as ``<col><suffix>``; unmatched left rows get NULLs (left-outer
    asof).
    """
    payload = F.struct(*[F.col(c) for c in right_cols])
    # a right row with NULL right_ts sorts FIRST (ASC = NULLS FIRST) and
    # its payload would carry forward as a false match for left rows that
    # should match nothing (r08 review) — an unknown-time observation can
    # never be "at or before" anything, so drop it up front. (Left rows
    # with NULL left_ts then sort first themselves and correctly match
    # nothing.)
    right = right.filter(F.col(right_ts).isNotNull())
    r2 = right.select(
        F.col(key),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__src"),
        payload.alias("__payload"),
        # tie-break between right rows sharing (key, ts): payload hash —
        # (__t, __src) alone is not a total order over duplicated right
        # timestamps, so `last()` would pick whichever sorted last under
        # the partition layout (r06 review: nondeterminism)
        F.xxhash64(payload).alias("__tie"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c != key],
    )
    l2 = left.select(
        F.col(key),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__src"),
        F.lit(None).cast(r2.schema["__payload"].dataType).alias("__payload"),
        F.lit(0).cast("long").alias("__tie"),
        *[F.col(c) for c in left.columns if c != key],
    )
    unioned = r2.unionByName(l2)
    # right rows (src 0) sort before left rows at the same instant → equal
    # timestamps match, exactly like ASOF JOIN's `l.t >= r.t`
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("__t"), F.col("__src"), F.col("__tie"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn(
        "__match", F.last("__payload", ignorenulls=True).over(w)
    )
    out_cols = [F.col(key)] + [F.col(c) for c in left.columns if c != key]
    out_cols += [F.col(f"__match.{c}").alias(f"{c}{suffix}") for c in right_cols]
    return carried.filter(F.col("__src") == 1).select(*out_cols)


def range_join_within(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    tolerance_sec: int,
    right_cols: list[str],
) -> DataFrame:
    """All (left, right) pairs with the same ``key`` whose timestamps are
    within ``tolerance_sec`` of each other — as an equi-join on coarse time
    buckets (3 candidates per row) plus the exact filter, never a
    nested-loop theta join."""
    if tolerance_sec <= 0:
        # tol 0 would put `div 0` (NULL) in every bucket expression and
        # silently return nothing (r06 review); exact-timestamp matching
        # is a plain equi-join, not a range join
        raise ValueError(
            "range_join_within requires tolerance_sec > 0; for exact "
            "timestamp matches use an equi-join on (key, ts)"
        )
    tol_us = tolerance_sec * 1_000_000
    lb = F.unix_micros(F.col(left_ts))
    rb = F.unix_micros(F.col(right_ts))
    # backtick-quote: a non-identifier column name (dots, spaces) would
    # otherwise parse as struct access or throw (r08 review)
    lbucket = F.expr(f"unix_micros(`{left_ts}`) div {tol_us}")
    rbucket = F.expr(f"unix_micros(`{right_ts}`) div {tol_us}")
    l2 = left.select(
        F.col(key), *[F.col(c) for c in left.columns if c != key],
        lb.alias("__lt"),
        F.explode(F.array(lbucket - 1, lbucket, lbucket + 1)).alias("__bucket"),
    )
    r2 = right.select(
        F.col(key).alias("__rkey"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
        rb.alias("__rt"),
        rbucket.alias("__bucket"),
    )
    # a qualifying pair shares exactly one candidate bucket → no dedup needed
    joined = l2.join(
        r2, (l2[key] == r2["__rkey"]) & (l2["__bucket"] == r2["__bucket"])
    ).filter(F.abs(F.col("__lt") - F.col("__rt")) <= tol_us)
    return joined.select(
        F.col(key),
        *[F.col(c) for c in left.columns if c != key],
        *[F.col(f"__r_{c}").alias(f"{c}_r") for c in right_cols],
    )


def gap_fill_spine(
    df: DataFrame,
    group_by: str,
    tick_col: str,
    value_cols: list[str],
    step: int = 1,
) -> DataFrame:
    """Densify an integer time axis: for every group emit one row per tick
    from the group's min to max ``tick_col`` (stride ``step``), left-joining
    the observed rows so introduced gap ticks carry NULLs (callers chain
    ``forward_fill`` / ``linear_interpolate`` to fill them). ``tick_col``
    must be integral (epoch day / epoch hour / any discretized axis).

    The resample-to-regular-grid primitive every time-series pipeline needs
    (the GSOD reference's station×day table is *assumed* dense; real feeds
    are not). Scale shape: the spine is built from a per-group min/max agg
    (tiny output) exploded JVM-side via ``sequence`` — rows generated
    distributed, proportional to the gap span, never on the driver — then
    ONE left equi-join on (group, tick), shuffle-hashable and
    AQE-coalesced. Dense-span skew (one group spanning years) can be split
    by salting the spine on tick ranges; at GSOD scale (365 ticks/group/yr)
    no salt is needed.
    """
    observed = df.groupBy(group_by).agg(
        F.min(tick_col).alias("__mn"), F.max(tick_col).alias("__mx")
    )
    spine = observed.select(
        F.col(group_by),
        F.explode(
            F.sequence(F.col("__mn"), F.col("__mx"), F.lit(step))
        ).alias(tick_col),
    )
    # NULL ticks are on no axis — excluded from densification (and from
    # the min/max above, which skip NULLs anyway)
    obs = df.filter(F.col(tick_col).isNotNull()).select(
        group_by, tick_col, *[F.col(c) for c in value_cols]
    )
    # FULL outer, not left (r08 review): with step > 1 an observed row
    # whose tick is off the min-anchored stride (including the group max)
    # fell off the left join entirely — densification must never LOSE
    # observations. At step == 1 every observed tick is on the spine, so
    # the output is identical to the old left join. Null-SAFE keys
    # (r09/ADVICE #2): groupBy treats NULL as a real group, so the spine
    # carries a NULL-group row; a null-unsafe `on=` would never match it
    # to its observations and both halves would survive the full join,
    # breaking the one-row-per-(group, tick) contract. `<=>` still plans
    # as a hash-join key, so the shuffle shape is unchanged.
    obs = obs.select(
        F.col(group_by).alias("__og"),
        F.col(tick_col).alias("__ot"),
        *[F.col(c) for c in value_cols],
    )
    cond = F.col(group_by).eqNullSafe(F.col("__og")) & (
        F.col(tick_col) == F.col("__ot")
    )
    return spine.join(obs, cond, "full").select(
        F.coalesce(F.col(group_by), F.col("__og")).alias(group_by),
        F.coalesce(F.col(tick_col), F.col("__ot")).alias(tick_col),
        *[F.col(c) for c in value_cols],
    )


def ohlc_bars(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    group_cols: list[str],
    interval: str = "1 hour",
    tie_col: str | None = None,
) -> DataFrame:
    """Open/high/low/close downsampling to fixed intervals (the financial
    "bars" shape, equally the telemetry-downsampling shape): per group ×
    time bucket, the first value, max, min, last value, and count — ONE
    aggregate pass using ``min_by``/``max_by`` on the (timestamp,
    tie-break) key, no window, no sort. ``tie_col`` (default: the value
    itself) disambiguates equal timestamps deterministically.

    NULL semantics (defined, r05 VERDICT): NULL ``value_col`` rows are
    filtered BEFORE aggregation — same policy as ``cusum_drift``. Without
    the filter the four statistics disagree on NULLs (``min_by``/``max_by``
    keys can select a NULL value while ``max``/``min`` skip them), so a
    bar could report NULL open/close beside non-NULL high/low, and
    ``n_points`` would count unmeasured rows. A bucket with only NULL
    values therefore produces NO bar (not a NULL-filled one).

    At 100 TB this is a single map-side-combined hash agg on
    (group, bucket) — the scale-correct alternative to first()/last()
    over ordered windows, which would pay a full per-group sort."""
    tie = F.col(tie_col) if tie_col else F.col(value_col)
    key = F.struct(F.col(ts_col).alias("t"), tie.alias("tb"))
    bucket = F.window(F.col(ts_col), interval).getField("start").alias("bucket")
    # NULL ts escapes the value policy below into a spurious NULL bucket
    # whose open/close degrade to tie-only ordering (r08 review) — an
    # unmeasured TIME is as unusable as an unmeasured value
    df = df.filter(F.col(value_col).isNotNull() & F.col(ts_col).isNotNull())
    return df.groupBy(*group_cols, bucket).agg(
        F.min_by(F.col(value_col), key).alias("open"),
        F.max(value_col).alias("high"),
        F.min(value_col).alias("low"),
        F.max_by(F.col(value_col), key).alias("close"),
        F.count(F.lit(1)).alias("n_points"),
    )


def seasonal_anomaly(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    group_cols: list[str],
    season: str = "month",
    out_col: str = "anomaly",
    mean_decimals: int | None = None,
) -> DataFrame:
    """Climatology + anomaly decomposition — the weather-domain transform
    (value minus its (group × season) mean, e.g. a station's temperature
    relative to ITS January normal): one (group, season) mean aggregate
    broadcast-joined back onto the facts (the J2 imputer shape), adding
    ``<out_col>`` and ``__season_mean``-free output. NULL values pass
    through with NULL anomaly; seasons are calendar fields (``month``,
    ``quarter``, ``dayofweek``, ``hour``).

    At 100 TB the climatology side is |groups|·|seasons| rows — always
    broadcastable — and the fact table never shuffles."""
    extractors = {
        "month": F.month,
        "quarter": F.quarter,
        "dayofweek": F.dayofweek,
        "hour": F.hour,
    }
    if season not in extractors:
        raise ValueError(f"season must be one of {sorted(extractors)}")
    skey = extractors[season](F.col(ts_col)).alias("__season")
    # mean_decimals: for fixed-decimal readings (sensor values recorded to
    # d places), round(SUM, d)/COUNT recovers the EXACT rational mean —
    # the true sum is a d-decimal grid point and any summation order lands
    # within ~1e-11 of it, so the rounded sum (hence the mean, hence every
    # anomaly) is bit-identical across engines and partitionings. Plain
    # avg() is summation-order-sensitive in the last ulp.
    mean = (
        F.round(F.sum(value_col), mean_decimals) / F.count(value_col)
        if mean_decimals is not None
        else F.avg(value_col)
    )
    clim = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*group_cols, skey)
        .agg(mean.alias("__clim"))
    )
    return (
        df.withColumn("__season", extractors[season](F.col(ts_col)))
        .join(F.broadcast(clim), [*group_cols, "__season"], "left")
        .withColumn(out_col, F.col(value_col) - F.col("__clim"))
        .drop("__season", "__clim")
    )


def grouped_trend_ols(
    df: DataFrame,
    group_cols: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    origin_epoch_s: int = 0,
    unit_seconds: int = 3600,
    value_decimals: int = 2,
) -> DataFrame:
    """Per-group closed-form OLS trend — "fit a model per key" done the
    Spark-first way: ONE hash aggregate of five sufficient statistics
    (n, Σx, Σy, Σx², Σxy), then slope/intercept as arithmetic on the agg
    row. No per-group Python fit, no applyInPandas, no iteration: at
    100 TB this is a single map-side-combinable shuffle keyed by the
    group — the same plan shape as any grouped sum — where a
    grouped-map fit would ship every row into Python workers.

    Engine-exact by construction (the ``seasonal_anomaly`` mean_decimals
    doctrine, extended to regression): x = FLOOR((epoch(ts) − origin) /
    unit_seconds) and y = ROUND(value·10^d) are INTEGERS, so all five
    sums are exact in 64-bit across any partitioning/summation order, the
    normal-equation terms n·Σxy − ΣxΣy and n·Σx² − (Σx)² are exact
    integer arithmetic, and the only floating-point ops are the final
    divisions — one fixed IEEE expression, bit-identical in any engine
    that replays it. Plain ``regr_slope``-style double accumulation is
    summation-order-sensitive in the last ulps.

    Exactness bound (document, don't guess): the five SUMS accumulate in
    64-bit — with |x| ≤ X and |y·10^d| ≤ Y per group of n rows the
    binding term is Σxy ≤ n·X·Y, so a year of hourly units (X ≈ 8,760)
    at 2-dp values (Y ≈ 4.9×10^6) allows n ≈ 2×10^8 rows per group
    (coarsen ``unit_seconds``, re-origin, or drop ``value_decimals`` to
    extend). The NORMAL-EQUATION products (n·Σxy − Σx·Σy, n·Σx² − Σx²)
    would square that bound away in 64-bit, so they run in 38-digit
    exact arithmetic instead — Spark decimal(38,0), replayed by DuckDB
    HUGEINT: identical integers, identical final doubles. Both engines
    RAISE on overflow of their respective widths (Spark 4 ANSI, DuckDB
    checked arithmetic) — a violation is loud, never silent.

    Output: group_cols + (n_obs, slope, intercept) — slope in value
    units per ``unit_seconds``; intercept is the fitted value at
    ``origin_epoch_s``. Groups with n < 2 or zero x-variance are
    dropped (no line to fit). NULL values/timestamps are excluded.
    """
    scale = float(10**value_decimals)
    x = F.floor(
        (F.unix_timestamp(F.col(ts_col)) - F.lit(origin_epoch_s))
        / F.lit(unit_seconds)
    ).cast("long")
    y = F.round(F.col(value_col) * scale, 0).cast("long")
    e = (
        df.filter(F.col(ts_col).isNotNull() & F.col(value_col).isNotNull())
        .select(*group_cols, x.alias("__x"), y.alias("__y"))
    )
    s = e.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__x").alias("__sx"),
        F.sum("__y").alias("__sy"),
        F.sum(F.col("__x") * F.col("__x")).alias("__sxx"),
        F.sum(F.col("__x") * F.col("__y")).alias("__sxy"),
    )
    dec = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    num = dec("__n") * dec("__sxy") - dec("__sx") * dec("__sy")
    den = dec("__n") * dec("__sxx") - dec("__sx") * dec("__sx")
    slope = num.cast("double") / den.cast("double") / F.lit(scale)
    intercept = (
        F.col("__sy").cast("double") / F.lit(scale)
        - slope * F.col("__sx").cast("double")
    ) / F.col("__n").cast("double")
    return (
        s.filter((F.col("__n") >= 2) & (den > 0))
        .select(
            *group_cols,
            F.col("__n").alias("n_obs"),
            F.round(slope, 9).alias("slope"),
            F.round(intercept, 6).alias("intercept"),
        )
    )
