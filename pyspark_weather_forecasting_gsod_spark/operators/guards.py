"""Scale pre-flight guards shared by operators that materialize per-group
state (the ``collect_list`` fold family: ``cusum_drift``, ``ewma``,
``rolling_frame_median``, …).

Why this exists (r05 VERDICT): an operator that gathers a group's ordered
sequence into one array has per-executor memory proportional to the LARGEST
group, not the average. On the test fixtures every group is tiny; at 100×
scale one pathological group (a bot user, a default key, an unparsed-id
bucket) silently OOMs the executor holding it. Docstrings saying
"pre-aggregate first" don't enforce anything — these guards do, for the
price of one extra count aggregate, and only when the caller opts in.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check_max_group_rows(
    df: DataFrame,
    group_by: str | list[str],
    max_group_rows: int | None,
    op_name: str,
) -> None:
    """Raise if any group exceeds ``max_group_rows`` rows.

    ``None`` disables the check (zero cost — the caller accepts unbounded
    per-group state, e.g. bounded test fixtures or upstream-capped grains).
    Otherwise runs ONE map-side-combined count aggregate on the group key
    — the cheapest possible full-data pass, orders cheaper than the fold
    it protects — and reports the three hottest offenders so the caller
    can see whether it's one rogue key (filter it) or a grain problem
    (pre-aggregate to a coarser grain)."""
    if max_group_rows is None:
        return
    if max_group_rows < 1:
        raise ValueError("max_group_rows must be >= 1 (or None to disable)")
    cols = [group_by] if isinstance(group_by, str) else list(group_by)
    hot = (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > max_group_rows)
        .orderBy(F.desc("__n"))
        .limit(3)
        .collect()
    )
    if hot:
        worst = ", ".join(
            f"{tuple(r[c] for c in cols)}={r['__n']} rows" for r in hot
        )
        raise ValueError(
            f"{op_name}: group(s) exceed max_group_rows={max_group_rows} "
            f"(hottest: {worst}). Per-group state is O(group size) here — "
            f"a group this large risks executor OOM at scale. Filter the "
            f"rogue key(s), pre-aggregate to a coarser grain, or raise "
            f"max_group_rows deliberately."
        )


def assert_no_order_tie(
    df: DataFrame, w, order_cols: list[Column], op: str
) -> DataFrame:
    """Guard the md5-rank doctrine's precondition AT EXECUTION TIME, for
    free: every deterministic-selection operator here ranks rows under a
    window order that is total ONLY if no two rows tie on the full
    ordering tuple — ≥2 NULL-key rows share the sentinel digest, and
    duplicate keys share everything, so ``row_number`` would assign their
    positions nondeterministically across partitionings (r07 advice: the
    'total order / oracle-hashable' contract was silently breakable).

    Detection is a ``lag`` over the SAME window spec the rank uses — tied
    rows are adjacent in that order, so one extra window expression in the
    already-paid sort catches every tie with zero additional shuffle; the
    ``assert_true`` is forced through a row-preserving filter
    (``isNull()`` of a NULL-on-success expression) so column pruning can't
    drop it. On violation the job raises instead of emitting a
    nondeterministic order."""
    # eqNullSafe alone conflates "no preceding row" (lag = NULL) with
    # "preceding value is NULL": a partition's FIRST row whose order
    # columns are all NULL would be falsely flagged (r08 review) — require
    # a predecessor to exist before comparing
    dup: Column = F.lag(F.lit(1)).over(w).isNotNull()
    for c in order_cols:
        dup = dup & c.eqNullSafe(F.lag(c).over(w))
    msg = (
        f"{op}: ordering tie — two rows share the full ranking tuple "
        "(duplicate key, or more than one NULL-key row); the deterministic "
        "total-order contract needs a unique, at-most-once-NULL key"
    )
    # window expressions are illegal inside a WHERE clause — materialize
    # the tie flag as a column (same Window exec as the rank), then force
    # the assert through the row-preserving filter
    if "__tie" in df.columns:
        # overwriting-then-dropping a caller's __tie column would silently
        # lose it — refuse, like cap_per_group does
        raise ValueError(f"{op}: input already has a '__tie' column")
    return (
        df.withColumn("__tie", F.coalesce(dup, F.lit(False)))
        .filter(F.assert_true(~F.col("__tie"), F.lit(msg)).isNull())
        .drop("__tie")
    )
