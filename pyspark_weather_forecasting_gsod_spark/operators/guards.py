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

from pyspark.sql import DataFrame
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
