"""Skew-mitigation utilities for joins on hot keys.

AQE's skew-join splitting handles sort-merge joins it can see; explicit
salting is the tool when (a) one side's hot keys are known/persistent,
(b) the join is not AQE-splittable (e.g. both sides pre-bucketed), or
(c) the skew is in an aggregation key. ``salted_join`` replicates the
small side ``num_salts`` times and scatters the skewed side across salt
buckets, so one hot key fans out over ``num_salts`` tasks instead of
serializing one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str | list[str],
    num_salts: int = 16,
    how: str = "inner",
    salt_src: Column | None = None,
) -> DataFrame:
    """Join with the skewed side salted across ``num_salts`` sub-keys.

    ``other`` (the non-skewed side) is exploded ``num_salts``× — keep it the
    smaller side. ``salt_src`` picks the salting expression (default: a hash
    of the whole row via ``xxhash64`` over all columns — deterministic, no
    rand() partition sensitivity). Result equals the plain join exactly —
    for the INNER/LEFT family only, which is why other join types are
    rejected: a replicated right row whose salt matches no left row would
    survive a right/full outer join as a spurious null-padded duplicate
    (r06 review: verified num_salts-1 fabricated rows per unmatched right
    row). To salt a right join, swap the inputs and use how='left'.
    """
    allowed = {"inner", "left", "leftouter", "left_outer", "semi",
               "leftsemi", "left_semi", "anti", "leftanti", "left_anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} would emit one spurious null-padded "
            f"row per unmatched (right row, salt) replica; only the "
            f"inner/left join family preserves plain-join semantics under "
            f"right-side replication — swap the inputs for a right join"
        )
    keys = [on] if isinstance(on, str) else list(on)
    salt = (
        F.pmod(salt_src, F.lit(num_salts))
        if salt_src is not None
        else F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(num_salts))
    )
    left = skewed.withColumn("__salt", salt.cast("int"))
    right = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    )
    joined = left.join(right, on=keys + ["__salt"], how=how)
    return joined.drop("__salt")


def skew_profile(df: DataFrame, key: str, top: int = 10) -> DataFrame:
    """Per-key row counts, heaviest first — the pre-flight check before
    choosing a window/join partition key at scale."""
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy(F.col("n_rows").desc(), F.col(key))
        .limit(top)
    )
