"""Relational primitives: top-k, deterministic mode, select/drop/cast helpers.

Reference equivalents (SURVEY.md §2.2/§2.4/§2.6): P2-P4/P9 projections,
A6 mode-via-top-1 (ipynb:642-643), O1 global sort + limit (Spark plans
TakeOrderedAndProject — a distributed per-partition top-k merge, never a full
global sort, so it scales to any input size).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def top_k(
    df: DataFrame,
    k: int,
    by: str | Sequence[str],
    ascending: bool = False,
    tie_break: str | Sequence[str] | None = None,
) -> DataFrame:
    """Deterministic top-k: ORDER BY ``by`` (+ ``tie_break`` ascending) LIMIT k.

    Reference O1 (ipynb:643) is ``orderBy(desc).first()`` with nondeterministic
    ties; here ties always break on an explicit unique key so results are
    stable across runs and engines.
    """
    by_cols = [by] if isinstance(by, str) else list(by)
    order = [F.col(c).asc() if ascending else F.col(c).desc() for c in by_cols]
    if tie_break:
        tb = [tie_break] if isinstance(tie_break, str) else list(tie_break)
        order += [F.col(c).asc() for c in tb]
    return df.orderBy(*order).limit(k)


def keep_latest(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str],
) -> DataFrame:
    """Keep exactly one row per key: the last by ``order_by`` (make the final
    order column a unique id so the winner is deterministic).

    The standard training-data "latest version of each record" dedup:
    ``row_number() OVER (PARTITION BY keys ORDER BY order_by DESC) = 1``.
    One hash shuffle on ``keys`` + per-partition sort; no global sort, no
    self-join — the shape that survives 100 TB (and AQE splits skewed keys).
    """
    rn = "__kl_rn"  # sentinel-named: withColumn would silently overwrite
    if rn in df.columns:  # a caller column of the same name
        raise ValueError(f"keep_latest: input already has a {rn!r} column")
    spec = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order_by])
    return (
        df.withColumn(rn, F.row_number().over(spec))
        .filter(F.col(rn) == 1)
        .drop(rn)
    )


def mode_top1(df: DataFrame, column: str) -> DataFrame:
    """Deterministic mode: most frequent value, ties broken by value asc.

    Reference A6 (ipynb:642-643): ``groupBy(c).count().orderBy('count',
    ascending=False).first()`` — nondeterministic under ties. Same
    partial+final hash-agg shape here (tiny shuffle: |distinct| rows), plus
    the tie-break.
    """
    counts = df.groupBy(column).agg(F.count(F.lit(1)).alias("cnt"))
    return top_k(counts, 1, by="cnt", tie_break=column)
