"""Data-quality operators: sentinel normalization and missing-value census.

Reference equivalents:
  * C1 ``normalize_sentinels`` — ipynb:239-247: a dict of column→sentinel
    (9999.9 / 999.9 / 99.99) applied via 12 chained ``withColumn(when(...))``.
  * C9 ``missing_census`` — ipynb:330, 1165: ``df.filter(col(c).isNull())
    .count()`` per column = N full table scans.

Scale changes: both are built as ONE ``select`` / ONE ``agg`` so the whole
thing is a single pass regardless of column count (chained ``withColumn``
grows the plan object superlinearly — the reference hits Spark's
"plan string too large" warning, ipynb:206).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Predicate-style sentinel spec: column -> either a literal sentinel value
# (reference style: exact equality, ipynb:246) or a Column predicate for
# range-style sentinels ("anything above the physical max is a bad read").
SentinelSpec = Mapping[str, object]


def _sentinel_predicate(col: str, spec: object) -> Column:
    if isinstance(spec, Column):
        return spec
    if callable(spec):
        return spec(F.col(col))
    return F.col(col) == F.lit(spec)


def normalize_sentinels(df: DataFrame, sentinels: SentinelSpec) -> DataFrame:
    """Rewrite sentinel-encoded missing values to SQL NULL.

    Reference: ipynb:239-247 (`when(col(c) == sentinel, None).otherwise(col(c))`
    per column). Single projection here: Catalyst sees one Project node, the
    rewrite is codegen'd with the scan, and no lineage blowup occurs.
    """
    exprs = []
    for name in df.columns:
        if name in sentinels:
            pred = _sentinel_predicate(name, sentinels[name])
            exprs.append(F.when(pred, F.lit(None)).otherwise(F.col(name)).alias(name))
        else:
            exprs.append(F.col(name))
    return df.select(*exprs)


def missing_census(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Per-column null counts in ONE aggregation pass.

    Reference: ipynb:330 / ipynb:1165 run one full ``filter(isNull).count()``
    scan per column (~25 scans of a 4M-row table). Here:
    ``sum(isnull(c)::long)`` for every column in a single partial+final
    hash-agg — one scan at any column count, and the all-null-counts result is
    a single row.

    Returns one row: ``n_rows`` plus ``null_<col>`` per column.
    """
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("n_rows")] + [
        F.sum(F.col(c).isNull().cast("long")).alias(f"null_{c}") for c in cols
    ]
    return df.agg(*aggs)
