"""Grouped-map operators: per-group pandas transforms via ``applyInPandas``.

The Spark surface for per-group imperative logic that window functions can't
express (model-per-group fitting, per-group resampling/interpolation). Each
group arrives as ONE Arrow-batched pandas DataFrame — so at 100 TB the group
key must bound group size (a giant group OOMs its task; check
``operators.skew.skew_profile`` first).

``group_zscore`` is deliberately window-expressible: the declared query
proves the pandas path computes exactly the SQL semantics (sample stddev,
null propagation) — the correctness contract for the non-expressible cases.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def apply_per_group(
    df: DataFrame,
    group_by: str | list[str],
    fn: Callable,
    output_schema: T.StructType | str,
) -> DataFrame:
    """Thin, typed wrapper over ``groupBy().applyInPandas``."""
    keys = [group_by] if isinstance(group_by, str) else list(group_by)
    return df.groupBy(*keys).applyInPandas(fn, schema=output_schema)


def group_zscore(
    df: DataFrame,
    column: str,
    group_by: str,
    id_col: str,
    out_col: str = "zscore",
) -> DataFrame:
    """Per-group z-score ((v - mean)/stddev_samp) as a grouped-map pandas
    transform. Single-member groups and zero-variance groups yield NULL
    (stddev undefined), matching SQL."""

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField(group_by, T.LongType()),
            T.StructField(out_col, T.DoubleType()),
        ]
    )

    def z(pdf):
        import numpy as np
        import pandas as pd

        v = pdf[column]
        sd = v.std(ddof=1)
        if pd.isna(sd) or sd == 0.0:
            zs = pd.Series([np.nan] * len(pdf))
        else:
            zs = (v - v.mean()) / sd
        return pd.DataFrame(
            {id_col: pdf[id_col], group_by: pdf[group_by], out_col: zs}
        )

    return df.groupBy(group_by).applyInPandas(z, schema=out_schema)
