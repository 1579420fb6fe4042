"""Keyed upsert (MERGE) into a parquet dataset.

Plain parquet has no transactional MERGE (that's Delta/Iceberg territory —
not available in this environment), so this implements the portable
rewrite-merge: union existing + incoming, keep the winning row per key
(incoming beats existing; ties inside each side broken by a version column),
write to a writer-private staging directory, then swap via two renames.

Concurrency contract: SINGLE WRITER per target (the same contract every
hive-style rewrite-merge has). The uuid staging directory means a second
writer can no longer corrupt the first's staging output (r06 review: a
shared ``.__staging`` path let overwrite-mode writes delete each other
mid-write), but two concurrent merges still last-write-win on the final
swap — serialize writers, or use sources/versioned.py when history and
concurrent commits matter. Readers racing the swap can hit the brief
window between the two renames in which the target is absent; the
versioned table is the isolation-correct alternative there too.
"""

from __future__ import annotations

import os
import shutil
import uuid

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

    # writer-private staging (errorifexists: a name collision is a bug,
    # not something to overwrite), then swap: move the old table aside,
    # rename staging in, drop the old data. Each rename is atomic; a crash
    # between them leaves the merged data intact in the staging/trash dirs
    # rather than silently losing the table to a rmtree-then-rename gap.
    base = target_path.rstrip("/")
    staging = f"{base}.__staging-{uuid.uuid4().hex}"
    try:
        merged.write.mode("errorifexists").parquet(staging)
    except Exception:
        # a failed write must not leak a uniquely-named orphan per attempt
        # (nothing sweeps these siblings of the target — r06 review)
        shutil.rmtree(staging, ignore_errors=True)
        raise
    if os.path.exists(target_path):
        trash = f"{base}.__trash-{uuid.uuid4().hex}"
        os.rename(target_path, trash)
        os.rename(staging, target_path)
        shutil.rmtree(trash, ignore_errors=True)
    else:
        os.rename(staging, target_path)
