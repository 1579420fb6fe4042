"""Change-data-capture operators: snapshot diff and changeset apply.

Not in the reference (one static CSV — SURVEY.md §1); this is the
incremental-processing extension. Recomputing a 100 TB derived table because
0.1% of the source changed is the canonical scale failure; the fix is to
compute the *delta* between snapshots and propagate only that.

``snapshot_diff`` is one full-outer shuffle join on the key. Row comparison
uses a single md5 over the canonicalized value columns, so the join carries
(key, hash) instead of (key, all columns) through the exchange — at wide
schemas this shrinks shuffle bytes by the width ratio. ``apply_changeset``
is the inverse: old ⊕ diff(old, new) == new (property-tested), which is what
makes the diff a safe transport format for downstream replication.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _row_hash(df: DataFrame, keys: list[str]) -> F.Column:
    """Order-stable md5 over every non-key column, null-safe (NULL and
    'null' must differ: each value is length-prefixed before concat)."""
    vals = [c for c in df.columns if c not in keys]
    parts = [
        F.concat_ws(
            ":",
            F.length(F.coalesce(F.col(c).cast("string"), F.lit(""))),
            F.coalesce(F.col(c).cast("string"), F.lit(" ")),
        )
        for c in sorted(vals)
    ]
    return F.md5(F.concat_ws("|", *parts).cast("binary"))


def snapshot_diff(old: DataFrame, new: DataFrame, keys: list[str]) -> DataFrame:
    """Keyed diff of two snapshots → rows of ``new`` (or ``old`` for
    deletes) plus a ``change_op`` column in {'I','U','D'}; unchanged rows
    are dropped. One full-outer hash join on ``keys``."""
    # Side-presence is tracked with explicit marker columns, NOT key
    # nullness: the join is eqNullSafe (NULL keys deliberately match), so a
    # legitimately-NULL key present in both snapshots must classify as
    # 'U'/unchanged, not 'I'.
    o = old.withColumn("__h", _row_hash(old, keys)).select(
        *[F.col(k).alias(f"__ok_{k}") for k in keys],
        F.col("__h").alias("__oh"),
        F.lit(True).alias("__old_present"),
    )
    n = new.withColumn("__h", _row_hash(new, keys)).withColumn(
        "__new_present", F.lit(True)
    )
    cond = [n[k].eqNullSafe(o[f"__ok_{k}"]) for k in keys]
    j = n.join(o, cond, "full_outer")
    op = (
        F.when(F.col("__old_present").isNull(), F.lit("I"))
        .when(F.col("__new_present").isNull(), F.lit("D"))
        .when(F.col("__h") != F.col("__oh"), F.lit("U"))
        .otherwise(F.lit(None))
    )
    keyed = j.select(
        *[F.coalesce(n[k], F.col(f"__ok_{k}")).alias(k) for k in keys],
        *[n[c] for c in new.columns if c not in keys],
        op.alias("change_op"),
    )
    return keyed.filter(F.col("change_op").isNotNull())


def apply_changeset(old: DataFrame, changes: DataFrame, keys: list[str]) -> DataFrame:
    """Replay a ``snapshot_diff`` changeset onto ``old``: deletes remove the
    key, inserts/updates replace it. Anti-join + union — same shuffle key as
    the diff, so AQE reuses the exchange when both run in one plan."""
    touched = changes.select(*[F.col(k).alias(f"__ck_{k}") for k in keys])
    # null-safe anti-join: a changed row with a legitimately-NULL key must
    # still remove/replace the matching old row (old ⊕ diff == new property)
    cond = [old[k].eqNullSafe(touched[f"__ck_{k}"]) for k in keys]
    kept = old.join(touched, cond, "left_anti")
    upserts = changes.filter(F.col("change_op") != "D").drop("change_op")
    return kept.unionByName(upserts)
