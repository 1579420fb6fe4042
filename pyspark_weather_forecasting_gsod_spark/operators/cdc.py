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

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _row_hash(df: DataFrame, keys: list[str]) -> F.Column:
    """Order-stable md5 over every non-key column, null-safe (NULL and
    'null' must differ: each value is length-prefixed before concat).
    Complex types (array/map/struct) render via ``to_json`` — an
    injective encoding — because ``cast('string')`` is not: ["a, b"] and
    ["a", "b"] both render '[a, b]', which would classify a real update
    as unchanged (r06 review). Top-level MAP columns serialize as their
    key-sorted entry array (maps have no canonical entry order, so raw
    to_json would hash equal maps differently and emit spurious updates
    every run), and null fields are kept (ignoreNullFields would collapse
    map('k'->null) with map()). Maps NESTED inside arrays/structs keep
    to_json's stored order — don't diff on those without canonicalizing
    upstream."""
    dtypes = dict(df.dtypes)
    vals = [c for c in df.columns if c not in keys]
    opts = {"ignoreNullFields": "false"}

    def _canon(c: str) -> F.Column:
        dt = dtypes[c]
        if dt.startswith("map"):
            return F.to_json(F.array_sort(F.map_entries(F.col(c))), opts)
        if dt.startswith(("array", "struct")):
            return F.to_json(F.col(c), opts)
        return F.col(c).cast("string")

    parts = [
        F.concat_ws(
            ":",
            F.length(F.coalesce(_canon(c), F.lit(""))),
            F.coalesce(_canon(c), F.lit(" ")),
        )
        for c in sorted(vals)
    ]
    return F.md5(F.concat_ws("|", *parts).cast("binary"))


def snapshot_diff(
    old: DataFrame, new: DataFrame, keys: list[str], include_old: bool = False
) -> DataFrame:
    """Keyed diff of two snapshots → rows of ``new`` plus a ``change_op``
    column in {'I','U','D'}; unchanged rows are dropped. One full-outer
    hash join on ``keys``. D rows carry the (coalesced) key with NULL
    value columns — the slim transport deliberately omits the deleted
    payload; pass ``include_old=True`` when a consumer needs it.

    ``include_old=True`` additionally carries each pre-change value as
    ``__old_<col>`` (NULL for inserts). This widens the shuffle — the slim
    (key, hash) default is the cheap transport — but makes the changeset
    self-sufficient for *incremental aggregate maintenance*
    (``incremental_agg_update``), which needs the retracted old values."""
    # Side-presence is tracked with explicit marker columns, NOT key
    # nullness: the join is eqNullSafe (NULL keys deliberately match), so a
    # legitimately-NULL key present in both snapshots must classify as
    # 'U'/unchanged, not 'I'.
    old_vals = [c for c in old.columns if c not in keys] if include_old else []
    o = old.withColumn("__h", _row_hash(old, keys)).select(
        *[F.col(k).alias(f"__ok_{k}") for k in keys],
        F.col("__h").alias("__oh"),
        F.lit(True).alias("__old_present"),
        *[F.col(c).alias(f"__old_{c}") for c in old_vals],
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
        *[F.col(f"__old_{c}") for c in old_vals],
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
    # an include_old=True changeset carries __old_<col> helper columns the
    # target table does not have — drop them or the union raises (r06
    # review: one shared diff must feed both this and incremental_agg_update)
    upserts = upserts.drop(*[c for c in upserts.columns if c.startswith("__old_")])
    return kept.unionByName(upserts)


def incremental_agg_update(
    agg: DataFrame,
    diff: DataFrame,
    group_by: list[str],
    sum_cols: dict[str, str],
    count_col: str = "n_rows",
) -> DataFrame:
    """Maintain a materialized SUM/COUNT aggregate from a changeset instead
    of recomputing it — the canonical incremental-view-maintenance shape:
    when 0.1% of a 100 TB fact table changed, touch |diff| rows, not the
    table.

    ``agg`` is the existing aggregate: ``group_by`` columns + ``count_col``
    + one column per ``sum_cols`` key. ``diff`` must come from
    ``snapshot_diff(..., include_old=True)``: every row contributes its NEW
    values (+1) to its new group (ops I,U) and retracts its OLD values (−1)
    from its old group (ops U,D) — two signed contribution rows, so updates
    that MOVE a row between groups maintain both sides correctly. One
    |diff|-sized shuffle on ``group_by`` + one join against the (small)
    delta; groups whose maintained count reaches zero are dropped.

    ``sum_cols`` maps aggregate column → fact column. Use an exact-width
    type (e.g. ``DECIMAL``) for the summed fact columns when bit-identical
    parity with a full recompute matters: float sums are order-dependent, so
    base+delta can drift from a rescan by an ulp.

    Scale note: retractions make this valid ONLY for self-inverse
    aggregates (SUM/COUNT/AVG-via-both). MIN/MAX are not incrementally
    maintainable under deletes without keeping per-group heaps — recompute
    those groups instead.
    """
    # fail fast on a diff built without include_old=True: the __old_
    # fallbacks below would substitute NEW values (U) or NULL (D) for the
    # retractions and the maintained aggregate would silently drift from a
    # recompute (r06 review). A referenced column missing its __old_ twin
    # is legitimate only when it is a diff KEY — in which case the diff
    # carries __old_ twins for the other value columns.
    needs_old = set(group_by) | set(sum_cols.values())
    missing = sorted(
        x for x in needs_old if f"__old_{x}" not in diff.columns
    )
    if missing and not any(c.startswith("__old_") for c in diff.columns):
        raise ValueError(
            f"incremental_agg_update: diff carries no __old_* columns — "
            f"build it with snapshot_diff(..., include_old=True); columns "
            f"{missing} would otherwise contribute wrong retraction values"
        )
    new_side = diff.filter(F.col("change_op").isin("I", "U")).select(
        *[F.col(g).alias(f"__g_{g}") for g in group_by],
        F.lit(1).alias("__sign"),
        *[F.col(src).alias(f"__m_{out}") for out, src in sum_cols.items()],
    )
    # old group value: __old_<g> when g is a value column; the (coalesced)
    # key column itself when g is part of the diff key
    def _old_g(g: str):
        return F.col(f"__old_{g}") if f"__old_{g}" in diff.columns else F.col(g)

    old_side = diff.filter(F.col("change_op").isin("U", "D")).select(
        *[_old_g(g).alias(f"__g_{g}") for g in group_by],
        F.lit(-1).alias("__sign"),
        *[
            (F.col(f"__old_{src}") if f"__old_{src}" in diff.columns else F.col(src)).alias(
                f"__m_{out}"
            )
            for out, src in sum_cols.items()
        ],
    )
    delta = (
        new_side.unionByName(old_side)
        .groupBy(*[F.col(f"__g_{g}") for g in group_by])
        .agg(
            F.sum("__sign").cast("long").alias("__d_count"),
            *[
                F.sum(F.col(f"__m_{out}") * F.col("__sign")).alias(f"__d_{out}")
                for out in sum_cols
            ],
        )
    )
    cond = [agg[g].eqNullSafe(delta[f"__g_{g}"]) for g in group_by]
    j = agg.join(delta, cond, "full_outer")
    zero = F.lit(0)
    merged = j.select(
        *[
            F.coalesce(agg[g], delta[f"__g_{g}"]).alias(g)
            for g in group_by
        ],
        (F.coalesce(agg[count_col], zero) + F.coalesce(F.col("__d_count"), zero))
        .cast("long")
        .alias(count_col),
        *[
            (F.coalesce(agg[out], zero) + F.coalesce(F.col(f"__d_{out}"), zero)).alias(out)
            for out in sum_cols
        ],
    )
    return merged.filter(F.col(count_col) > 0)


def scd2_init(
    snapshot: DataFrame,
    keys: list[str],
    effective_from,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Bootstrap a type-2 slowly-changing dimension from the first
    snapshot: every row open (``valid_to`` NULL, current) as of
    ``effective_from`` (a timestamp literal). ``keys`` must uniquely
    identify snapshot rows — duplicate keys would seed two open rows per
    entity and every later ``scd2_apply`` diff would misclassify them, so
    this validates up front (one bounded-count aggregate; r06 review: the
    parameter was previously accepted but never used)."""
    dup = (
        snapshot.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        bad = {k: dup[0][k] for k in keys}
        raise ValueError(
            f"scd2_init: snapshot keys {keys} are not unique (e.g. {bad} "
            f"appears {dup[0]['__n']} times) — an SCD2 dimension needs one "
            f"open row per entity"
        )
    return snapshot.select(
        *snapshot.columns,
        F.lit(effective_from).cast("timestamp").alias(valid_from),
        F.lit(None).cast("timestamp").alias(valid_to),
        F.lit(True).alias(current_col),
    )


def scd2_apply(
    dim: DataFrame,
    snapshot: DataFrame,
    keys: list[str],
    effective_ts,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Advance a type-2 slowly-changing dimension to a new snapshot
    effective at ``effective_ts`` — the warehouse-history companion to
    ``apply_changeset`` (which keeps only latest values):

    * keys whose attributes changed or disappeared CLOSE their open row
      (``valid_to`` = ts, no longer current);
    * changed and brand-new keys OPEN a fresh row (``valid_from`` = ts);
    * unchanged keys and already-closed history rows pass through
      untouched.

    Everything is keyed joins against ``snapshot_diff``'s changeset (one
    full-outer hash join + two broadcast-or-shuffle semi joins) — no
    window over history, no driver state, so a 100 TB dimension advances
    in one pass per snapshot. Deterministic: same inputs + ts → identical
    table, which is what makes the declared query oracle-hashable."""
    meta = [valid_from, valid_to, current_col]
    cur = dim.filter(F.col(current_col))
    closed_history = dim.filter(~F.col(current_col))
    changes = snapshot_diff(cur.drop(*meta), snapshot, keys)
    ts = F.lit(effective_ts).cast("timestamp")

    # null-safe key matching, mirroring snapshot_diff: a plain equi-join
    # never matches NULL keys, so a changed NULL-key row would open a new
    # current row WITHOUT closing the old one — two is_current rows for
    # the same key (r04 ADVICE)
    affected = changes.filter(F.col("change_op").isin("U", "D")).select(
        *[F.col(k).alias(f"__k_{k}") for k in keys]
    )
    match = reduce(
        lambda a, b: a & b,
        [cur[k].eqNullSafe(F.col(f"__k_{k}")) for k in keys],
    )
    closes = (
        cur.join(affected, match, "left_semi")
        .withColumn(valid_to, ts)
        .withColumn(current_col, F.lit(False))
    )
    unchanged = cur.join(affected, match, "left_anti")
    opens = (
        changes.filter(F.col("change_op").isin("I", "U"))
        .drop("change_op")
        .select(
            *snapshot.columns,
            ts.alias(valid_from),
            F.lit(None).cast("timestamp").alias(valid_to),
            F.lit(True).alias(current_col),
        )
    )
    return (
        closed_history.unionByName(closes)
        .unionByName(unchanged)
        .unionByName(opens)
    )


def scd2_snapshot_feed(
    spark,
    snapshots: list[tuple[str, "DataFrame"]],
    keys: list[str],
    table_dir: str,
) -> "DataFrame":
    """Incremental SCD2 maintenance over an ordered snapshot feed (the
    batch-CDC ingestion pattern — a stand-in for draining a CDC topic):
    each arriving snapshot advances the type-2 dimension (``scd2_apply``)
    and commits the new history as a versioned-table write
    (sources/versioned.py), so the dimension is time-travelable per
    ingest batch AND per entity epoch. Returns the final history.

    Each advance costs one diff join + two semi/anti joins regardless of
    accumulated history size, and the versioned commit keeps readers
    snapshot-isolated during maintenance — a crashed advance leaves the
    previous version latest (the ``_SUCCESS`` gate)."""
    from ..sources.versioned import read_version, write_version

    ts0, first = snapshots[0]
    write_version(scd2_init(first, keys, ts0), table_dir)
    for ts, snap in snapshots[1:]:
        dim = scd2_apply(read_version(spark, table_dir), snap, keys, ts)
        write_version(dim, table_dir)
    return read_version(spark, table_dir)
