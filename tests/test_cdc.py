"""CDC snapshot diff / apply (operators/cdc.py)."""

from pyspark.sql import Row

from pyspark_weather_forecasting_gsod_spark.operators.cdc import (
    apply_changeset,
    snapshot_diff,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_snapshot_diff_classifies_and_drops_unchanged(spark):
    old = spark.createDataFrame(
        [
            Row(k=1, v="a", x=1.0),
            Row(k=2, v="b", x=2.0),
            Row(k=3, v="c", x=3.0),
        ]
    )
    new = spark.createDataFrame(
        [
            Row(k=1, v="a", x=1.0),   # unchanged
            Row(k=2, v="B", x=2.0),   # updated
            Row(k=4, v="d", x=4.0),   # inserted
        ]
    )
    got = {r.k: r.change_op for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got == {2: "U", 3: "D", 4: "I"}


def test_snapshot_diff_null_vs_empty_vs_literal_null_string(spark):
    # the length-prefixed hash must distinguish NULL, '', and 'null'
    old = spark.createDataFrame(
        [Row(k=1, v=None), Row(k=2, v=""), Row(k=3, v="null")],
        "k long, v string",
    )
    new = spark.createDataFrame(
        [Row(k=1, v=""), Row(k=2, v="null"), Row(k=3, v="null")],
        "k long, v string",
    )
    got = {r.k: r.change_op for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got == {1: "U", 2: "U"}  # k=3 unchanged

    # adjacent-column bleed: ('ab','') vs ('a','b') must differ
    old2 = spark.createDataFrame([Row(k=1, a="ab", b="")], "k long, a string, b string")
    new2 = spark.createDataFrame([Row(k=1, a="a", b="b")], "k long, a string, b string")
    assert {r.change_op for r in snapshot_diff(old2, new2, ["k"]).collect()} == {"U"}


def test_apply_changeset_roundtrip_reconstructs_new(spark, sf_dir):
    from pyspark.sql import functions as F

    from pyspark_weather_forecasting_gsod_spark.sources.io import load_table

    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    new = (
        base.filter(F.col("o_orderkey") % 7 != 0)
        .withColumn(
            "o_totalprice",
            F.when(F.col("o_orderkey") % 5 == 0, F.col("o_totalprice") * 2)
            .otherwise(F.col("o_totalprice")),
        )
        .unionByName(
            base.filter((F.col("o_orderkey") % 11 == 0) & (F.col("o_orderkey") > 0))
            .select(
                (-F.col("o_orderkey")).alias("o_orderkey"),
                "o_custkey",
                "o_totalprice",
            )
        )
    )
    diff = snapshot_diff(base, new, ["o_orderkey"]).cache()
    assert diff.count() > 0
    rebuilt = apply_changeset(base, diff, ["o_orderkey"])
    assert _rows(rebuilt) == _rows(new)
    # empty diff is a no-op
    assert _rows(apply_changeset(new, snapshot_diff(new, new, ["o_orderkey"]), ["o_orderkey"])) == _rows(new)
    diff.unpersist()


def test_null_key_present_in_both_snapshots_is_update_not_insert(spark):
    """eqNullSafe join keys: a row whose key is legitimately NULL and exists
    in both snapshots must classify via presence markers ('U' / unchanged),
    and apply_changeset must replace (not duplicate) the NULL-key row."""
    old = spark.createDataFrame([Row(k=None, v="a"), Row(k=1, v="x")])
    new = spark.createDataFrame([Row(k=None, v="CHANGED"), Row(k=1, v="x")])
    diff = snapshot_diff(old, new, ["k"])
    got = [(r.k, r.change_op) for r in diff.collect()]
    assert got == [(None, "U")]

    replayed = apply_changeset(old, diff, ["k"])
    canon = lambda df: sorted(  # noqa: E731 — None-safe sort
        (tuple(r) for r in df.collect()), key=str
    )
    assert canon(replayed) == canon(new)


def test_null_key_unchanged_in_both_snapshots_emits_nothing(spark):
    old = spark.createDataFrame([Row(k=None, v="same")], "k bigint, v string")
    new = spark.createDataFrame([Row(k=None, v="same")], "k bigint, v string")
    assert snapshot_diff(old, new, ["k"]).count() == 0


def test_snapshot_diff_include_old_carries_prechange_values(spark):
    old = spark.createDataFrame([Row(k=1, g="a", v=10.0), Row(k=2, g="a", v=20.0)])
    new = spark.createDataFrame([Row(k=1, g="b", v=15.0), Row(k=3, g="c", v=30.0)])
    diff = snapshot_diff(old, new, ["k"], include_old=True)
    got = {
        r["k"]: (r["change_op"], r["g"], r["v"], r["__old_g"], r["__old_v"])
        for r in diff.collect()
    }
    assert got[1] == ("U", "b", 15.0, "a", 10.0)   # update: both versions
    assert got[2] == ("D", None, None, "a", 20.0)  # delete: old only
    assert got[3] == ("I", "c", 30.0, None, None)  # insert: new only


def test_incremental_agg_update_matches_full_recompute(spark):
    """Insert into a fresh group, update that moves a row between groups,
    value-only update, and a delete that empties its group — the maintained
    aggregate must equal a recompute from the new snapshot."""
    from pyspark_weather_forecasting_gsod_spark.operators.cdc import (
        incremental_agg_update,
    )
    from pyspark.sql import functions as F

    old = spark.createDataFrame(
        [
            Row(k=1, g="a", v=10.0),
            Row(k=2, g="a", v=20.0),
            Row(k=3, g="b", v=30.0),  # will move to group a with new value
            Row(k=4, g="c", v=40.0),  # will be deleted → group c vanishes
        ]
    )
    new = spark.createDataFrame(
        [
            Row(k=1, g="a", v=10.0),   # unchanged
            Row(k=2, g="a", v=25.0),   # value update
            Row(k=3, g="a", v=35.0),   # group migration b→a
            Row(k=5, g="d", v=50.0),   # insert into fresh group
        ]
    )

    def recompute(df):
        return df.groupBy("g").agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("v").alias("sum_v"),
        )

    base = recompute(old)
    diff = snapshot_diff(old, new, ["k"], include_old=True)
    maintained = incremental_agg_update(
        base, diff, group_by=["g"], sum_cols={"sum_v": "v"}, count_col="n_rows"
    )
    want = sorted(tuple(r) for r in recompute(new).collect())
    got = sorted(tuple(r) for r in maintained.collect())
    assert got == want


# ---------------------------------------------------------------------------
# SCD2 (type-2 slowly-changing dimension)
# ---------------------------------------------------------------------------


def test_scd2_close_keep_open_routing(spark):
    from pyspark.sql import functions as F

    from pyspark_weather_forecasting_gsod_spark.operators.cdc import (
        scd2_apply,
        scd2_init,
    )

    s1 = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["k", "attr"]
    )
    # key 1 unchanged, key 2 changed, key 3 deleted, key 4 inserted
    s2 = spark.createDataFrame([(1, "a"), (2, "B"), (4, "d")], ["k", "attr"])
    dim = scd2_init(s1, ["k"], "2024-01-01 00:00:00")
    out = scd2_apply(dim, s2, ["k"], "2024-02-01 00:00:00")
    rows = {(r["k"], r["attr"], r["is_current"], r["valid_to"] is None) for r in out.collect()}
    assert rows == {
        (1, "a", True, True),     # unchanged: still the T1 open row
        (2, "b", False, False),   # changed: T1 row closed
        (2, "B", True, True),     # changed: T2 row open
        (3, "c", False, False),   # deleted: T1 row closed, no new row
        (4, "d", True, True),     # inserted: T2 row open
    }
    # exactly one current row per live key
    cur = out.filter(F.col("is_current")).groupBy("k").count().collect()
    assert all(r["count"] == 1 for r in cur)


def test_scd2_null_key_rows_close_properly(spark):
    """A changed row with a NULL key must CLOSE its old version: plain
    semi/anti joins reject NULL keys (r04 ADVICE), which left two
    is_current rows for the NULL key while snapshot_diff matched it
    null-safely."""
    from pyspark.sql import functions as F

    from pyspark_weather_forecasting_gsod_spark.operators.cdc import (
        scd2_apply,
        scd2_init,
    )

    s1 = spark.createDataFrame([(None, "x"), (1, "a")], "k int, attr string")
    s2 = spark.createDataFrame([(None, "X"), (1, "a")], "k int, attr string")
    dim = scd2_init(s1, ["k"], "2024-01-01 00:00:00")
    out = scd2_apply(dim, s2, ["k"], "2024-02-01 00:00:00")
    rows = {
        (r["k"], r["attr"], r["is_current"], r["valid_to"] is None)
        for r in out.collect()
    }
    assert rows == {
        (None, "x", False, False),  # old NULL-key version CLOSED
        (None, "X", True, True),    # new NULL-key version open
        (1, "a", True, True),       # unchanged key passes through
    }
    # exactly one current row per key, including the NULL key
    cur = (
        out.filter(F.col("is_current"))
        .groupBy("k")
        .count()
        .collect()
    )
    assert all(r["count"] == 1 for r in cur)


def test_scd2_second_apply_preserves_closed_history(spark):
    from pyspark.sql import functions as F

    from pyspark_weather_forecasting_gsod_spark.operators.cdc import (
        scd2_apply,
        scd2_init,
    )

    s1 = spark.createDataFrame([(1, "a")], ["k", "attr"])
    s2 = spark.createDataFrame([(1, "b")], ["k", "attr"])
    s3 = spark.createDataFrame([(1, "c")], ["k", "attr"])
    dim = scd2_init(s1, ["k"], "2024-01-01 00:00:00")
    dim = scd2_apply(dim, s2, ["k"], "2024-02-01 00:00:00")
    dim = scd2_apply(dim, s3, ["k"], "2024-03-01 00:00:00")
    rows = sorted(
        (r["attr"], r["is_current"], r["valid_to"] is None)
        for r in dim.collect()
    )
    assert rows == [("a", False, False), ("b", False, False), ("c", True, True)]


# ---------------------------------------------------------------------------
# data-quality expectations
# ---------------------------------------------------------------------------


def test_expectation_report_counts_nulls_as_violations(spark):
    from pyspark.sql import functions as F

    from pyspark_weather_forecasting_gsod_spark.operators.quality import (
        expectation_report,
    )

    df = spark.createDataFrame(
        [(1, 5.0), (2, -1.0), (3, None)], ["id", "v"]
    )
    out = {
        r["constraint"]: r["n_violations"]
        for r in expectation_report(
            df, {"v_nonneg": F.col("v") >= 0, "v_not_null": F.col("v").isNotNull()}
        ).collect()
    }
    # NULL >= 0 is unknown → counted as a violation, not silently passed
    assert out == {"v_nonneg": 2, "v_not_null": 1}


def test_unique_and_fk_violation_counters(spark):
    from pyspark_weather_forecasting_gsod_spark.operators.quality import (
        foreign_key_violations,
        unique_key_violations,
    )

    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99), (4, None)], ["id", "fk"]
    )
    parent = spark.createDataFrame([(10,), (20,)], ["pk"])
    u = unique_key_violations(
        spark.createDataFrame([(1,), (1,), (1,), (2,)], ["k"]), ["k"]
    ).first()
    assert u["n_violations"] == 2 and u["n_rows"] == 4
    f = foreign_key_violations(child, "fk", parent, "pk").first()
    # NULL fk is not an orphan; id=3 is
    assert f["n_violations"] == 1 and f["n_rows"] == 4


def test_scd2_snapshot_feed_versions_every_epoch(spark, tmp_path):
    from pyspark.sql import functions as F

    from pyspark_weather_forecasting_gsod_spark.operators.cdc import (
        scd2_snapshot_feed,
    )
    from pyspark_weather_forecasting_gsod_spark.sources.versioned import (
        list_versions,
        read_version,
    )

    d = str(tmp_path / "scd2feed")
    feed = [
        ("2024-01-01 00:00:00", spark.createDataFrame([(1, "a"), (2, "b")], ["k", "attr"])),
        ("2024-02-01 00:00:00", spark.createDataFrame([(1, "a"), (2, "B")], ["k", "attr"])),
        ("2024-03-01 00:00:00", spark.createDataFrame([(2, "B"), (3, "c")], ["k", "attr"])),
    ]
    final = scd2_snapshot_feed(spark, feed, ["k"], d)
    # one committed version per ingested snapshot
    assert list_versions(d) == [1, 2, 3]
    current = {r["k"]: r["attr"] for r in final.filter(F.col("is_current")).collect()}
    assert current == {2: "B", 3: "c"}
    # time travel: the epoch-2 history still shows key 1 open
    v2 = read_version(spark, d, 2)
    k1 = [r for r in v2.collect() if r["k"] == 1 and r["is_current"]]
    assert len(k1) == 1 and k1[0]["attr"] == "a"
    # full history in the final version: key 2 has a closed 'b' epoch
    closed2 = [
        r for r in final.collect() if r["k"] == 2 and not r["is_current"]
    ]
    assert len(closed2) == 1 and closed2[0]["attr"] == "b"


def test_row_hash_complex_types_are_injective(spark):
    """r06 review: cast('string') is not injective for arrays — ["a, b"]
    vs ["a", "b"] rendered identically, so a real update was classified
    unchanged. Complex columns hash via to_json now."""
    from pyspark_weather_forecasting_gsod_spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame([(1, ["a, b"])], "k long, v array<string>")
    new = spark.createDataFrame([(1, ["a", "b"])], "k long, v array<string>")
    got = snapshot_diff(old, new, ["k"]).collect()
    assert len(got) == 1 and got[0]["change_op"] == "U"
    # identical complex values still classify unchanged (no diff rows)
    assert snapshot_diff(old, old, ["k"]).count() == 0


def test_apply_changeset_accepts_include_old_diff(spark):
    """r06 review: an include_old=True changeset used to crash the union
    (the target lacks the __old_* helper columns)."""
    from pyspark_weather_forecasting_gsod_spark.operators.cdc import (
        apply_changeset,
        snapshot_diff,
    )

    old = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, v double")
    new = spark.createDataFrame([(1, 11.0), (3, 30.0)], "k long, v double")
    diff = snapshot_diff(old, new, ["k"], include_old=True)
    got = {(r.k, r.v) for r in apply_changeset(old, diff, ["k"]).collect()}
    assert got == {(1, 11.0), (3, 30.0)}


def test_incremental_agg_update_rejects_diff_without_old_values(spark):
    """r06 review: a diff built without include_old=True used to
    silently corrupt the maintained aggregate (retractions fell back to
    NEW values / NULL); it must raise instead."""
    import pytest

    from pyspark_weather_forecasting_gsod_spark.operators.cdc import (
        incremental_agg_update,
        snapshot_diff,
    )

    old = spark.createDataFrame([(1, "a", 10.0)], "k long, g string, v double")
    new = spark.createDataFrame([(1, "a", 99.0)], "k long, g string, v double")
    agg = spark.createDataFrame([("a", 1, 10.0)], "g string, n_rows long, sv double")
    diff = snapshot_diff(old, new, ["k"])  # include_old omitted
    with pytest.raises(ValueError, match="include_old=True"):
        incremental_agg_update(agg, diff, ["g"], {"sv": "v"})


def test_scd2_init_rejects_duplicate_keys(spark):
    """r06 review: the keys parameter was accepted but never used; it now
    validates entity uniqueness up front."""
    import pytest

    from pyspark_weather_forecasting_gsod_spark.operators.cdc import scd2_init

    snap = spark.createDataFrame([(1, "x"), (1, "y")], "k long, attr string")
    with pytest.raises(ValueError, match="not unique"):
        scd2_init(snap, ["k"], "2024-01-01 00:00:00")


def test_merge_upsert_concurrent_staging_paths_are_private(spark, tmp_path):
    """r06 review: a shared .__staging path let a second writer's
    overwrite delete the first's output mid-write; staging is now
    uuid-private and the swap preserves the table through a crash window
    (old data moves aside before the new rename lands)."""
    import os

    from pyspark_weather_forecasting_gsod_spark.sources.merge import merge_upsert

    target = str(tmp_path / "t")
    merge_upsert(spark, target, spark.createDataFrame([(1, 1.0)], "k long, v double"), ["k"])
    merge_upsert(spark, target, spark.createDataFrame([(1, 2.0), (2, 5.0)], "k long, v double"), ["k"])
    got = {(r.k, r.v) for r in spark.read.parquet(target).collect()}
    assert got == {(1, 2.0), (2, 5.0)}
    # no staging/trash debris left behind
    debris = [n for n in os.listdir(tmp_path) if "__staging" in n or "__trash" in n]
    assert debris == []
