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
