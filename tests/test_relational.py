"""Top-k / mode primitives (reference A6/O1, ipynb:642-643)."""

from pyspark.sql import Row

from pyspark_weather_forecasting_gsod_spark.operators.profile import profile_categorical, profile_numeric
from pyspark_weather_forecasting_gsod_spark.operators.relational import mode_top1, top_k


def test_top_k_desc_with_tie_break(spark):
    df = spark.createDataFrame(
        [Row(k="x", n=5), Row(k="y", n=5), Row(k="z", n=3)]
    )
    got = [(r.k, r.n) for r in top_k(df, 2, by="n", tie_break="k").collect()]
    assert got == [("x", 5), ("y", 5)]


def test_mode_deterministic_tie_break(spark):
    # b and a both appear twice: tie breaks to the smaller value, every run
    df = spark.createDataFrame([Row(c=v) for v in ["b", "a", "b", "a", "z"]])
    got = mode_top1(df, "c").collect()
    assert [(r.c, r.cnt) for r in got] == [("a", 2)]


def test_profile_numeric_single_pass(spark):
    df = spark.createDataFrame([Row(v=1.0), Row(v=2.0), Row(v=3.0), Row(v=None)])
    row = profile_numeric(df, ["v"]).collect()[0]
    assert row.n_rows == 4
    assert row.mean_v == 2.0
    assert row.median_v == 2.0
    assert row.min_v == 1.0 and row.max_v == 3.0
    assert row.distinct_v == 3


def test_profile_numeric_scalable_median_path_matches_single_pass(spark):
    """Above the row threshold, profile_numeric swaps F.median for the
    bounded-memory scalable_exact_median — identical values, identical
    schema/column order, so the switch is invisible to consumers (and to
    the profile_lineitem oracle)."""
    from pyspark_weather_forecasting_gsod_spark.sources.io import load_table

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    cols = ["l_quantity", "l_extendedprice"]
    single = profile_numeric(li, cols, scalable_median_over=None).collect()[0]
    scal = profile_numeric(li, cols, scalable_median_over=10).collect()[0]
    s, c = single.asDict(), scal.asDict()
    assert list(s) == list(c)  # identical schema and column order
    for k in s:
        if k.startswith(("median_", "min_", "max_", "n_rows", "distinct_")):
            assert s[k] == c[k], k  # medians (and exact stats) match exactly
        else:
            # mean/stddev: dropping the median columns changes the physical
            # agg, so partial-sum order (and the last float bits) may differ
            assert abs(s[k] - c[k]) <= 1e-9 * max(abs(s[k]), 1.0), k


def test_profile_categorical(spark):
    df = spark.createDataFrame([Row(a="x", b="1"), Row(a="y", b="1")])
    row = profile_categorical(df, ["a", "b"]).collect()[0]
    assert row.distinct_a == 2 and row.distinct_b == 1


def test_scalable_exact_median_matches_builtin(spark):
    from pyspark.sql import functions as F

    from pyspark_weather_forecasting_gsod_spark.operators.quantiles import scalable_exact_median
    from pyspark_weather_forecasting_gsod_spark.sources.io import load_table

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    exact = li.agg(F.median("l_extendedprice")).first()[0]
    # force the iterative narrowing path with a tiny max_exact
    got = scalable_exact_median(li, "l_extendedprice", eps=0.05, max_exact=500)
    assert got == exact


def test_scalable_exact_median_edge_cases(spark):
    from pyspark.sql import Row

    from pyspark_weather_forecasting_gsod_spark.operators.quantiles import scalable_exact_median

    assert scalable_exact_median(
        spark.createDataFrame([Row(v=None)], "v double"), "v"
    ) is None
    assert scalable_exact_median(
        spark.createDataFrame([Row(v=3.0), Row(v=1.0)], "v double"), "v"
    ) == 2.0
    assert scalable_exact_median(
        spark.createDataFrame([Row(v=float(i)) for i in range(101)], "v double"), "v"
    ) == 50.0


def test_keep_latest_deterministic_winner(spark):
    from pyspark_weather_forecasting_gsod_spark.operators.relational import keep_latest

    df = spark.createDataFrame(
        [
            Row(k="a", ts=1, uid=10, v=1.0),
            Row(k="a", ts=3, uid=11, v=2.0),
            Row(k="a", ts=3, uid=12, v=3.0),  # ts tie → larger uid wins
            Row(k="b", ts=5, uid=13, v=4.0),
        ]
    )
    got = {
        (r.k, r.uid, r.v)
        for r in keep_latest(df, keys=["k"], order_by=["ts", "uid"]).collect()
    }
    assert got == {("a", 12, 3.0), ("b", 13, 4.0)}
    # non-key columns and schema pass through untouched (minus the helper)
    assert keep_latest(df, ["k"], ["ts", "uid"]).columns == ["k", "ts", "uid", "v"]


def test_hash_split_deterministic_and_stable(spark):
    from pyspark_weather_forecasting_gsod_spark.operators.sampling import hash_split

    df = spark.range(0, 1000).withColumnRenamed("id", "k")
    a = {(r.k, r.split) for r in hash_split(df, "k").collect()}
    b = {(r.k, r.split) for r in hash_split(df, "k").collect()}
    assert a == b  # reproducible
    # stable under growth: the first 1000 rows keep their assignment
    grown = spark.range(0, 2000).withColumnRenamed("id", "k")
    g = {(r.k, r.split) for r in hash_split(grown, "k").collect() if r.k < 1000}
    assert g == a
    frac = sum(1 for _, s in a if s == "train") / len(a)
    assert 0.7 < frac < 0.9  # ~80% within hash-uniformity tolerance


def test_stratified_sample_seeded_and_sized(spark):
    from pyspark.sql import Row
    from pyspark_weather_forecasting_gsod_spark.operators.sampling import stratified_sample

    rows = [Row(g="a", i=i) for i in range(1000)] + [Row(g="b", i=i) for i in range(100)]
    df = spark.createDataFrame(rows)
    s1 = stratified_sample(df, "g", {"a": 0.1, "b": 0.5}, seed=7).collect()
    s2 = stratified_sample(df, "g", {"a": 0.1, "b": 0.5}, seed=7).collect()
    assert {(r.g, r.i) for r in s1} == {(r.g, r.i) for r in s2}
    na = sum(1 for r in s1 if r.g == "a")
    nb = sum(1 for r in s1 if r.g == "b")
    assert 50 <= na <= 160 and 30 <= nb <= 70


def test_keep_latest_rejects_sentinel_column_collision(spark):
    import pytest

    from pyspark_weather_forecasting_gsod_spark.operators.relational import keep_latest

    df = spark.createDataFrame([Row(k=1, ts=1, __kl_rn=9)])
    with pytest.raises(ValueError, match="__kl_rn"):
        keep_latest(df, keys=["k"], order_by=["ts"])


def test_cap_per_group_hash_and_quality_modes(spark):
    from pyspark_weather_forecasting_gsod_spark.operators.sampling import cap_per_group

    df = spark.createDataFrame(
        [Row(id=i, g="a" if i % 2 == 0 else "b", score=float(i)) for i in range(40)]
    )
    capped = cap_per_group(df, "g", 5, id_col="id")
    per_g = {r.g for r in capped.collect()}
    assert capped.count() == 10 and per_g == {"a", "b"}
    # deterministic: identical subset on rerun
    again = cap_per_group(df, "g", 5, id_col="id")
    assert sorted(r.id for r in capped.collect()) == sorted(r.id for r in again.collect())
    # quality mode keeps the top-n by score
    best = cap_per_group(df, "g", 3, id_col="id", keep="score")
    assert sorted(r.id for r in best.filter("g = 'a'").collect()) == [34, 36, 38]

    import pytest
    from pyspark.sql import functions as F

    with pytest.raises(ValueError, match="__cap_rn"):
        cap_per_group(df.withColumn("__cap_rn", F.lit(1)), "g", 5, id_col="id")
