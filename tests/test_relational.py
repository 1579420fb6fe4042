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


def test_profile_categorical(spark):
    df = spark.createDataFrame([Row(a="x", b="1"), Row(a="y", b="1")])
    row = profile_categorical(df, ["a", "b"]).collect()[0]
    assert row.distinct_a == 2 and row.distinct_b == 1
