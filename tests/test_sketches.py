"""Mergeable HLL sketch operators (operators/sketches.py)."""

from pyspark.sql import functions as F

from pyspark_weather_forecasting_gsod_spark.operators.sketches import (
    hll_distinct,
    hll_rollup,
)


def test_hll_estimate_within_error_bound_at_dense_cardinality(spark):
    # 200k rows, 50k distinct — far past sparse mode, the estimate is a real
    # HLL approximation and must sit inside ~3x the lgk=12 RSE (±1.6%)
    df = spark.range(0, 200_000).select((F.col("id") % 50_000).alias("v"))
    est = hll_distinct(df, [], "v").collect()[0].n_distinct_est
    assert abs(est - 50_000) / 50_000 < 0.05


def test_hll_rollup_merge_equals_direct_sketch(spark):
    # union-merge of per-group sketches must estimate exactly what a single
    # sketch over the concatenated data estimates (merge is lossless)
    df = spark.range(0, 100_000).select(
        (F.col("id") % 7).alias("g"), (F.col("id") % 20_000).alias("v")
    )
    per_group = hll_distinct(df, ["g"], "v")
    merged = hll_rollup(per_group, []).collect()[0].n_distinct_est
    direct = hll_distinct(df, [], "v").collect()[0].n_distinct_est
    assert merged == direct


def test_hll_exact_in_sparse_mode(spark, sf_dir):
    from pyspark_weather_forecasting_gsod_spark.sources.io import load_table

    ev = load_table(spark, sf_dir, "events")
    est = {
        r.event_type: r.n_distinct_est
        for r in hll_distinct(ev, ["event_type"], "user_id").collect()
    }
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert est == exact  # small cardinalities stay in the exact sparse path
