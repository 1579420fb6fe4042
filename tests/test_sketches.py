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


def test_cms_never_underestimates_and_detects_collisions(spark, sf_dir):
    from pyspark.sql import functions as F

    from pyspark_weather_forecasting_gsod_spark.operators.sketches import (
        cms_estimate,
        cms_table,
    )

    tok = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.explode(F.split(F.trim("text"), r"\s+")).alias("token"))
    )
    cms = cms_table(tok, "token", depth=3, width=16)
    exact = tok.groupBy("token").agg(F.count(F.lit(1)).alias("exact"))
    est = cms_estimate(cms, exact.select("token"), "token", depth=3, width=16)
    rows = exact.join(est, "token").collect()
    assert rows, "empty corpus"
    # CMS structural guarantee: estimate >= exact, always
    assert all(r["cms_count"] >= r["exact"] for r in rows)
    # width 16 < vocab: at least one collision must be visible
    assert any(r["cms_count"] > r["exact"] for r in rows)


def test_cms_is_mergeable_cellwise(spark, sf_dir):
    from pyspark.sql import functions as F

    from pyspark_weather_forecasting_gsod_spark.operators.sketches import cms_table

    tok = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("token"))
    )
    whole = cms_table(tok, "token", depth=3, width=16)
    lo = cms_table(tok.filter(F.col("doc_id") % 2 == 0), "token", depth=3, width=16)
    hi = cms_table(tok.filter(F.col("doc_id") % 2 == 1), "token", depth=3, width=16)
    merged = (
        lo.unionByName(hi)
        .groupBy("r", "bucket")
        .agg(F.sum("cell_count").alias("cell_count"))
    )
    a = {(r["r"], r["bucket"]): r["cell_count"] for r in whole.collect()}
    b = {(r["r"], r["bucket"]): r["cell_count"] for r in merged.collect()}
    assert a == b


def test_cms_absent_key_with_empty_cell_estimates_zero(spark):
    """A key the stream never contained estimates 0 whenever any of its
    depth cells is empty — the left join's NULL cell must count as 0, not
    be skipped by min (else absent keys inherit collision mass)."""
    from pyspark.sql import functions as F

    from pyspark_weather_forecasting_gsod_spark.operators.sketches import (
        cms_estimate,
        cms_table,
    )

    stream = spark.createDataFrame([("seen",)] * 7, ["k"])
    cms = cms_table(stream, "k", depth=3, width=4)
    probes = spark.createDataFrame(
        [(f"absent{i}",) for i in range(40)] + [("seen",)], ["k"]
    )
    est = {
        r["k"]: r["cms_count"]
        for r in cms_estimate(cms, probes, "k", depth=3, width=4).collect()
    }
    assert est["seen"] == 7
    # with one key in a width-4/depth-3 sketch, 9 of 12 cells are empty:
    # most absent keys must hit an empty cell and estimate exactly 0
    zeros = sum(1 for k, v in est.items() if k != "seen" and v == 0)
    assert zeros > 0
    assert all(v in (0, 7) for k, v in est.items() if k != "seen")


def test_cms_join_estimate_never_underestimates(spark):
    from pyspark.sql import functions as F

    from pyspark_weather_forecasting_gsod_spark.operators.sketches import (
        cms_join_size_estimate,
        cms_table,
    )

    a = spark.range(500).select((F.col("id") % 100).alias("k"))
    b = spark.range(800).select((F.col("id") % 120).alias("k"))
    ca = cms_table(a, "k", depth=3, width=4096)
    cb = cms_table(b, "k", depth=3, width=4096)
    est = cms_join_size_estimate(ca, cb).first()["join_size_est"]
    exact = a.join(b, "k").count()
    assert est >= exact
    # width >> keys: collisions are rare, so the bound is tight here
    assert est <= exact * 1.2


def test_cms_join_estimate_disjoint_keys_is_zero_not_null(spark):
    """A hash row with no overlapping cells has true inner product 0; the
    r04 ADVICE finding: the inner-join formulation dropped such rows,
    returning NULL (no overlap anywhere) or an overestimate. Disjoint key
    sets at width >> keys must estimate exactly 0."""
    from pyspark.sql import functions as F

    from pyspark_weather_forecasting_gsod_spark.operators.sketches import (
        cms_join_size_estimate,
        cms_table,
    )

    a = spark.range(20).select(F.col("id").alias("k"))
    b = spark.range(20).select((F.col("id") + 100_000).alias("k"))
    ca = cms_table(a, "k", depth=3, width=65536)
    cb = cms_table(b, "k", depth=3, width=65536)
    est = cms_join_size_estimate(ca, cb).first()["join_size_est"]
    assert est == 0  # not NULL, not an overestimate from surviving rows


def test_cms_weight_accepts_zero_scale_decimal_rejects_fractional(spark):
    """r06 advice: decimal(p,0) weights are exactly integral — the long
    cast cannot truncate them — so they pass the integral-weight guard;
    fractional dtypes still raise."""
    import pytest
    from pyspark.sql import functions as F

    from pyspark_weather_forecasting_gsod_spark.operators.sketches import cms_table

    df = spark.createDataFrame([("a", 2), ("a", 3), ("b", 5)], ["k", "w"])
    dec = df.select("k", F.col("w").cast("decimal(18,0)").alias("w"))
    got = cms_table(dec, "k", depth=2, width=8, weight_col="w")
    assert got.agg(F.sum("cell_count")).collect()[0][0] == 2 * 10
    frac = df.select("k", F.col("w").cast("decimal(18,2)").alias("w"))
    with pytest.raises(ValueError, match="integral"):
        cms_table(frac, "k", depth=2, width=8, weight_col="w")
    dbl = df.select("k", F.col("w").cast("double").alias("w"))
    with pytest.raises(ValueError, match="integral"):
        cms_table(dbl, "k", depth=2, width=8, weight_col="w")
