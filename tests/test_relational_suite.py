"""Invariant tests for the round-4 relational suite and LLM extras.

Value correctness is the driver's DuckDB oracle (every query here is
oracle-declared); these tests pin the SEMANTIC invariants a hash can't
express — int8 range claims, probability bounds, monotonic top-k order —
and the plan properties that make the queries scale.
"""

import pytest
from pyspark.sql import functions as F

from pyspark_weather_forecasting_gsod_spark.plans import queries


@pytest.fixture(scope="module")
def q():
    return queries()


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_embedding_quantize_stays_in_int8_range(spark, sf_dir, q):
    rows = q["embedding_quantize"](spark, sf_dir).collect()
    assert rows, "quantizer dropped every vector"
    for r in rows:
        assert r.q_max_abs <= 127, f"vec {r.vec_id} escapes int8: {r.q_max_abs}"
        assert r.mean_abs_err >= 0.0
        assert r.scale_r > 0.0


def test_embedding_quantize_reconstruction_error_is_bounded_by_half_step(
    spark, sf_dir, q
):
    # symmetric rounding guarantees |x - q/scale| <= 0.5/scale per element
    rows = q["embedding_quantize"](spark, sf_dir).collect()
    for r in rows:
        assert r.mean_abs_err <= 0.5 / r.scale_r * 1.0001 + 1e-9


def test_embedding_quantize_plan_is_shuffle_free(spark, sf_dir, q):
    plan = _plan(q["embedding_quantize"](spark, sf_dir))
    assert "Exchange" not in plan
    assert "Generate" not in plan  # no explode — per-row array expressions


def test_contamination_check_excludes_benchmark_and_bounds_frac(spark, sf_dir, q):
    rows = q["contamination_check"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.source not in ("src0", "src1"), "benchmark doc leaked into output"
        assert 0 <= r.n_contaminated <= r.n_spans
        assert 0.0 <= r.contamination_frac <= 1.0


def test_contamination_check_flags_known_duplicate_spans(spark, sf_dir, q):
    # the corpus generator plants cross-doc duplication (dup_span_stats
    # oracle proves it); some of it must cross the benchmark boundary at
    # sf0.01 — at the tiny smoke SF just assert the query runs end-to-end
    # and the aggregate contamination mass is non-negative.
    df = q["contamination_check"](spark, sf_dir)
    total = df.agg(F.sum("n_contaminated").alias("s")).collect()[0].s
    assert total >= 0


def test_bm25_scores_positive_and_sorted(spark, sf_dir, q):
    rows = q["bm25_topk"](spark, sf_dir).collect()
    assert rows
    scores = [r.bm25 for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert r.bm25 > 0
        assert 1 <= r.n_terms_hit <= 3


def test_q15_top_supplier_is_the_argmax(spark, sf_dir, q):
    from pyspark_weather_forecasting_gsod_spark.sources.io import load_table

    rows = q["q15_top_supplier"](spark, sf_dir).collect()
    assert rows
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    best = (
        li.groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("rev")
        )
        .agg(F.max("rev").alias("m"))
        .collect()[0]
        .m
    )
    for r in rows:
        assert r.total_revenue == best


def test_q21_matches_catalyst_own_subquery_decorrelation(spark, sf_dir, q):
    """The DataFrame semi/anti-join translation must agree with Catalyst's
    OWN decorrelation of the EXISTS/NOT-EXISTS SQL text (the same text the
    DuckDB oracle runs) — two independent planners, one answer."""
    from pyspark_weather_forecasting_gsod_spark.plans import oracle_sql
    from pyspark_weather_forecasting_gsod_spark.sources.io import load_table

    for t in ("lineitem", "supplier", "orders"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    via_sql = {
        (r.s_name, r.numwait)
        for r in spark.sql(oracle_sql()["q21_last_shipper"]).collect()
    }
    via_df = {
        (r.s_name, r.numwait) for r in q["q21_last_shipper"](spark, sf_dir).collect()
    }
    assert via_df == via_sql
    assert all(n >= 1 for _, n in via_df)


def test_q11_threshold_filters_strictly(spark, sf_dir, q):
    rows = q["q11_important_parts"](spark, sf_dir).collect()
    if rows:  # sf0.001 may produce few parts; invariant: sorted desc
        vals = [r.part_value for r in rows]
        assert vals == sorted(vals, reverse=True)


def test_temperature_mix_downweights_high_resource_langs(spark, sf_dir, q):
    """α<1 makes keep-rate strictly decreasing in corpus share: the
    highest-resource language must get the lowest rate, and realized kept
    counts must stay within the deterministic bucket rule's reach."""
    rows = q["temperature_mix_sample"](spark, sf_dir).collect()
    assert rows
    by_n = sorted(rows, key=lambda r: r.n_total)
    rates = [r.rate_r for r in by_n]
    # monotone non-increasing in n_total (ties allowed when capped at 1.0)
    assert all(a >= b for a, b in zip(rates, rates[1:])), rates
    for r in rows:
        assert 0.0 <= r.rate_r <= 1.0
        assert 0 <= r.n_kept <= r.n_total
