"""Physical-plan assertions: the scale properties (pushdown, broadcast,
top-k, shuffle-free map ops) are regression-tested, not just documented."""

import io
import contextlib

import pytest


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def sf001():
    return "/root/testdata/sf0.001"


def test_filter_and_projection_reach_the_scan(spark, sf001):
    from pyspark_weather_forecasting_gsod_spark.plans.queries import QUERIES

    p = _plan(QUERIES["projection_cast"][0](spark, sf001))
    assert "PushedFilters: [IsNotNull(l_discount), IsNotNull(l_returnflag)" in p
    assert "GreaterThan(l_discount,0.05)" in p
    # column pruning: the 11-column table scans only the 5 needed columns
    read = [l for l in p.splitlines() if "ReadSchema" in l][0]
    assert read.count(":") - 1 == 5 or read.count(",") == 4


def test_dim_joins_broadcast(spark, sf001):
    from pyspark_weather_forecasting_gsod_spark.plans.queries import QUERIES

    p = _plan(QUERIES["revenue_by_nation"][0](spark, sf001))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p  # all dim edges broadcast at this scale


def test_impute_join_broadcasts_the_agg_side(spark, sf001):
    from pyspark_weather_forecasting_gsod_spark.plans.queries import QUERIES

    p = _plan(QUERIES["impute_group_median_events"][0](spark, sf001))
    assert "BroadcastHashJoin" in p


def test_top_k_plans_take_ordered_not_full_sort(spark, sf001):
    from pyspark_weather_forecasting_gsod_spark.plans.queries import QUERIES

    p = _plan(QUERIES["top10_orders"][0](spark, sf001))
    assert "TakeOrderedAndProject" in p


def test_simhash_is_shuffle_free(spark, sf001):
    from pyspark_weather_forecasting_gsod_spark.ext.dedup import simhash64
    from pyspark_weather_forecasting_gsod_spark.sources.io import load_table

    docs = load_table(spark, sf001, "documents").select("doc_id", "text")
    def tree_exchanges(p: str) -> int:
        return p.split("\n\n")[0].count("Exchange")  # operator tree only

    # on an already-wide input the widen is a no-op: the only Exchange in
    # the plan is the test's own repartition — the fold adds none
    wide = docs.repartition(spark.sparkContext.defaultParallelism)
    assert tree_exchanges(_plan(simhash64(wide, "doc_id"))) == 1
    # on a narrow scan, exactly ONE round-robin widen (parallelizes the
    # hash fold) and still no aggregation/join exchange
    p = _plan(simhash64(docs, "doc_id"))
    assert tree_exchanges(p) == 1 and "RoundRobinPartitioning" in p


def test_minhash_signatures_are_shuffle_free(spark, sf001):
    from pyspark_weather_forecasting_gsod_spark.ext.dedup import minhash_signatures, shingle_arrays
    from pyspark_weather_forecasting_gsod_spark.sources.io import load_table

    docs = load_table(spark, sf001, "documents")
    sig = minhash_signatures(shingle_arrays(docs, "doc_id"), "doc_id")
    assert "Exchange" not in _plan(sig)


def test_single_pass_census_is_one_aggregate(spark, sf001):
    from pyspark_weather_forecasting_gsod_spark.operators.quality import missing_census
    from pyspark_weather_forecasting_gsod_spark.sources.io import load_table

    ev = load_table(spark, sf001, "events")
    p = _plan(missing_census(ev))
    # exactly one scan node (formatted output prints each node twice: once
    # in the tree, once in the details) — not a scan per column
    assert p.count("Scan parquet  (") == 1


def test_bucketed_tables_join_without_exchange(spark, sf001):
    from pyspark_weather_forecasting_gsod_spark.sources.bucketing import write_bucketed
    from pyspark_weather_forecasting_gsod_spark.sources.io import load_table

    orders = load_table(spark, sf001, "orders")
    li = load_table(spark, sf001, "lineitem")
    write_bucketed(orders, "b_orders", "o_orderkey", num_buckets=4, sort_by="o_orderkey")
    write_bucketed(li, "b_lineitem", "l_orderkey", num_buckets=4, sort_by="l_orderkey")
    a = spark.table("b_orders")
    b = spark.table("b_lineitem")
    # force the merge path (at test scale Catalyst would broadcast instead;
    # at 100 TB neither side broadcasts and this IS the plan)
    joined = a.hint("merge").join(b, a.o_orderkey == b.l_orderkey)
    p = _plan(joined)
    assert "SortMergeJoin" in p
    # co-located buckets: the shuffle was paid once at write time
    assert "Exchange" not in p
    assert joined.count() == li.count()
