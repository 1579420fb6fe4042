"""Extended window vocabulary + skew utilities + fixed-schedule imputer."""

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from pyspark_weather_forecasting_gsod_spark.operators.impute import proximity_impute_fixed_schedule
from pyspark_weather_forecasting_gsod_spark.operators.skew import salted_join, skew_profile
from pyspark_weather_forecasting_gsod_spark.operators.windows import (
    calendar_range_avg,
    lag_delta,
    lead_labels,
    ranked,
)


def D(y, m, d):
    return dt.date(y, m, d)


def test_ranked_all_four_functions(spark):
    df = spark.createDataFrame(
        [Row(k="a", i=1, v=30.0), Row(k="a", i=2, v=30.0), Row(k="a", i=3, v=10.0)]
    )
    # order by value only: rows 1 and 2 tie → rank/dense_rank collapse,
    # row_number stays unique (declared queries add a tie-break key, which
    # makes the ordering — and therefore rank — fully deterministic)
    out = {r.i: (r.rnk, r.drnk) for r in
           ranked(df, "k", [F.col("v").desc()]).collect()}
    assert out[1] == (1, 1) and out[2] == (1, 1)
    assert out[3] == (3, 2)  # rank skips, dense_rank doesn't
    rns = sorted(r.rn for r in ranked(df, "k", [F.col("v").desc()]).collect())
    assert rns == [1, 2, 3]


def test_lag_delta_first_row_null(spark):
    df = spark.createDataFrame(
        [Row(k="a", t=1, v=10.0), Row(k="a", t=2, v=13.0), Row(k="a", t=3, v=11.0)]
    )
    out = {r.t: r.delta for r in lag_delta(df, "v", "k", ["t"]).collect()}
    assert out[1] is None and out[2] == 3.0 and out[3] == -2.0


def test_calendar_range_avg_respects_gaps(spark):
    # days 1, 2, 10: a ±2-day RANGE frame around day 10 must NOT see days
    # 1-2 (a ROWS frame would — the reference's caveat)
    df = spark.createDataFrame(
        [
            Row(k="a", date=D(2023, 1, 1), v=10.0),
            Row(k="a", date=D(2023, 1, 2), v=20.0),
            Row(k="a", date=D(2023, 1, 10), v=99.0),
        ]
    )
    out = {r.date.day: r.m for r in
           calendar_range_avg(df, "v", "k", "date", 2, 2, "m").collect()}
    assert out[1] == 15.0 and out[2] == 15.0
    assert out[10] == 99.0  # isolated by the calendar gap


def test_lead_labels_max_gap_seconds(spark):
    T = dt.datetime
    df = spark.createDataFrame(
        [
            Row(k=1, ts=T(2024, 1, 1, 0, 0), v=1.0),
            Row(k=1, ts=T(2024, 1, 1, 0, 30), v=2.0),   # 30 min gap → ok
            Row(k=1, ts=T(2024, 1, 1, 3, 0), v=3.0),    # 2.5 h gap → dropped
        ]
    )
    out = lead_labels(df, "k", "ts", {"v": "nv"}, max_gap_seconds=3600)
    got = {r.ts.minute + r.ts.hour * 60: r.nv for r in out.collect()}
    assert got == {0: 2.0}


def test_fixed_schedule_uses_previous_pass_fills(spark):
    # row 0's ±1 frame is all-null on pass 1; pass 2 (±2) must see row 2's
    # ORIGINAL value and row 1's PASS-1 FILL, exactly like the reference's
    # iterative column rebinding.
    df = spark.createDataFrame(
        [
            Row(k="a", t=1, v=None),
            Row(k="a", t=2, v=None),
            Row(k="a", t=3, v=12.0),
            Row(k="a", t=4, v=24.0),
        ]
    )
    out = {r.t: r.v for r in
           proximity_impute_fixed_schedule(df, "v", "k", ["t"], schedule=(1, 2)).collect()}
    assert out[2] == 12.0          # pass 1: avg of {None, None, 12}
    assert out[1] == (12.0 + 12.0) / 2  # pass 2: avg of {pass1-fill 12, 12}
    assert out[3] == 12.0 and out[4] == 24.0


def test_salted_join_equals_plain_join(spark, sf_dir):
    from pyspark_weather_forecasting_gsod_spark.sources.io import load_table

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    plain = orders.join(cust, orders.o_custkey == cust.c_custkey).groupBy(
        "c_mktsegment"
    ).count()
    salted = salted_join(
        orders.withColumnRenamed("o_custkey", "c_custkey"), cust, on="c_custkey",
        num_salts=8,
    ).groupBy("c_mktsegment").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_skew_profile_orders_heaviest_first(spark):
    df = spark.createDataFrame(
        [Row(k="hot")] * 5 + [Row(k="warm")] * 2 + [Row(k="cold")]
    )
    rows = skew_profile(df, "k").collect()
    assert [r.k for r in rows] == ["hot", "warm", "cold"]
    assert rows[0].n_rows == 5


def test_ewma_matches_pandas_adjusted(spark):
    """With lookback >= group size, ewma() must equal pandas
    ewm(adjust=True).mean() exactly (same closed form)."""
    import pandas as pd

    from pyspark_weather_forecasting_gsod_spark.operators.windows import ewma

    vals = [3.0, 1.0, 4.0, 1.5, 9.2, 2.6, 5.3]
    df = spark.createDataFrame(
        [(i, "g", float(v)) for i, v in enumerate(vals)], ["i", "g", "v"]
    )
    got = {
        r["i"]: r["ewma"]
        for r in ewma(
            df, "v", group_by="g", order_by="i", alpha=0.3, lookback=100, digits=9
        ).collect()
    }
    want = pd.Series(vals).ewm(alpha=0.3, adjust=True).mean()
    for i, w in enumerate(want):
        assert abs(got[i] - round(w, 9)) < 1e-9, (i, got[i], w)


def test_rolling_frame_median_and_guard(spark):
    """rolling_frame_median (extracted operator, r05 VERDICT): exact
    interpolated frame median, plus the shared max_group_rows pre-flight."""
    import pytest

    from pyspark_weather_forecasting_gsod_spark.operators.windows import (
        rolling_frame_median,
    )

    rows = [Row(g="a", seq=i, v=float(x)) for i, x in enumerate([1, 9, 3, 7, 5])]
    df = spark.createDataFrame(rows)
    got = {
        r.seq: r.rolling_median
        for r in rolling_frame_median(
            df, "v", group_by="g", order_by="seq", before=1, after=1
        ).collect()
    }
    # frames: [1,9] [1,9,3] [9,3,7] [3,7,5] [7,5]
    assert got == {0: 5.0, 1: 3.0, 2: 7.0, 3: 5.0, 4: 6.0}
    with pytest.raises(ValueError, match="rolling_frame_median"):
        rolling_frame_median(
            df, "v", group_by="g", order_by="seq", max_group_rows=3
        )


def test_ewma_max_group_rows_guard(spark):
    import pytest

    from pyspark_weather_forecasting_gsod_spark.operators.windows import ewma

    df = spark.createDataFrame(
        [Row(g="a", seq=i, v=float(i)) for i in range(20)]
    )
    with pytest.raises(ValueError, match="ewma"):
        ewma(df, "v", group_by="g", order_by="seq", max_group_rows=5)
    assert "ewma" in ewma(df, "v", group_by="g", order_by="seq").columns


def test_rolling_frame_median_all_null_frame_yields_null(spark):
    """r06 review fix: a frame whose values are ALL NULL used to compute
    element_at(arr, 0) and die with INVALID_INDEX_OF_ZERO; it must yield
    NULL. Mixed frames still skip NULLs like any SQL aggregate."""
    from pyspark_weather_forecasting_gsod_spark.operators.windows import (
        rolling_frame_median,
    )

    vals = [None, None, None, None, 8.0, 2.0]
    df = spark.createDataFrame(
        [Row(g="a", seq=i, v=v) for i, v in enumerate(vals)]
    )
    got = {
        r.seq: r.rolling_median
        for r in rolling_frame_median(
            df, "v", group_by="g", order_by="seq", before=1, after=1
        ).collect()
    }
    # frames: [_,_] [_,_,_] [_,_,_] [_,_,8] [_,8,2] [8,2]
    assert got[0] is None and got[1] is None and got[2] is None
    assert got[3] == 8.0 and got[4] == 5.0 and got[5] == 5.0


def test_ewma_null_values_skip_frame_and_all_null_yields_null(spark):
    """Pin ewma's NULL semantics (companion to the rolling-median r06
    fix): NULL values never enter the collect_list frame, and a frame
    with no non-NULL values yields NULL — no crash, no zero."""
    from pyspark_weather_forecasting_gsod_spark.operators.windows import ewma

    vals = [None, None, 4.0, None, 8.0]
    df = spark.createDataFrame(
        [Row(g="a", seq=i, v=v) for i, v in enumerate(vals)]
    )
    got = {
        r.seq: r.ewma
        for r in ewma(
            df, "v", group_by="g", order_by="seq", alpha=0.5, lookback=2
        ).collect()
    }
    # frames (lookback 2): [_,_]->NULL, [_,_]->NULL, [_,4]->4.0,
    # [4,_]->4.0 (only non-null survives), [_,8]->8.0
    assert got[0] is None and got[1] is None
    assert got[2] == 4.0 and got[3] == 4.0 and got[4] == 8.0
