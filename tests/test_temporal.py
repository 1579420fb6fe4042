"""As-of join and tolerance range join (operators/temporal.py)."""

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from pyspark_weather_forecasting_gsod_spark.operators.temporal import asof_join, range_join_within


def T(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def _sides(spark):
    left = spark.createDataFrame(
        [
            Row(k=1, lid=10, ts=T(1)),
            Row(k=1, lid=11, ts=T(5)),
            Row(k=1, lid=12, ts=T(9)),
            Row(k=2, lid=20, ts=T(3)),  # key with no right rows
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k=1, rid=100, rts=T(0)),
            Row(k=1, rid=101, rts=T(5)),   # exactly at left 5: at-or-before
            Row(k=1, rid=102, rts=T(7)),
        ]
    )
    return left, right


def test_asof_join_at_or_before(spark):
    left, right = _sides(spark)
    out = asof_join(left, right, key="k", left_ts="ts", right_ts="rts",
                    right_cols=["rid"])
    got = {r.lid: r.rid_asof for r in out.collect()}
    assert got == {10: 100, 11: 101, 12: 102, 20: None}


def test_asof_join_keeps_all_left_rows(spark):
    left, right = _sides(spark)
    out = asof_join(left, right, key="k", left_ts="ts", right_ts="rts",
                    right_cols=["rid"])
    assert out.count() == left.count()


def test_range_join_within_tolerance(spark):
    left, right = _sides(spark)
    out = range_join_within(left, right, key="k", left_ts="ts", right_ts="rts",
                            tolerance_sec=3600, right_cols=["rid"])
    pairs = {(r.lid, r.rid_r) for r in out.collect()}
    # within 1h: lid10(t1)↔rid100(t0); lid11(t5)↔rid101(t5); lid12(t9) has no
    # right within 1h (closest is t7 → 2h); lid11↔rid102 is 2h apart → no
    assert pairs == {(10, 100), (11, 101)}


def test_range_join_bucket_edges(spark):
    # timestamps straddling a bucket boundary must still pair (adjacent
    # bucket candidates)
    left = spark.createDataFrame([Row(k=1, lid=1, ts=T(2, 0))])
    right = spark.createDataFrame([Row(k=1, rid=9, rts=T(1, 59))])
    out = range_join_within(left, right, key="k", left_ts="ts", right_ts="rts",
                            tolerance_sec=120, right_cols=["rid"])
    assert [(r.lid, r.rid_r) for r in out.collect()] == [(1, 9)]


def test_seasonal_anomaly_zero_mean_per_cell_and_null_passthrough(spark):
    import datetime

    from pyspark.sql import functions as F

    from pyspark_weather_forecasting_gsod_spark.operators.temporal import (
        seasonal_anomaly,
    )

    rows = []
    for g in ("s1", "s2"):
        for m in (1, 2):
            for d in range(1, 11):
                v = float(10 * m + (ord(g[-1]) % 3) + d % 3)
                rows.append((g, datetime.datetime(2024, m, d), v))
    rows.append(("s1", datetime.datetime(2024, 1, 20), None))
    df = spark.createDataFrame(rows, ["station", "ts", "temp"])
    out = seasonal_anomaly(df, "ts", "temp", ["station"], season="month")
    # anomalies average to ~0 within every (station, month) cell
    cell = out.filter(F.col("temp").isNotNull()).groupBy(
        "station", F.month("ts").alias("m")
    ).agg(F.avg("anomaly").alias("a"))
    assert all(abs(r["a"]) < 1e-9 for r in cell.collect())
    # NULL value → NULL anomaly, row retained
    nulls = out.filter(F.col("temp").isNull()).collect()
    assert len(nulls) == 1 and nulls[0]["anomaly"] is None
    # unknown season errors
    import pytest as _p

    with _p.raises(ValueError):
        seasonal_anomaly(df, "ts", "temp", ["station"], season="fortnight")


def test_seasonal_anomaly_exact_mean_is_partitioning_invariant(spark):
    """mean_decimals: for fixed-decimal readings the climatology mean is
    the exact rational sum/count, so anomalies are bit-identical under
    any partitioning (plain avg drifts in the last ulp with summation
    order)."""
    from pyspark.sql import functions as F

    from pyspark_weather_forecasting_gsod_spark.operators.temporal import (
        seasonal_anomaly,
    )

    df = spark.range(999).select(
        F.lit("s1").alias("station"),
        F.to_timestamp(
            F.concat(F.lit("2024-01-"), F.lpad((F.col("id") % 28 + 1).cast("string"), 2, "0"))
        ).alias("ts"),
        F.round((F.col("id") % 97) * 0.07, 2).alias("temp"),
    )
    def vals(frame):
        return sorted(
            r["anomaly"]
            for r in seasonal_anomaly(
                frame, "ts", "temp", ["station"], mean_decimals=2
            ).collect()
        )

    a = vals(df.repartition(1))
    b = vals(df.repartition(13))
    assert a == b  # bit-identical, not approximately equal
    # and the mean is exactly sum/count: anomalies sum to ~0 at float scale
    assert abs(sum(a)) < 1e-6


def test_ohlc_bars_null_value_semantics(spark):
    """Defined NULL policy (r05 VERDICT): NULL values are filtered before
    aggregation, so open/close can never be NULL beside non-NULL high/low,
    n_points counts measured rows only, and an all-NULL bucket yields no
    bar at all."""
    from pyspark_weather_forecasting_gsod_spark.operators.temporal import ohlc_bars

    rows = [
        # bucket hour 1: NULLs interleaved at the edges — without the
        # filter, min_by/max_by would pick the NULL open and close
        Row(g="a", ts=T(1, 0), v=None, tid=1),
        Row(g="a", ts=T(1, 10), v=5.0, tid=2),
        Row(g="a", ts=T(1, 20), v=9.0, tid=3),
        Row(g="a", ts=T(1, 30), v=3.0, tid=4),
        Row(g="a", ts=T(1, 40), v=None, tid=5),
        # bucket hour 2: all NULL — must produce NO bar
        Row(g="a", ts=T(2, 0), v=None, tid=6),
        Row(g="a", ts=T(2, 30), v=None, tid=7),
    ]
    df = spark.createDataFrame(rows)
    bars = {
        r["bucket"].hour: r
        for r in ohlc_bars(
            df, ts_col="ts", value_col="v", group_cols=["g"],
            interval="1 hour", tie_col="tid",
        ).collect()
    }
    assert set(bars) == {1}  # the all-NULL bucket vanished
    b = bars[1]
    assert (b["open"], b["high"], b["low"], b["close"]) == (5.0, 9.0, 3.0, 3.0)
    assert b["n_points"] == 3


def test_grouped_trend_ols_exact_line_and_guards(spark):
    """grouped_trend_ols recovers a planted line exactly (integer-exact
    sufficient statistics), drops n<2 and zero-x-variance groups, and
    excludes NULL values."""
    import datetime as dt

    from pyspark.sql import Row

    from pyspark_weather_forecasting_gsod_spark.operators.temporal import (
        grouped_trend_ols,
    )

    origin = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    o_s = int(origin.timestamp())

    def at(hours):
        return origin + dt.timedelta(hours=hours)

    rows = [
        # group 'a': exact line y = 2.5x + 10 at x = 0..3 hours
        *[Row(g="a", ts=at(h), value=10.0 + 2.5 * h) for h in range(4)],
        # group 'b': single point -> dropped
        Row(g="b", ts=at(1), value=5.0),
        # group 'c': two points at the SAME hour -> zero x-variance, dropped
        Row(g="c", ts=at(2), value=1.0),
        Row(g="c", ts=at(2 + 0.1 / 3600), value=2.0),
        # group 'a' NULL value: excluded, line unchanged
        Row(g="a", ts=at(5), value=None),
    ]
    df = spark.createDataFrame(rows)
    out = {r["g"]: r for r in grouped_trend_ols(
        df, ["g"], origin_epoch_s=o_s, unit_seconds=3600
    ).collect()}
    assert set(out) == {"a"}
    assert out["a"]["n_obs"] == 4
    assert out["a"]["slope"] == 2.5
    assert out["a"]["intercept"] == 10.0


def test_property_grouped_trend_ols_matches_numpy(spark):
    """Property (hypothesis): on random integer-grid series (2-dp values,
    hour-grid timestamps, duplicate hours allowed), grouped_trend_ols
    equals numpy's lstsq line fit to within the output rounding."""
    import datetime as dt

    import numpy as np
    from hypothesis import given, settings, strategies as st

    from pyspark_weather_forecasting_gsod_spark.operators.temporal import (
        grouped_trend_ols,
    )

    origin = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    o_s = int(origin.timestamp())
    pt = st.tuples(
        st.integers(min_value=0, max_value=200),            # hour
        st.integers(min_value=-50_000, max_value=50_000),   # cents
    )

    @settings(max_examples=6, deadline=None)
    @given(st.lists(pt, min_size=2, max_size=30))
    def check(points):
        rows = [
            (1, origin + dt.timedelta(hours=h), cents / 100.0)
            for h, cents in points
        ]
        df = spark.createDataFrame(rows, "g long, ts timestamp, value double")
        out = grouped_trend_ols(df, ["g"], origin_epoch_s=o_s).collect()
        xs = np.array([h for h, _ in points], dtype=float)
        ys = np.array([c / 100.0 for _, c in points], dtype=float)
        if len(set(xs)) < 2:
            assert out == []  # zero x-variance -> dropped
            return
        a = np.vstack([xs, np.ones_like(xs)]).T
        slope, intercept = np.linalg.lstsq(a, ys, rcond=None)[0]
        assert len(out) == 1 and out[0]["n_obs"] == len(points)
        assert abs(out[0]["slope"] - slope) < 1e-6, (points, out[0]["slope"], slope)
        assert abs(out[0]["intercept"] - intercept) < 5e-5

    check()


def test_asof_join_null_right_ts_never_matches(spark):
    """r08 review: a right row with NULL right_ts sorted NULLS-FIRST and
    its payload carried forward as a false match for left rows that
    should match nothing."""
    from pyspark_weather_forecasting_gsod_spark.operators.temporal import asof_join

    left = spark.createDataFrame([("k", 10), ("k", 1)], "key string, lt long")
    right = spark.createDataFrame(
        [("k", None, "ghost"), ("k", 5, "real")], "key string, rt long, p string"
    )
    out = {
        r["lt"]: r["p_asof"]
        for r in asof_join(left, right, "key", "lt", "rt", ["p"]).collect()
    }
    # lt=1 precedes every real right row -> NULL, never 'ghost'
    assert out == {1: None, 10: "real"}


def test_gap_fill_spine_step_keeps_off_stride_observations(spark):
    """r08 review: with step>1 the left join dropped observed rows whose
    tick is off the min-anchored stride (including the group max) —
    densification must never LOSE observations."""
    from pyspark_weather_forecasting_gsod_spark.operators.temporal import (
        gap_fill_spine,
    )

    df = spark.createDataFrame(
        [("g", 0, 1.0), ("g", 3, 2.0), ("g", 5, 3.0)], "g string, t long, v double"
    )
    got = {
        r["t"]: r["v"] for r in gap_fill_spine(df, "g", "t", ["v"], step=2).collect()
    }
    # spine ticks 0/2/4 plus the observed off-stride 3 and 5
    assert got == {0: 1.0, 2: None, 3: 2.0, 4: None, 5: 3.0}
    # step=1 unchanged: observed ticks are all on the spine
    got1 = {
        r["t"]: r["v"] for r in gap_fill_spine(df, "g", "t", ["v"]).collect()
    }
    assert got1 == {0: 1.0, 1: None, 2: None, 3: 2.0, 4: None, 5: 3.0}


def test_gap_fill_spine_null_group_merges_onto_spine(spark):
    """r09/ADVICE #2: groupBy keeps NULL as a real group, so the spine has
    a NULL-group row — a null-unsafe full join would emit BOTH the spine
    row (v NULL) and the unmatched observed row, breaking the
    one-row-per-(group, tick) contract. The null-safe join merges them."""
    from pyspark_weather_forecasting_gsod_spark.operators.temporal import (
        gap_fill_spine,
    )

    df = spark.createDataFrame(
        [(None, 0, 1.0), (None, 2, 3.0), ("g", 0, 9.0)],
        "g string, t long, v double",
    )
    rows = gap_fill_spine(df, "g", "t", ["v"]).collect()
    got = {(r["g"], r["t"]): r["v"] for r in rows}
    # exactly one row per (group, tick): NULL group densified 0..2
    assert len(rows) == len(got) == 4
    assert got == {(None, 0): 1.0, (None, 1): None, (None, 2): 3.0, ("g", 0): 9.0}


def test_ohlc_bars_null_ts_rows_excluded(spark):
    """r08 review: NULL-ts rows escaped the NULL policy into a spurious
    NULL-bucket bar."""
    import datetime as dt

    from pyspark_weather_forecasting_gsod_spark.operators.temporal import ohlc_bars

    t0 = dt.datetime(2024, 1, 1, 0, 30)
    df = spark.createDataFrame(
        [(t0, 5.0, 1), (None, 99.0, 2)], "ts timestamp, v double, i int"
    )
    bars = ohlc_bars(df, "ts", "v", [], interval="1 hour", tie_col="i").collect()
    assert len(bars) == 1 and bars[0]["n_points"] == 1 and bars[0]["high"] == 5.0


def test_range_join_within_quotes_nonidentifier_columns(spark):
    """r08 review: raw f-string interpolation into F.expr broke for any
    column name that is not a plain identifier."""
    from pyspark_weather_forecasting_gsod_spark.operators.temporal import (
        range_join_within,
    )

    left = spark.createDataFrame(
        [("k", 1_000_000)], "key string, `left ts` long"
    ).withColumn("left ts", F.timestamp_micros("left ts"))
    right = spark.createDataFrame(
        [("k", 1_500_000, "x")], "key string, `right-ts` long, p string"
    ).withColumn("right-ts", F.timestamp_micros("right-ts"))
    out = range_join_within(
        left, right, "key", "left ts", "right-ts", tolerance_sec=1,
        right_cols=["p"],
    )
    assert out.count() == 1
