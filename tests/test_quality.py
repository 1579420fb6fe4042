"""C1 normalize_sentinels + C9 missing_census (reference ipynb:239-247, 330)."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from pyspark_weather_forecasting_gsod_spark.operators.quality import missing_census, normalize_sentinels


def _df(spark):
    return spark.createDataFrame(
        [
            Row(stn="a", temp=9999.9, prcp=99.99, visib=10.0),
            Row(stn="a", temp=50.0, prcp=0.0, visib=999.9),
            Row(stn="b", temp=60.0, prcp=99.99, visib=5.0),
        ]
    )


def test_literal_sentinels_become_null(spark):
    df = _df(spark)
    out = normalize_sentinels(df, {"temp": 9999.9, "prcp": 99.99, "visib": 999.9})
    got = {(r.stn, r.temp, r.prcp, r.visib) for r in out.collect()}
    assert got == {
        ("a", None, None, 10.0),
        ("a", 50.0, 0.0, None),
        ("b", 60.0, None, 5.0),
    }


def test_predicate_sentinels(spark):
    df = _df(spark)
    out = normalize_sentinels(df, {"temp": lambda c: c > 1000})
    assert {r.temp for r in out.collect()} == {None, 50.0, 60.0}


def test_non_sentinel_columns_untouched(spark):
    df = _df(spark)
    out = normalize_sentinels(df, {"temp": 9999.9})
    assert out.columns == df.columns
    assert out.filter(F.col("stn").isNull()).count() == 0


def test_missing_census_single_row(spark):
    df = normalize_sentinels(_df(spark), {"temp": 9999.9, "prcp": 99.99, "visib": 999.9})
    row = missing_census(df).collect()[0]
    assert row.n_rows == 3
    assert row.null_temp == 1
    assert row.null_prcp == 2
    assert row.null_visib == 1
    assert row.null_stn == 0


def test_mad_outlier_flags_robust_to_corruption(spark):
    from pyspark.sql import Row

    from pyspark_weather_forecasting_gsod_spark.operators.quality import (
        mad_outlier_flags,
    )

    # station a: tight cluster around 10 plus one near-sentinel typo (9998.9)
    # that sentinel normalization (== 9999.9) would miss
    rows = [Row(stn="a", v=float(v)) for v in (9.0, 10.0, 10.0, 10.0, 11.0, 9998.9)]
    rows += [Row(stn="a", v=None)]           # NULL never flagged
    rows += [Row(stn="b", v=5.0), Row(stn="b", v=5.0), Row(stn="b", v=5.0)]  # MAD=0
    out = mad_outlier_flags(spark.createDataFrame(rows), "v", "stn", k=3.0)
    got = [(r.stn, r.v, r.is_outlier) for r in out.collect()]
    assert ("a", 9998.9, 1) in got          # corruption caught
    assert ("a", 10.0, 0) in got            # inliers pass
    assert ("a", None, None) in got         # three-valued logic preserved
    assert ("b", 5.0, 0) in got             # constant group: no deviation, no flag


def test_grouped_linear_trend_matches_numpy(spark):
    import numpy as np
    import pytest
    from pyspark.sql import functions as F

    from pyspark_weather_forecasting_gsod_spark.operators.profile import (
        grouped_linear_trend,
    )

    rows = []
    rng = np.random.RandomState(7)
    truth = {"a": (2.5, 1.0), "b": (-0.7, 3.0)}
    for g, (m, c) in truth.items():
        for x in range(40):
            rows.append((g, float(x), m * x + c + float(rng.randn()) * 0.01))
    rows.append(("single", 5.0, 9.9))  # 1 point → NULL slope
    df = spark.createDataFrame(rows, ["g", "x", "y"])
    got = {r["g"]: r for r in grouped_linear_trend(df, ["g"], "x", "y").collect()}
    for g, (m, c) in truth.items():
        xs = np.array([r[1] for r in rows if r[0] == g])
        ys = np.array([r[2] for r in rows if r[0] == g])
        want_m, want_c = np.polyfit(xs, ys, 1)
        assert got[g]["slope"] == pytest.approx(want_m, abs=1e-9)
        assert got[g]["intercept"] == pytest.approx(want_c, abs=1e-9)
        assert got[g]["r2"] > 0.999
    assert got["single"]["slope"] is None


def test_cusum_drift_flags_shifted_group_only(spark):
    import pytest

    from pyspark_weather_forecasting_gsod_spark.operators.quality import (
        cusum_drift,
    )

    rows = []
    # stable group: oscillates around the target 10
    for i in range(40):
        rows.append(("stable", i, 10.0 + (1 if i % 2 else -1) * 0.5))
    # drifting group: shifts to 12 at index 20
    for i in range(40):
        rows.append(("drift", i, 10.0 if i < 20 else 12.0))
    df = spark.createDataFrame(rows, ["g", "seq", "v"])
    got = {
        r["g"]: r
        for r in cusum_drift(df, "g", "seq", "v", target=10.0, k=0.5, h=5.0).collect()
    }
    assert not got["stable"]["drift_detected"]
    assert got["stable"]["first_alarm_at"] is None
    assert got["drift"]["drift_detected"]
    # pure-Python reference CUSUM for the drifting sequence
    s, alarm = 0.0, None
    for i in range(40):
        x = 10.0 if i < 20 else 12.0
        s = max(0.0, s + (x - 10.0 - 0.5))
        if alarm is None and s > 5.0:
            alarm = i + 1
    assert got["drift"]["first_alarm_at"] == alarm
    assert got["drift"]["cusum_max"] == pytest.approx(
        max(
            __import__("functools").reduce(
                lambda acc, x: (max(0.0, acc[0] + (x - 10.5)), max(acc[1], max(0.0, acc[0] + (x - 10.5)))),
                [10.0 if i < 20 else 12.0 for i in range(40)],
                (0.0, 0.0),
            )[1],
            0.0,
        ),
        abs=1e-9,
    )


def test_property_cusum_fold_matches_closed_form(spark):
    """Property: the JVM iterative CUSUM fold equals the closed form
    s_t = c_t - min(0, min_{j<=t} c_j) (prefix sums + prefix min — the
    formulation the declared query's oracle uses) on random sequences,
    including all-below-target and spike patterns."""
    from hypothesis import given, settings, strategies as st

    from pyspark_weather_forecasting_gsod_spark.operators.quality import (
        cusum_drift,
    )

    vals = st.lists(
        st.floats(min_value=-50, max_value=50, allow_nan=False, width=32),
        min_size=1, max_size=40,
    )

    @settings(max_examples=8, deadline=None)
    @given(vals, st.floats(min_value=-5, max_value=5, allow_nan=False, width=32))
    def check(xs, target):
        k, h = 1.0, 30.0
        df = spark.createDataFrame(
            [(1, i, float(x)) for i, x in enumerate(xs)], "g int, o int, v double"
        )
        got = cusum_drift(
            df, group_by="g", order_by="o", value_col="v",
            target=float(target), k=k, h=h,
        ).collect()[0]
        # closed-form reference
        smax = 0.0
        c, cmin = 0.0, 0.0  # cmin = min over c_0..c_t with c_0 = 0
        alarm = None
        for i, x in enumerate(xs):
            c += x - target - k
            cmin = min(cmin, c)
            s = c - cmin  # = max(0, s_prev + y): the clamp's closed form
            smax = max(smax, s)
            if alarm is None and s > h:
                alarm = i + 1
        assert abs(got["cusum_max"] - round(smax, 6)) < 1e-4
        assert got["first_alarm_at"] == alarm
        assert got["drift_detected"] == (alarm is not None)

    check()


def test_cusum_drift_max_group_rows_guard(spark):
    """The shared skew pre-flight (operators/guards.py, r05 VERDICT): an
    oversized group raises BEFORE the fold materializes its array; a
    compliant grain passes; None disables the check."""
    import pytest
    from pyspark.sql import Row

    from pyspark_weather_forecasting_gsod_spark.operators.quality import cusum_drift

    rows = [Row(g="hot", seq=i, v=10.0) for i in range(50)] + [
        Row(g="cool", seq=i, v=10.0) for i in range(5)
    ]
    df = spark.createDataFrame(rows)
    with pytest.raises(ValueError, match="max_group_rows=10"):
        cusum_drift(df, "g", "seq", "v", target=10.0, max_group_rows=10)
    # hottest offender is named so the caller can triage key-vs-grain
    with pytest.raises(ValueError, match="hot"):
        cusum_drift(df, "g", "seq", "v", target=10.0, max_group_rows=10)
    ok = cusum_drift(df, "g", "seq", "v", target=10.0, max_group_rows=50)
    assert ok.count() == 2
    assert cusum_drift(df, "g", "seq", "v", target=10.0).count() == 2


def test_r06_quality_graph_multimodal_impute_guards(spark):
    """r06 review batch: expectation_report survives hostile constraint
    names and an empty rulebook; imputers preserve input column order;
    pagerank raises cleanly on an empty graph; multimodal wrappers skip
    NULL payloads instead of crashing the task."""
    import pytest
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from pyspark_weather_forecasting_gsod_spark.ext.graph import pagerank
    from pyspark_weather_forecasting_gsod_spark.ext.multimodal import (
        decode_bmp_features,
        synthesize_bmp,
    )
    from pyspark_weather_forecasting_gsod_spark.operators.impute import (
        impute_with_group_median,
    )
    from pyspark_weather_forecasting_gsod_spark.operators.quality import (
        expectation_report,
        unique_key_violations,
    )

    df = spark.createDataFrame(
        [Row(g="a", temp=1.0), Row(g="a", temp=None), Row(g="b", temp=-5.0)]
    )
    # hostile names: quotes and backticks never reach SQL text
    rep = {
        r["constraint"]: r["n_violations"]
        for r in expectation_report(
            df, {"temp's `range`": F.col("temp") >= 0}
        ).collect()
    }
    assert rep == {"temp's `range`": 2}  # NULL counts as violation
    empty = expectation_report(df, {})
    assert empty.count() == 0 and empty.columns == [
        "constraint", "n_violations", "n_rows",
    ]
    # one-pass unique report
    ukv = unique_key_violations(df, ["g"]).first()
    assert (ukv["n_violations"], ukv["n_rows"]) == (1, 3)

    # imputed column keeps its schema position
    wide = spark.createDataFrame(
        [Row(stn=1, temp=None, dewp=9.0), Row(stn=1, temp=4.0, dewp=8.0)]
    )
    out = impute_with_group_median(wide, "temp", "stn")
    assert out.columns == ["stn", "temp", "dewp"]

    # empty graph raises a named error, not ZeroDivisionError
    edges = spark.createDataFrame([], "src long, dst long")
    with pytest.raises(ValueError, match="empty"):
        pagerank(edges)

    # NULL payload rows are skipped, not task-fatal
    mm = spark.createDataFrame(
        [(1, bytearray(synthesize_bmp(bytes(range(16))))), (2, None)],
        "doc_id long, payload binary",
    )
    got = decode_bmp_features(mm).collect()
    assert [r["doc_id"] for r in got] == [1]
