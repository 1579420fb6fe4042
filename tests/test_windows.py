"""W1 lead labels + W2 sliding frames (reference ipynb:1251-1260, 863-875)."""

import datetime as dt

from pyspark.sql import Row

from pyspark_weather_forecasting_gsod_spark.operators.windows import lead_labels, sliding_frame_avg


def D(y, m, d):
    return dt.date(y, m, d)


def _station_df(spark):
    return spark.createDataFrame(
        [
            Row(stn="a", date=D(2023, 1, 1), mx=10.0),
            Row(stn="a", date=D(2023, 1, 2), mx=20.0),
            Row(stn="a", date=D(2023, 1, 5), mx=50.0),  # 3-day gap
            Row(stn="b", date=D(2023, 1, 1), mx=99.0),  # single-row station
        ]
    )


def test_lead_labels_row_based(spark):
    """Reference semantics: next *observation*, even across date gaps."""
    out = lead_labels(
        _station_df(spark), "stn", "date", {"mx": "next_mx"}, drop_null_labels=True
    )
    got = {(r.stn, r.date.day): r.next_mx for r in out.collect()}
    # station b's only row and station a's last row dropped (ipynb:1260)
    assert got == {("a", 1): 20.0, ("a", 2): 50.0}


def test_lead_labels_calendar_strict_nulls_gaps(spark):
    out = lead_labels(
        _station_df(spark),
        "stn",
        "date",
        {"mx": "next_mx"},
        drop_null_labels=True,
        calendar_strict=True,
        date_col="date",
    )
    got = {(r.stn, r.date.day): r.next_mx for r in out.collect()}
    # jan2 → jan5 is a gap: label nulled and dropped under strict mode
    assert got == {("a", 1): 20.0}


def test_lead_labels_keep_nulls(spark):
    out = lead_labels(
        _station_df(spark), "stn", "date", {"mx": "next_mx"}, drop_null_labels=False
    )
    assert out.count() == 4


def test_sliding_frame_avg_edges(spark):
    df = spark.createDataFrame(
        [Row(stn="a", date=D(2023, 1, i + 1), v=float(i)) for i in range(4)]
    )
    out = sliding_frame_avg(df, "v", "stn", "date", before=1, after=1, out_col="m")
    got = {r.date.day: r.m for r in out.collect()}
    # frame clips at partition edges, exactly like the reference's ROWS frame
    assert got == {1: 0.5, 2: 1.0, 3: 2.0, 4: 2.5}


def test_event_paths_order_symbols_and_guard(spark):
    """event_paths: deterministic total-order path, unmapped/NULL symbols
    become '_' (positions stay faithful), multi-char symbols rejected,
    and the max_group_rows guard raises on a hot group."""
    import pytest
    from pyspark.sql import Row

    from pyspark_weather_forecasting_gsod_spark.operators.windows import event_paths

    rows = [
        Row(u=1, ts=3, i=1, et="purchase"),
        Row(u=1, ts=1, i=2, et="view"),
        Row(u=1, ts=2, i=3, et="click"),
        Row(u=1, ts=2, i=4, et="weird"),   # unmapped -> '_'
        Row(u=1, ts=2, i=5, et=None),      # NULL -> '_'
        Row(u=2, ts=1, i=6, et="view"),
    ]
    df = spark.createDataFrame(rows)
    syms = {"view": "v", "click": "c", "purchase": "p"}
    got = {r["u"]: (r["n_events"], r["path"]) for r in event_paths(
        df, "u", ["ts", "i"], "et", syms).collect()}
    # u=1 ordered by (ts, i): (1,2)v (2,3)c (2,4)_ (2,5)_ (3,1)p
    assert got == {1: (5, "vc__p"), 2: (1, "v")}

    with pytest.raises(ValueError, match="1 char"):
        event_paths(df, "u", ["ts", "i"], "et", {"view": "vv"})
    with pytest.raises(ValueError, match="event_paths"):
        event_paths(df, "u", ["ts", "i"], "et", syms, max_group_rows=3)


def test_property_event_paths_match_python_oracle(spark):
    """Property (hypothesis): on randomized event logs — duplicate
    timestamps, unmapped symbols, NULLs, multiple groups — event_paths
    equals a pure-Python total-order path builder."""
    from hypothesis import given, settings, strategies as st

    from pyspark_weather_forecasting_gsod_spark.operators.windows import event_paths

    ev = st.tuples(
        st.integers(min_value=1, max_value=3),       # group
        st.integers(min_value=0, max_value=5),       # ts (duplicates likely)
        st.sampled_from(["view", "click", "buy", "odd", None]),
    )

    @settings(max_examples=6, deadline=None)
    @given(st.lists(ev, min_size=1, max_size=25))
    def check(events):
        rows = [(g, ts, i, et) for i, (g, ts, et) in enumerate(events)]
        df = spark.createDataFrame(rows, "g long, ts long, i long, et string")
        syms = {"view": "v", "click": "c", "buy": "b"}
        got = {r["g"]: (r["n_events"], r["path"]) for r in event_paths(
            df, "g", ["ts", "i"], "et", syms).collect()}
        want = {}
        for g in {r[0] for r in rows}:
            seq = sorted((r for r in rows if r[0] == g), key=lambda r: (r[1], r[2]))
            want[g] = (len(seq), "".join(syms.get(r[3], "_") for r in seq))
        assert got == want, (events, got, want)

    check()
