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


def test_funnel_within_exact_chain_semantics(spark):
    """funnel_within: EXACT exists-a-chain semantics — a greedy
    earliest-chain would time out on the crafted log below (first view at
    0 is too old for the click at 60, but the view at 50 completes the
    chain); repeated step types need two distinct events (the 1-PRECEDING
    frame); a gap of exactly `within` is inclusive; equal timestamps are
    ordered by the tie column; bad parameters raise."""
    import pytest
    from pyspark.sql import functions as F

    from pyspark_weather_forecasting_gsod_spark.operators.windows import funnel_within

    def mk(rows):
        df = spark.createDataFrame(rows, "u int, us long, i int, et string")
        return df.withColumn("ts", F.timestamp_micros("us"))

    # all times in seconds via within: micros under the hood
    S = 1_000_000
    rows = [
        # u=1: greedy-earliest trap — v@0 times out c@60 (W=20s), v@50 works
        (1, 0 * S, 1, "v"), (1, 50 * S, 2, "v"), (1, 60 * S, 3, "c"),
        # u=2: only the early view; click 60s later is out of the 20s bound
        (2, 0 * S, 1, "v"), (2, 60 * S, 2, "c"),
        # u=3: complete, gap exactly == within (inclusive), then purchase
        (3, 0 * S, 1, "v"), (3, 20 * S, 2, "c"), (3, 40 * S, 3, "p"),
        # u=4: right types, wrong order
        (4, 0 * S, 1, "p"), (4, 10 * S, 2, "c"), (4, 20 * S, 3, "v"),
        # u=5: no step-1 event at all
        (5, 0 * S, 1, "x"),
    ]
    out = {
        r["u"]: (r["steps_completed"], r["completed"], r["first_completion_us"])
        for r in funnel_within(
            mk(rows), "u", "ts", "i", "et", ["v", "c", "p"], within_seconds=20
        ).collect()
    }
    assert out == {
        1: (2, False, None),
        2: (1, False, None),
        3: (3, True, 40 * S),
        4: (1, False, None),
        5: (0, False, None),
    }

    # repeated step types: one view cannot be its own predecessor; two
    # distinct views (even at the SAME timestamp, tie-ordered) complete
    rep = [
        (1, 0, 1, "v"),
        (2, 0, 1, "v"), (2, 0, 2, "v"),
    ]
    out = {
        r["u"]: r["completed"]
        for r in funnel_within(
            mk(rep), "u", "ts", "i", "et", ["v", "v"], within_seconds=5
        ).collect()
    }
    assert out == {1: False, 2: True}

    with pytest.raises(ValueError, match="at least 2"):
        funnel_within(mk(rows), "u", "ts", "i", "et", ["v"], within_seconds=5)
    with pytest.raises(ValueError, match="within_seconds"):
        funnel_within(mk(rows), "u", "ts", "i", "et", ["v", "c"], within_seconds=0)
    with pytest.raises(ValueError, match="bound"):
        funnel_within(
            mk(rows), "u", "ts", "i", "et", ["v", "c"], within_seconds=5,
            bound="bogus",
        )
    with pytest.raises(ValueError, match="already has"):
        funnel_within(
            mk(rows).withColumn("__r1", F.lit(1)),
            "u", "ts", "i", "et", ["v", "c"], within_seconds=5,
        )

    # total-order precondition enforced at execution (r08 review): two
    # events tying on the FULL (ts, tie) tuple make the 1-PRECEDING frame
    # partition-layout-dependent — raise, same doctrine as shuffle_shards
    dup = [(1, 0, 1, "v"), (1, 5 * S, 2, "c"), (1, 5 * S, 2, "p")]
    with pytest.raises(Exception, match="ordering tie"):
        funnel_within(
            mk(dup), "u", "ts", "i", "et", ["v", "c"], within_seconds=60
        ).collect()

    # fractional within_seconds scales before rounding (r08 review: int()
    # truncation silently made 0.5 s a 0-µs window)
    sub = [(1, 0, 1, "v"), (1, 400_000, 2, "c"),   # 0.4 s gap: inside 0.5 s
           (2, 0, 1, "v"), (2, 700_000, 2, "c")]   # 0.7 s gap: outside
    out = {
        r["u"]: r["completed"]
        for r in funnel_within(
            mk(sub), "u", "ts", "i", "et", ["v", "c"], within_seconds=0.5
        ).collect()
    }
    assert out == {1: True, 2: False}

    # bound='first' (windowFunnel semantics): each step within W of the
    # chain START, not the previous step
    frows = [
        # u=1: per-step chain v@0 c@20 p@40 completes under bound='step'
        # but p is 40s from the start — fails bound='first' at W=20
        (1, 0 * S, 1, "v"), (1, 20 * S, 2, "c"), (1, 40 * S, 3, "p"),
        # u=2: max-start dominance trap — the chain through v@10 (not the
        # earliest v@0) is the only one that completes; an implementation
        # keeping the EARLIEST start would reject p@28 (28-0 > 20)
        (2, 0 * S, 1, "v"), (2, 5 * S, 2, "c"), (2, 10 * S, 3, "v"),
        (2, 18 * S, 4, "c"), (2, 28 * S, 5, "p"),
    ]
    out = {
        r["u"]: (r["steps_completed"], r["completed"], r["first_completion_us"])
        for r in funnel_within(
            mk(frows), "u", "ts", "i", "et", ["v", "c", "p"],
            within_seconds=20, bound="first",
        ).collect()
    }
    assert out == {1: (2, False, None), 2: (3, True, 28 * S)}


def test_property_funnel_within_matches_python_set_dp(spark):
    """Property: on randomized event logs (duplicate timestamps, repeated
    step types, tight/loose windows) funnel_within equals a pure-Python
    set-DP exists-chain matcher — the brute force that tracks EVERY
    feasible chain-end time per level, which the operator's running-max
    recurrence must reproduce exactly."""
    import random

    from pyspark.sql import functions as F

    from pyspark_weather_forecasting_gsod_spark.operators.windows import funnel_within

    def py_funnel(seq, steps, w_us, bound):
        # seq: (us, tie, type) in total order; set-DP over ALL feasible
        # chains — each level keeps every (chain_start, chain_end) pair,
        # so no greedy assumption leaks into the reference
        k = len(steps)
        feas = [set() for _ in range(k)]
        for us, _tie, ty in sorted(seq):
            add = []
            for i, s in enumerate(steps):
                if ty != s:
                    continue
                if i == 0:
                    add.append((0, (us, us)))
                else:
                    for start, _end in feas[i - 1]:
                        ref = _end if bound == "step" else start
                        if us - w_us <= ref:
                            add.append((i, (start, us)))
            for i, pair in add:
                feas[i].add(pair)
        depth = max((i + 1 for i in range(k) if feas[i]), default=0)
        comp = bool(feas[k - 1])
        first = min(e for _s, e in feas[k - 1]) if comp else None
        return depth, comp, first

    rng = random.Random(80)
    cases = [
        (["a", "b", "c"], 30),
        (["a", "a", "b"], 10),   # repeated step type
        (["b", "a"], 3),         # tight window
    ]
    for bound in ("step", "first"):
        for steps, within in cases:
            rows, want = [], {}
            for u in range(60):
                n = rng.randint(0, 12)
                seq = [
                    (rng.randint(0, 80) * 1_000_000, i, rng.choice("abcx"))
                    for i in range(n)
                ]
                rows += [(u, us, i, ty) for us, i, ty in seq]
                want[u] = py_funnel(seq, steps, within * 1_000_000, bound)
            # empty-log users produce no row at all (groupBy) — drop them
            want = {u: v for u, v in want.items() if any(r[0] == u for r in rows)}
            df = spark.createDataFrame(
                rows, "u int, us long, i int, et string"
            ).withColumn("ts", F.timestamp_micros("us"))
            got = {
                r["u"]: (
                    r["steps_completed"], r["completed"], r["first_completion_us"]
                )
                for r in funnel_within(
                    df, "u", "ts", "i", "et", steps, within_seconds=within,
                    bound=bound,
                ).collect()
            }
            assert got == want, (bound, steps, within)


def test_lead_labels_fractional_gap_inclusive_boundary(spark):
    """r08 review: int() truncation of max_gap_seconds*1e6 lost up to 1 µs
    and rejected an observation exactly at the allowed gap."""
    import datetime as dt

    from pyspark.sql import Row

    from pyspark_weather_forecasting_gsod_spark.operators.windows import lead_labels

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        Row(g="a", ts=t0, v=1.0),
        Row(g="a", ts=t0 + dt.timedelta(microseconds=4_100_000), v=2.0),
    ]
    out = lead_labels(
        spark.createDataFrame(rows), "g", "ts", {"v": "next_v"},
        drop_null_labels=True, max_gap_seconds=4.1,
    )
    # the 4.1 s gap is exactly at the bound — inclusive, label kept
    assert [r["next_v"] for r in out.collect()] == [2.0]


def test_order_tie_assert_first_row_all_null_is_not_a_tie(spark):
    """r08 review: eqNullSafe conflated 'no preceding row' with 'preceding
    value is NULL' — a partition's FIRST row with all-NULL order columns
    was falsely flagged as a tie."""
    from pyspark.sql import functions as F

    from pyspark_weather_forecasting_gsod_spark.operators.windows import funnel_within

    df = spark.createDataFrame(
        [(1, None, 1, "v"), (2, 5_000_000, 1, "v"), (2, 6_000_000, 2, "c")],
        "u int, us long, i int, et string",
    ).withColumn("ts", F.timestamp_micros("us"))
    out = {
        r["u"]: r["steps_completed"]
        for r in funnel_within(
            df, "u", "ts", "i", "et", ["v", "c"], within_seconds=60
        ).collect()
    }
    # no raise; the NULL-ts event can't anchor a chain (unix_micros NULL)
    assert out == {1: 0, 2: 2}
