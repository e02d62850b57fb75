"""Ordered funnel (operators/events.py, r13): in-order semantics, the
degenerate users, and the exact-ppm report."""

from __future__ import annotations

import datetime as dt

import pytest

from muninn_avro_to_parquet_spark.operators import events

_T0 = dt.datetime(2026, 1, 1)


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (eid, _T0 + dt.timedelta(minutes=m) if m is not None else None, u, t)
            for eid, m, u, t in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string",
    )


def test_funnel_depth_order_matters(spark):
    df = _ev(spark, [
        # user 1: full funnel in order
        (1, 0, 1, "view"), (2, 1, 1, "click"), (3, 2, 1, "purchase"),
        # user 2: purchase BEFORE click -> depth stops at 2 (the early
        # purchase can't complete a funnel whose click hasn't happened)
        (4, 0, 2, "view"), (5, 1, 2, "purchase"), (6, 2, 2, "click"),
        # user 3: clicks without ever viewing -> depth 0
        (7, 0, 3, "click"), (8, 1, 3, "click"),
        # user 4: view only
        (9, 0, 4, "view"),
        # user 5: NULL-ts events are unorderable and ignored
        (10, None, 5, "view"), (11, 1, 5, "view"), (12, 2, 5, "click"),
    ])
    steps = ["view", "click", "purchase"]
    got = {
        r["user_id"]: r["depth"]
        for r in events.funnel_depth(df, steps).collect()
    }
    assert got == {1: 3, 2: 2, 3: 0, 4: 1, 5: 2}


def test_funnel_report_exact_ppm(spark):
    df = _ev(spark, [
        (1, 0, 1, "view"), (2, 1, 1, "click"), (3, 2, 1, "purchase"),
        (4, 0, 2, "view"), (5, 1, 2, "click"),
        (6, 0, 3, "view"),
        (7, 0, 4, "error"),
    ])
    rep = {
        r["step_idx"]: (r["step_name"], r["n_users"], r["of_entered_ppm"])
        for r in events.funnel_report(df, ["view", "click", "purchase"]).collect()
    }
    assert rep[1] == ("view", 3, 1000000)
    assert rep[2] == ("click", 2, 666666)   # floor(2e6 / 3)
    assert rep[3] == ("purchase", 1, 333333)


def test_funnel_validation(spark):
    df = _ev(spark, [(1, 0, 1, "view")])
    with pytest.raises(ValueError, match="at least one"):
        events.funnel_depth(df, [])
    with pytest.raises(ValueError, match="distinct"):
        events.funnel_depth(df, ["view", "view"])


def test_funnel_event_id_col_parameter(spark):
    """ADVICE r13: the (ts, id) tiebreaker column is parameterized —
    a stream whose id column isn't named 'event_id' works, and the
    renamed run replays the default run bit-for-bit."""
    rows = [
        (1, 0, 1, "view"), (2, 1, 1, "click"), (3, 2, 1, "purchase"),
        (4, 0, 2, "view"),
    ]
    base = _ev(spark, rows)
    renamed = base.withColumnRenamed("event_id", "evt_key")
    want = {r["user_id"]: r["depth"] for r in events.funnel_depth(
        base, ["view", "click", "purchase"]).collect()}
    got = {r["user_id"]: r["depth"] for r in events.funnel_depth(
        renamed, ["view", "click", "purchase"], event_id_col="evt_key"
    ).collect()}
    assert got == want == {1: 3, 2: 1}
