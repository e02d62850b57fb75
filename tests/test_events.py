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


def test_cohort_retention_exact(spark):
    """Users cohorted by first active day; (cohort, offset) counts and
    floor-division ppm are exact. Multiple same-day events collapse
    (the activity relation is distinct (user, day))."""
    rows = [
        # cohort 2026-01-01: users 1,2 - user 1 returns day+1, both day+2
        (1, 0, 1, "view"), (2, 10, 1, "view"),       # same day twice
        (3, 24 * 60, 1, "click"),                    # day +1
        (4, 48 * 60, 1, "view"), (5, 0, 2, "view"), (6, 48 * 60, 2, "view"),
        # cohort 2026-01-02: user 3 only
        (7, 24 * 60, 3, "view"),
        (8, None, 4, "view"),                        # NULL ts: ignored
    ]
    got = {
        (str(r["cohort_day"]), r["day_offset"]): (
            r["n_users"], r["retention_ppm"]
        )
        for r in events.cohort_retention(_ev(spark, rows)).collect()
    }
    assert got == {
        ("2026-01-01", 0): (2, 1000000),
        ("2026-01-01", 1): (1, 500000),
        ("2026-01-01", 2): (2, 1000000),
        ("2026-01-02", 0): (1, 1000000),
    }


def test_funnel_conversion_latency_exact(spark):
    """latency = micros from the FIRST step-1 event to the event that
    completes the funnel along the greedy path; non-completers drop;
    pre-click purchases don't complete (in-order semantics)."""
    rows = [
        # user 1: view@0, click@2, purchase@5 -> latency 5 min
        (1, 0, 1, "view"), (2, 2, 1, "click"), (3, 5, 1, "purchase"),
        # user 2: purchase before click -> never completes
        (4, 0, 2, "view"), (5, 1, 2, "purchase"), (6, 2, 2, "click"),
        # user 3: two views; latency measured from the FIRST view
        (7, 0, 3, "view"), (8, 1, 3, "view"), (9, 2, 3, "click"),
        (10, 10, 3, "purchase"),
    ]
    got = {
        r["user_id"]: r["latency_us"]
        for r in events.funnel_conversion(
            _ev(spark, rows), ["view", "click", "purchase"]
        ).collect()
    }
    assert got == {1: 5 * 60 * 1_000_000, 3: 10 * 60 * 1_000_000}


def test_funnel_conversion_fold_equals_greedy_chain(spark):
    """r14 verdict #4 (carried to r15 #5): the Spark FOLD and the
    oracle's greedy nested-min CHAIN (first step-1, first step-2 after
    it, first step-3 after that) are equivalent — previously argued "by
    induction" in the q_funnel_latency docstring, here CHECKED over 200
    seeded random event streams including repeats, out-of-order steps,
    timestamp ties (event_id tiebreak), and pre-step-1 later steps.
    All users ride ONE DataFrame, so the property costs one Spark job.
    """
    import random

    rng = random.Random(0xF15)
    steps = ["view", "click", "purchase"]
    pos_of = {"view": 1, "click": 2, "purchase": 3}
    rows = []
    per_user: dict[int, list] = {}
    eid = 0
    for u in range(200):
        n = rng.randint(1, 12)
        evs = []
        for _ in range(n):
            t = rng.randint(0, 5)  # tight range -> frequent ts ties
            typ = rng.choice(["view", "click", "purchase", "noise"])
            eid += 1
            evs.append((eid, t, u, typ))
        rows.extend(evs)
        per_user[u] = evs
    df = _ev(spark, rows)
    got = {
        r["user_id"]: r["latency_us"]
        for r in events.funnel_conversion(df, steps).collect()
    }

    # independent reference: the oracle's greedy chain, NOT the fold
    def chain(evs):
        def key(e):
            # (ts micros, event_id) — the total order both engines use
            return (int((_T0 + dt.timedelta(minutes=e[1])).timestamp() * 1_000_000), e[0])

        prev = None
        for want_pos in (1, 2, 3):
            cands = [
                key(e)
                for e in evs
                if pos_of.get(e[3], 0) == want_pos
                and (prev is None or key(e) > prev)
            ]
            if not cands:
                return None
            mine = min(cands)
            if want_pos == 1:
                first = mine
            prev = mine
        return prev[0] - first[0]

    want = {}
    for u, evs in per_user.items():
        lat = chain(evs)
        if lat is not None:
            want[u] = lat
    assert got == want
