"""Event-sequence analytics: ordered funnel matching.

The reference job has no event surface; this extends the engine's
events family (sessionize, streaks, tumbling/sliding/session windows)
with the ordered-funnel operator product analytics runs on every event
stream: how far does each user get through step₁ → step₂ → … → stepₙ,
where a step only counts AFTER the previous one happened.

Engine-exact by construction: each event maps to its step index (or 0),
the per-user index sequence is sorted by (ts, event_id) — a total order,
event ids are unique — and a single integer FOLD advances a
depth accumulator iff the next element equals depth+1. Both engines run
the identical fold (Spark ``aggregate``, DuckDB ``list_reduce`` over
the 0-prepended list), so per-user depths replay bit-for-bit.

Scale shape: ONE groupBy(user) shuffle carrying (ts, id, step-index)
triples — no per-step join chain (the textbook n-step funnel is n-1
self-joins; this is one exchange regardless of n), no window, no UDF.
Per-user state is that user's event count, the same bound sessionize
already accepts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def funnel_depth(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    event_id_col: str = "event_id",
) -> DataFrame:
    """Per-user funnel depth: (user, depth) where depth = number of
    ``steps`` completed IN ORDER (an event only advances the funnel if
    every earlier step already happened at a strictly earlier
    (ts, event_id) position — ``event_id_col`` is the tiebreaker that
    makes the order total). Users with events but no step-1 event
    report depth 0. NULL-ts events can't be ordered and are ignored."""
    if not steps:
        raise ValueError("funnel_depth needs at least one step")
    if len(set(steps)) != len(steps):
        raise ValueError(f"funnel steps must be distinct, got {steps}")
    pos: Column = F.lit(0)
    for i, s in enumerate(reversed(steps)):
        pos = F.when(F.col(type_col) == s, len(steps) - i).otherwise(pos)
    seq = df.filter(F.col(ts_col).isNotNull()).select(
        F.col(user_col),
        F.struct(
            F.col(ts_col).alias("ts"),
            F.col(event_id_col).alias("eid"),
            pos.cast("int").alias("pos"),
        ).alias("_e"),
    )
    per_user = seq.groupBy(user_col).agg(
        F.sort_array(F.collect_list("_e")).alias("_seq")
    )
    fold = F.aggregate(
        F.expr("transform(_seq, s -> s.pos)"),
        F.lit(0),
        lambda acc, x: F.when(x == acc + 1, acc + 1).otherwise(acc),
    )
    return per_user.select(
        F.col(user_col), fold.cast("int").alias("depth")
    )


def funnel_report(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    event_id_col: str = "event_id",
) -> DataFrame:
    """The funnel table: one row per step — (step_idx, step_name,
    n_users reaching it in order, of_entered_ppm = parts-per-million of
    step-1 completers, integer floor division so the ratio is exact in
    any engine). The report relation is ``len(steps)`` rows however
    large the stream is; all heavy lifting is ``funnel_depth``'s one
    exchange."""
    depths = funnel_depth(df, steps, user_col, ts_col, type_col, event_id_col)
    spark = df.sparkSession
    step_rel = spark.createDataFrame(
        [(i + 1, s) for i, s in enumerate(steps)],
        "step_idx int, step_name string",
    )
    counts = depths.crossJoin(F.broadcast(step_rel)).groupBy(
        "step_idx", "step_name"
    ).agg(
        F.sum((F.col("depth") >= F.col("step_idx")).cast("long")).alias(
            "n_users"
        )
    )
    entered = depths.filter(F.col("depth") >= 1).agg(
        F.count("*").alias("_n1")
    )
    return counts.crossJoin(F.broadcast(entered)).select(
        "step_idx",
        "step_name",
        "n_users",
        F.when(F.col("_n1") > 0, F.expr("(1000000 * n_users) div _n1"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("of_entered_ppm"),
    )


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention matrix: users are cohorted by their FIRST active
    day; for every (cohort_day, day_offset) report how many of that
    cohort were active again ``day_offset`` days later, plus the exact
    parts-per-million retention (integer floor division — engine-free).
    Output: (cohort_day date, day_offset int, n_users long,
    retention_ppm long); day_offset 0 rows are the cohort sizes
    (retention_ppm = 1000000).

    Scale shape: one distinct on (user, day) — the activity relation,
    bounded by users × active-days, far under the event count — one
    groupBy(user) for first-day, a user-keyed join, and a final tiny
    (cohort, offset) aggregate joined against the broadcast-sized
    cohort-size relation. No event-grain shuffle survives past the
    first distinct. NULL-ts events carry no day and are ignored."""
    days = (
        df.filter(F.col(ts_col).isNotNull())
        .select(F.col(user_col), F.to_date(F.col(ts_col)).alias("_day"))
        .distinct()
    )
    first = days.groupBy(user_col).agg(F.min("_day").alias("cohort_day"))
    rel = days.join(first, user_col).select(
        "cohort_day",
        F.datediff(F.col("_day"), F.col("cohort_day")).alias("day_offset"),
    )
    counts = rel.groupBy("cohort_day", "day_offset").agg(
        F.count("*").cast("long").alias("n_users")
    )
    base = counts.filter(F.col("day_offset") == 0).select(
        "cohort_day", F.col("n_users").alias("_cohort_size")
    )
    return counts.join(F.broadcast(base), "cohort_day").select(
        "cohort_day",
        "day_offset",
        "n_users",
        F.expr("(1000000 * n_users) div _cohort_size")
        .cast("long")
        .alias("retention_ppm"),
    )


def funnel_conversion(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    event_id_col: str = "event_id",
) -> DataFrame:
    """Per-user time-to-convert through the WHOLE funnel: one row per
    user whose in-order depth (see :func:`funnel_depth`) reaches
    ``len(steps)``, with ``latency_us`` = microseconds from the event
    that STARTED the completed path (the first step-1 event) to the
    event that finished it. Output: (user, latency_us long).

    Same single groupBy(user) exchange as funnel_depth — the fold just
    carries two extra integers (first-step and last-advance timestamps
    in epoch micros) through the accumulator, so both engines replay
    the identical integer state machine and the latencies are
    hash-exact."""
    if not steps:
        raise ValueError("funnel_conversion needs at least one step")
    if len(set(steps)) != len(steps):
        raise ValueError(f"funnel steps must be distinct, got {steps}")
    pos: Column = F.lit(0)
    for i, s in enumerate(reversed(steps)):
        pos = F.when(F.col(type_col) == s, len(steps) - i).otherwise(pos)
    seq = df.filter(F.col(ts_col).isNotNull()).select(
        F.col(user_col),
        F.struct(
            F.col(ts_col).alias("ts"),
            F.col(event_id_col).alias("eid"),
            pos.cast("int").alias("pos"),
            F.unix_micros(F.col(ts_col)).alias("us"),
        ).alias("_e"),
    )
    per_user = seq.groupBy(user_col).agg(
        F.sort_array(F.collect_list("_e")).alias("_seq")
    )
    init = F.struct(
        F.lit(0).cast("int").alias("depth"),
        F.lit(0).cast("long").alias("ts1"),
        F.lit(0).cast("long").alias("tsn"),
    )
    fold = F.aggregate(
        F.expr("transform(_seq, s -> struct(s.pos as pos, s.us as us))"),
        init,
        lambda acc, x: F.struct(
            F.when(x["pos"] == acc["depth"] + 1, acc["depth"] + 1)
            .otherwise(acc["depth"])
            .cast("int")
            .alias("depth"),
            F.when((x["pos"] == 1) & (acc["depth"] == 0), x["us"])
            .otherwise(acc["ts1"])
            .cast("long")
            .alias("ts1"),
            F.when(x["pos"] == acc["depth"] + 1, x["us"])
            .otherwise(acc["tsn"])
            .cast("long")
            .alias("tsn"),
        ),
    )
    return (
        per_user.select(F.col(user_col), fold.alias("_st"))
        .filter(F.col("_st.depth") == len(steps))
        .select(
            user_col,
            (F.col("_st.tsn") - F.col("_st.ts1")).cast("long").alias(
                "latency_us"
            ),
        )
    )
