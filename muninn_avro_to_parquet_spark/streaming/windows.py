"""Event-time streaming operators: tumbling/sliding/session windows,
watermarked dedup, and a stateful running counter.

The reference never uses event time (its Beam ``FixedWindows`` at
/root/reference/main.py:611 only micro-batches file paths, and
``ingestion_date`` is processing time — main.py:496), so these are part of
the engine's extension surface: every transformation here is expressed so
the SAME function works on a batch DataFrame (for oracle checks) and on a
``readStream`` DataFrame (where Spark adds state management + late-data
handling under the watermark).

Scale notes: windowed aggregations shuffle once on (window, keys) with
map-side partial aggregation; state store size is bounded by the watermark
horizon, not stream length. ``dedup_within_watermark`` is the streaming
form of exact dedup — state is one entry per key within the horizon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_watermark(df: DataFrame, ts_col: str, delay: str) -> DataFrame:
    """Watermark wrapper that is a no-op for batch DataFrames (where
    ``withWatermark`` is rejected or meaningless), so batch oracles and
    streaming jobs share one code path."""
    if df.isStreaming:
        return df.withWatermark(ts_col, delay)
    return df


def tumbling_counts(
    df: DataFrame,
    ts_col: str = "ts",
    duration: str = "1 hour",
    keys: tuple[str, ...] = ("event_type",),
    watermark: str = "1 hour",
) -> DataFrame:
    """Events per (window, keys) over non-overlapping windows."""
    d = with_watermark(df, ts_col, watermark)
    return (
        d.groupBy(F.window(ts_col, duration).alias("win"), *keys)
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *keys,
            "n_events",
        )
    )


def sliding_counts(
    df: DataFrame,
    ts_col: str = "ts",
    duration: str = "1 hour",
    slide: str = "30 minutes",
    keys: tuple[str, ...] = ("event_type",),
    watermark: str = "1 hour",
) -> DataFrame:
    """Events per key over overlapping windows (each event lands in
    duration/slide windows)."""
    d = with_watermark(df, ts_col, watermark)
    return (
        d.groupBy(F.window(ts_col, duration, slide).alias("win"), *keys)
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *keys,
            "n_events",
        )
    )


def session_counts(
    df: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    keys: tuple[str, ...] = ("user_id",),
    watermark: str = "1 hour",
) -> DataFrame:
    """Session windows: a session closes after ``gap`` of inactivity.

    Streaming-native equivalent of the ``q_sessionize`` lag/sum query —
    Spark merges overlapping per-event windows in the state store instead
    of a global sort."""
    d = with_watermark(df, ts_col, watermark)
    return (
        d.groupBy(F.session_window(ts_col, gap).alias("win"), *keys)
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            *keys,
            "n_events",
        )
    )


def dedup_within_watermark(
    df: DataFrame, keys: list[str], ts_col: str = "ts", delay: str = "1 hour"
) -> DataFrame:
    """Drop duplicate events by key. Streaming: state-bounded
    ``dropDuplicatesWithinWatermark`` (exactly-once per key within the
    horizon); batch: plain ``dropDuplicates`` for oracle comparison."""
    if df.isStreaming:
        return df.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(keys)
    return df.dropDuplicates(keys)


def running_counts_stateful(
    df: DataFrame, key_col: str = "event_type", ts_col: str = "ts"
) -> DataFrame:
    """Custom stateful operator: cumulative event count per key via
    ``applyInPandas`` (batch) / ``applyInPandasWithState`` (streaming) —
    the pattern for operators Spark's built-ins can't express.

    Output: (key, n_events) with the latest cumulative count per key.
    """
    key_type = df.schema[key_col].dataType.simpleString()
    out_schema = f"{key_col} {key_type}, n_events bigint"
    if not df.isStreaming:
        # batch: the state collapses to a plain count
        return df.groupBy(key_col).agg(F.count("*").alias("n_events"))

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdf_iter, state: GroupState):
        n = state.get[0] if state.exists else 0
        for pdf in pdf_iter:
            n += len(pdf)
        state.update((n,))
        import pandas as pd

        yield pd.DataFrame({key_col: [key[0]], "n_events": [n]})

    return (
        df.withWatermark(ts_col, "1 hour")
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType="n bigint",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_left: str = "ts",
    ts_right: str = "ts",
    upper: str = "10 minutes",
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream event-time interval join: pair each left row with
    right rows on the same key whose timestamp lands in
    ``[left.ts, left.ts + upper]`` (e.g. click → purchase attribution).

    Both sides are watermarked so Spark can bound join state: buffered
    rows are evicted once the watermark passes the interval's reach —
    state is O(rows within horizon), not O(stream). The same expression
    tree runs on batch DataFrames for oracle checks (`with_watermark` is
    a batch no-op). Output keeps both timestamps; columns are prefixed
    l_/r_ to keep the join self-describing.

    ``how``: 'inner' or 'leftOuter' (unmatched left rows emit NULL right
    columns once the watermark proves no match can arrive).
    """
    l = with_watermark(left, ts_left, watermark).alias("l")
    r = with_watermark(right, ts_right, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{ts_right}") >= F.col(f"l.{ts_left}"))
        & (F.col(f"r.{ts_right}") <= F.col(f"l.{ts_left}") + F.expr(f"INTERVAL {upper}"))
    )
    out = l.join(r, cond, how)
    keep = [F.col(f"l.{key}").alias(key)]
    keep += [
        F.col(f"l.{c}").alias(f"l_{c}") for c in left.columns if c != key
    ]
    keep += [
        F.col(f"r.{c}").alias(f"r_{c}") for c in right.columns if c != key
    ]
    return out.select(*keep)
