"""Unit tests for the round-3 corpus operators: benchmark decontamination,
normalized dedup, vocabulary, and SCD2 history. Oracle-level parity runs in
test_oracle_parity / the driver; these pin the operator semantics on
hand-checkable inputs."""

from __future__ import annotations

from pyspark.sql import functions as F

from muninn_avro_to_parquet_spark.operators import cdc, dedup, text


def test_decontaminate_flags_overlap(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated words about astronomy and planets"),
            (3, "quick brown fox appears here too"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "watch the quick brown fox run")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in dedup.decontaminate(corpus, bench, "doc_id").collect()}
    assert rows[1]["contaminated"] and rows[1]["n_overlap"] >= 2  # "the quick brown", "quick brown fox"
    assert rows[3]["contaminated"] and rows[3]["n_overlap"] == 1  # "quick brown fox"
    assert not rows[2]["contaminated"] and rows[2]["n_overlap"] == 0
    assert set(rows) == {1, 2, 3}  # every corpus doc present, flagged or not


def test_normalized_dedup_collapses_formatting(spark):
    df = spark.createDataFrame(
        [
            (1, "Hello,   World!"),
            (2, "hello world"),
            (3, "HELLO ... WORLD"),
            (4, "goodbye world"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in text.normalized_dedup(df, "doc_id").collect()}
    assert rows[1]["canonical_id"] == 1 and not rows[1]["is_dup"]
    assert rows[2]["canonical_id"] == 1 and rows[2]["is_dup"]
    assert rows[3]["canonical_id"] == 1 and rows[3]["is_dup"]
    assert rows[4]["canonical_id"] == 4 and not rows[4]["is_dup"]


def test_vocabulary_counts_and_ranks(spark):
    df = spark.createDataFrame(
        [(1, "a b a"), (2, "a c")], "doc_id long, text string"
    )
    rows = {r["token"]: r for r in text.vocabulary(df, "doc_id").collect()}
    assert rows["a"]["n_occurrences"] == 3 and rows["a"]["n_docs"] == 2
    assert rows["b"]["n_occurrences"] == 1 and rows["b"]["n_docs"] == 1
    assert rows["a"]["rank"] == 1
    # ties (b and c both 1 occurrence) break alphabetically
    assert rows["b"]["rank"] == 2 and rows["c"]["rank"] == 3


def test_scd2_history_intervals_chain(spark):
    df = spark.createDataFrame(
        [
            (7, 1, "signup", 100),
            (7, 2, "upgrade", 200),
            (7, 3, "churn", 300),
            (8, 4, "signup", 150),
        ],
        "user_id long, event_id long, state string, t long",
    )
    hist = cdc.scd2_history(
        df, ["user_id"], "t", ["event_id", "state"], tie_break_cols=["event_id"]
    )
    rows = sorted(hist.collect(), key=lambda r: (r["user_id"], r["valid_from"]))
    u7 = [r for r in rows if r["user_id"] == 7]
    # half-open chain: each interval closes exactly where the next opens
    assert [(r["valid_from"], r["valid_to"]) for r in u7] == [
        (100, 200),
        (200, 300),
        (300, None),
    ]
    assert [r["is_current"] for r in u7] == [False, False, True]
    (u8,) = [r for r in rows if r["user_id"] == 8]
    assert u8["valid_to"] is None and u8["is_current"]


def test_scd2_time_travel_contract(spark):
    """valid_from <= t < valid_to reconstructs the state at any t."""
    df = spark.createDataFrame(
        [(7, 1, "a", 100), (7, 2, "b", 200)],
        "user_id long, event_id long, state string, t long",
    )
    hist = cdc.scd2_history(df, ["user_id"], "t", ["state"], tie_break_cols=["event_id"])
    at_150 = hist.filter(
        (F.col("valid_from") <= 150)
        & (F.col("valid_to").isNull() | (F.lit(150) < F.col("valid_to")))
    ).collect()
    assert len(at_150) == 1 and at_150[0]["state"] == "a"


def test_global_row_number_matches_single_window(spark):
    """global_row_number (range partition + offsets) must equal the
    single-partition Window.orderBy row_number for any total order."""
    from pyspark.sql import Window, functions as F

    from muninn_avro_to_parquet_spark.operators import text

    df = spark.range(0, 1000).select(
        (F.col("id") % 97).alias("score"), F.col("id").cast("string").alias("key")
    )
    order = [F.col("score").desc(), F.col("key").asc()]
    got = {
        (r["score"], r["key"]): r["rank"]
        for r in text.global_row_number(df, *order, num_partitions=7).collect()
    }
    w = Window.orderBy(*order)
    want = {
        (r["score"], r["key"]): r["rank"]
        for r in df.withColumn("rank", F.row_number().over(w)).collect()
    }
    assert got == want
