"""Incremental aggregate maintenance (operators/cdc.py rollup_partial /
merge_rollup): merge of partials equals the from-scratch aggregate for
any split of the input, including empty deltas and retractions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from muninn_avro_to_parquet_spark.operators import cdc


def _rows(df):
    return {
        tuple(r[c] for c in sorted(df.columns)) for r in df.collect()
    }


def test_merge_equals_full_recompute(spark):
    df = spark.range(0, 1000).select(
        (F.col("id") % 7).alias("k"), (F.col("id") * 3).alias("v")
    )
    sums = {"v_sum": F.col("v")}
    full = cdc.rollup_partial(df, ["k"], sums)
    base = cdc.rollup_partial(df.filter(F.col("id") % 10 != 0), ["k"], sums)
    delta = cdc.rollup_partial(df.filter(F.col("id") % 10 == 0), ["k"], sums)
    merged = cdc.merge_rollup(base, delta, ["k"])
    assert _rows(merged) == _rows(full)


def test_merge_with_empty_delta_is_identity(spark):
    df = spark.range(0, 100).select((F.col("id") % 3).alias("k"), F.col("id").alias("v"))
    sums = {"v_sum": F.col("v")}
    base = cdc.rollup_partial(df, ["k"], sums)
    delta = cdc.rollup_partial(df.filter(F.lit(False)), ["k"], sums)
    assert _rows(cdc.merge_rollup(base, delta, ["k"])) == _rows(base)


def test_retraction_folds_with_negated_partials(spark):
    df = spark.range(0, 100).select((F.col("id") % 3).alias("k"), F.col("id").alias("v"))
    sums = {"v_sum": F.col("v")}
    base = cdc.rollup_partial(df, ["k"], sums)
    gone = df.filter(F.col("id") < 10)
    neg = cdc.rollup_partial(gone, ["k"], sums).select(
        "k", (-F.col("n_rows")).alias("n_rows"), (-F.col("v_sum")).alias("v_sum")
    )
    merged = cdc.merge_rollup(base, neg, ["k"])
    expect = cdc.rollup_partial(df.filter(F.col("id") >= 10), ["k"], sums)
    assert _rows(merged) == _rows(expect)


def test_merge_rejects_mismatched_schemas(spark):
    df = spark.range(0, 10).select((F.col("id") % 2).alias("k"), F.col("id").alias("v"))
    a = cdc.rollup_partial(df, ["k"], {"v_sum": F.col("v")})
    b = cdc.rollup_partial(df, ["k"], {"other": F.col("v")})
    with pytest.raises(ValueError):
        cdc.merge_rollup(a, b, ["k"])


# -- exact repeated-span detection (operators/dedup.repeated_spans) --------

from muninn_avro_to_parquet_spark.operators import dedup


def test_repeated_spans_finds_known_run(spark):
    shared = " ".join(f"w{i}" for i in range(20))  # 20-token verbatim run
    docs = [
        (1, "alpha beta " + shared + " gamma"),
        (2, "delta " + shared + " epsilon zeta"),
        (3, "unrelated text entirely different words here"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = dedup.repeated_spans(df, "doc_id", k=4, min_run=10).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["id_a"], r["id_b"]) == (1, 2)
    assert r["run_tokens"] == 20
    assert r["a_start"] == 2 and r["b_start"] == 1


def test_repeated_spans_straddles_chunk_boundaries(spark):
    """The case non-overlapping token_chunks misses: a repeat offset by
    half a chunk still comes back exact here."""
    run = " ".join(f"t{i}" for i in range(12))
    df = spark.createDataFrame(
        [(1, "x " + run), (2, "a b c " + run)], "doc_id long, text string"
    )
    out = dedup.repeated_spans(df, "doc_id", k=4, min_run=12).collect()
    assert len(out) == 1 and out[0]["run_tokens"] == 12


def test_repeated_spans_caps_boilerplate_anchors(spark):
    """A gram present in more docs than max_anchor_docs is dropped —
    the quadratic-blowup guard."""
    boiler = "same old boilerplate line repeated everywhere forever today"
    df = spark.createDataFrame(
        [(i, boiler) for i in range(10)], "doc_id long, text string"
    )
    out = dedup.repeated_spans(df, "doc_id", k=4, min_run=4, max_anchor_docs=5)
    assert out.count() == 0


def test_remove_repeated_spans_cuts_higher_id_doc(spark):
    shared = " ".join(f"w{i}" for i in range(12))
    df = spark.createDataFrame(
        [
            (1, "intro " + shared + " outro"),
            (2, "pre " + shared + " post"),
            (3, "untouched document with its own words"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in dedup.remove_repeated_spans(df, "doc_id", k=4, min_run=12).collect()
    }
    assert out[1]["n_removed"] == 0  # first occurrence survives
    assert out[1]["clean_text"] == "intro " + shared + " outro"
    assert out[2]["n_removed"] == 12  # the run is cut, frame words stay
    assert out[2]["clean_text"] == "pre post"
    assert out[3]["n_removed"] == 0
    assert out[3]["clean_text"] == "untouched document with its own words"


def test_streaming_rollup_maintenance(spark, tmp_path):
    """Incremental view maintenance under Structured Streaming: a
    foreachBatch sink folds each micro-batch's partials into the
    maintained rollup with merge_rollup — history is never re-scanned —
    and the final table equals a from-scratch batch aggregate."""
    import os

    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    os.makedirs(src)
    # three "loads" arriving as separate files
    all_parts = []
    for i in range(3):
        part = spark.range(i * 100, (i + 1) * 100).select(
            (F.col("id") % 5).alias("k"), (F.col("id") * 7).alias("v")
        )
        part.coalesce(1).write.mode("append").parquet(src)
        all_parts.append(part)

    sums = {"v_sum": F.col("v")}

    def fold(batch, _bid):
        s = batch.sparkSession
        delta = cdc.rollup_partial(batch, ["k"], sums)
        if os.path.exists(os.path.join(state, "_SUCCESS")):
            base = s.read.parquet(state)
            merged = cdc.merge_rollup(base, delta, ["k"])
        else:
            merged = delta
        # collect-then-rewrite: the maintained rollup is key-cardinality
        # sized (5 rows here); real deployments write per-partition
        rows = merged.collect()
        s.createDataFrame(rows, merged.schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(state)

    stream = spark.readStream.schema("k long, v long").option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = _rows(spark.read.parquet(state))
    full = spark.read.parquet(src)
    want = _rows(cdc.rollup_partial(full, ["k"], sums))
    assert got == want
