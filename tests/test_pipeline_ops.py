"""Dataset-assembly operators (operators/pipeline.py) + PII scrubbing
(operators/text.py) + label centroids (operators/similarity.py).

The registry's synthetic corpus contains no PII and few exact spans, so
these tests build fixtures where the interesting behavior actually fires:
emails/SSNs/phones that must be redacted, documents sharing exact token
spans, zero-weight strata, and split determinism across partitionings.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from muninn_avro_to_parquet_spark.operators import pipeline, similarity, text


# ---------------------------------------------------------------------------
# splits
# ---------------------------------------------------------------------------


def test_assign_split_ratios_and_labels(spark):
    df = spark.range(0, 20000).withColumnRenamed("id", "doc_id")
    out = pipeline.assign_split(df, "doc_id").groupBy("split").count()
    counts = {r["split"]: r["count"] for r in out.collect()}
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / 20000 - 0.8) < 0.02
    assert abs(counts["val"] / 20000 - 0.1) < 0.01
    assert abs(counts["test"] / 20000 - 0.1) < 0.01


def test_assign_split_deterministic_across_partitioning(spark):
    """The split must be a pure function of the id — repartitioning (what
    AQE does at will on a real cluster) must not move any row."""
    df = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["split"] for r in pipeline.assign_split(df, "doc_id").collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in pipeline.assign_split(df.repartition(13), "doc_id").collect()
    }
    assert a == b


def test_assign_split_custom_weights_and_salt(spark):
    df = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
    half = pipeline.assign_split(df, "doc_id", {"a": 1, "b": 1}, salt="s1")
    counts = {r["split"]: r["count"] for r in half.groupBy("split").count().collect()}
    assert abs(counts["a"] / 5000 - 0.5) < 0.03
    # a different salt must reshuffle assignments
    other = pipeline.assign_split(df, "doc_id", {"a": 1, "b": 1}, salt="s2")
    joined = (
        half.select("doc_id", F.col("split").alias("s1"))
        .join(other.select("doc_id", F.col("split").alias("s2")), "doc_id")
        .filter(F.col("s1") != F.col("s2"))
    )
    assert joined.count() > 1000  # ~50% expected to differ


def test_split_weights_must_be_positive(spark):
    df = spark.range(0, 10).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError):
        pipeline.assign_split(df, "doc_id", {"a": 0.0})


# ---------------------------------------------------------------------------
# stratified sampling
# ---------------------------------------------------------------------------


def test_stratified_sample_fractions(spark):
    df = spark.createDataFrame(
        [(i, ["keep_all", "half", "drop"][i % 3]) for i in range(9000)],
        ["doc_id", "source"],
    )
    out = pipeline.stratified_sample(
        df, "doc_id", "source", {"keep_all": 1.0, "half": 0.5}, default_fraction=0.0
    )
    counts = {r["source"]: r["count"] for r in out.groupBy("source").count().collect()}
    assert counts["keep_all"] == 3000  # fraction 1.0 keeps every row
    assert abs(counts["half"] / 3000 - 0.5) < 0.05
    assert "drop" not in counts  # default 0.0 drops unlisted strata


def test_fraction_cutoff_hex_edges():
    assert pipeline.fraction_cutoff_hex(0.0) == "0000"
    assert pipeline.fraction_cutoff_hex(1.0) == "KEEP_ALL"
    assert pipeline.fraction_cutoff_hex(0.5) == "8000"
    # out-of-range clamps instead of producing a broken comparison
    assert pipeline.fraction_cutoff_hex(1.5) == "KEEP_ALL"
    assert pipeline.fraction_cutoff_hex(-0.5) == "0000"


# ---------------------------------------------------------------------------
# token-chunk span dedup
# ---------------------------------------------------------------------------


def test_duplicated_chunks_finds_shared_span(spark):
    shared = "alpha beta gamma delta"  # exactly one 4-token chunk
    df = spark.createDataFrame(
        [
            (1, shared + " unique one ending here now"),
            (2, shared + " other words entirely different here"),
            (3, "no overlap with anything else at all"),
        ],
        ["doc_id", "text"],
    )
    dup = pipeline.duplicated_chunks(df, "doc_id", "text", chunk_size=4).collect()
    assert len(dup) == 1
    assert dup[0]["n_docs"] == 2
    assert dup[0]["n_occurrences"] == 2


def test_token_chunks_tail_and_empty(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, ""), (3, None)], ["doc_id", "text"]
    )
    ch = pipeline.token_chunks(df, "doc_id", "text", chunk_size=4).collect()
    # 6 tokens → chunk [a b c d] + tail chunk [e f]; empty/null docs emit none
    assert {(r["doc_id"], r["chunk_idx"]) for r in ch} == {(1, 0), (1, 1)}


# ---------------------------------------------------------------------------
# PII scrub
# ---------------------------------------------------------------------------


def test_scrub_pii_redacts_all_categories(spark):
    raw = (
        "mail me at alice.smith+x@example.co.uk or call 415-555-1234; "
        "ssn 123-45-6789, server at 10.0.42.7 ok"
    )
    df = spark.createDataFrame([(1, raw)], ["doc_id", "text"])
    row = df.select(
        text.scrub_pii(F.col("text")).alias("clean"), *text.pii_counts(F.col("text"))
    ).first()
    assert "<EMAIL>" in row["clean"] and "example" not in row["clean"]
    assert "<SSN>" in row["clean"] and "123-45-6789" not in row["clean"]
    assert "<PHONE>" in row["clean"] and "415-555-1234" not in row["clean"]
    assert "<IP>" in row["clean"] and "10.0.42.7" not in row["clean"]
    assert (row["n_email"], row["n_ssn"], row["n_phone"], row["n_ipv4"]) == (1, 1, 1, 1)


def test_scrub_pii_leaves_clean_text_and_null(spark):
    df = spark.createDataFrame(
        [(1, "perfectly ordinary sentence with numbers 12 34"), (2, None)],
        ["doc_id", "text"],
    )
    rows = df.select(
        "doc_id", text.scrub_pii(F.col("text")).alias("clean"), *text.pii_counts(F.col("text"))
    ).orderBy("doc_id").collect()
    assert rows[0]["clean"] == "perfectly ordinary sentence with numbers 12 34"
    assert rows[0]["n_email"] == 0
    assert rows[1]["clean"] is None
    assert rows[1]["n_email"] is None  # NULL text → NULL counts, not 0


# ---------------------------------------------------------------------------
# centroids + histogram
# ---------------------------------------------------------------------------


def test_label_centroids_exact(spark):
    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 7),
            (2, [3.0, 2.0], 7),
            (3, [10.0, 10.0], 8),
        ],
        ["vec_id", "embedding", "label"],
    )
    rows = similarity.label_centroids(df).orderBy("label", "pos").collect()
    got = [(r["label"], r["pos"], r["centroid"], r["n_vectors"]) for r in rows]
    assert got == [(7, 0, 2.0, 2), (7, 1, 1.0, 2), (8, 0, 10.0, 1), (8, 1, 10.0, 1)]


def test_length_histogram_buckets(spark):
    df = spark.createDataFrame(
        [(1, 50), (2, 250), (3, 250), (4, 5000)], ["doc_id", "n_chars"]
    )
    rows = pipeline.length_histogram(df, "n_chars", 200, 10).orderBy("bucket").collect()
    by_bucket = {r["bucket"]: r for r in rows}
    assert by_bucket[0]["n_docs"] == 1
    assert by_bucket[1]["n_docs"] == 2 and by_bucket[1]["avg_len"] == 250.0
    assert by_bucket[9]["n_docs"] == 1  # overflow clamps to the top bucket


# ---------------------------------------------------------------------------
# connected components (dedup cluster assignment)
# ---------------------------------------------------------------------------


def test_connected_components_chain_and_clique(spark):
    from muninn_avro_to_parquet_spark.operators import dedup

    # chain 1-2-3-4 (diameter 3, needs >1 propagation round), clique 10-11-12,
    # isolated pair (20, 21)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        ["id_a", "id_b"],
    )
    got = {
        r["node"]: r["component_id"]
        for r in dedup.connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_connected_components_long_chain_no_driver_blowup(spark):
    """r9 regression pin: a thin path graph forces ~8+ propagation
    rounds, the regime where Spark 4's Dataset.checkpoint stats-rewrite
    chain (LogicalRDD.rewriteStatsAndConstraints thunks over the origin
    plan, referenced ~3x per round) grew the DRIVER-side checkpoint call
    ~3x per round — a 62k-edge graph took 116 s with jobs at 0.1 s. The
    parquet barrier every _BARRIER_EVERY rounds keeps rounds flat; this
    chain completed in ~8 s post-fix and minutes pre-fix."""
    import time

    from muninn_avro_to_parquet_spark.operators import dedup

    n = 4000
    pairs = spark.range(n - 1).selectExpr("id as id_a", "id + 1 as id_b")
    t0 = time.perf_counter()
    got = dedup.connected_components(pairs)
    assert got.filter("component_id != 0").count() == 0
    assert got.count() == n
    # generous bound: pre-fix this exceeded 10 minutes; post-fix ~8 s.
    # The margin absorbs shared-box noise while still failing on any
    # reintroduced exponential.
    assert time.perf_counter() - t0 < 120


def test_connected_components_max_iterations_guard(spark):
    from muninn_avro_to_parquet_spark.operators import dedup

    # a long chain with max_iterations=1 must still return SOME assignment
    # for every node (partial convergence), never hang or drop nodes
    pairs = spark.createDataFrame([(i, i + 1) for i in range(8)], ["id_a", "id_b"])
    rows = dedup.connected_components(pairs, max_iterations=1).collect()
    assert len(rows) == 9


def test_grouped_value_stats_edges(spark):
    """applyInPandas order stats: odd group (doubled median = 2x middle),
    even group (sum of middles), negative values floor toward -inf."""
    import pandas as pd

    from muninn_avro_to_parquet_spark.operators import udaf

    df = spark.createDataFrame(
        [("a", 1.5), ("a", -2.25), ("a", 0.5), ("b", 4.0), ("b", 1.0)],
        "k string, v double",
    )
    got = {
        r["k"]: r.asDict()
        for r in udaf.grouped_value_stats(df, "k", "v").collect()
    }
    assert got["a"]["n"] == 3
    assert got["a"]["median_micros_x2"] == 2 * 500_000
    assert got["a"]["min_micros"] == -2_250_000
    assert got["a"]["max_micros"] == 1_500_000
    assert got["b"]["median_micros_x2"] == 1_000_000 + 4_000_000


def test_sample_token_budget_maximal_prefix(spark):
    """Kept set per stratum = the greedy hash-ordered prefix that stays
    within the token budget (strict: stops at the first doc that would
    cross it)."""
    from pyspark.sql import functions as F

    from muninn_avro_to_parquet_spark.operators import pipeline, text

    docs = spark.createDataFrame(
        [(i, "web" if i % 2 else "code", "tok " * (5 + i % 7)) for i in range(60)],
        "doc_id long, source string, text string",
    )
    budget = 40
    kept_ids = {
        r["doc_id"] for r in pipeline.sample_token_budget(docs, budget).collect()
    }
    ordered = (
        docs.select(
            "doc_id",
            "source",
            F.coalesce(text.token_count(F.col("text")), F.lit(0)).alias("n"),
            pipeline.hash_bucket_prefix(F.col("doc_id"), "budget-v1").alias("h"),
        )
        .orderBy("source", "h", "doc_id")
        .collect()
    )
    expected, cum, stopped = set(), {}, set()
    for r in ordered:
        src = r["source"]
        if src in stopped:
            continue
        if cum.get(src, 0) + r["n"] <= budget:
            cum[src] = cum.get(src, 0) + r["n"]
            expected.add(r["doc_id"])
        else:
            stopped.add(src)
    assert expected, "budget should admit at least one doc"
    assert kept_ids == expected


def test_chunk_documents_exact_chunks(spark):
    from muninn_avro_to_parquet_spark.operators import pipeline

    text_val = "abcdefghij" * 12  # 120 chars
    docs = spark.createDataFrame(
        [(1, text_val), (2, "short"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    rows = pipeline.chunk_documents(docs, chunk_chars=50, overlap=10).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: starts at 1, 41, 81 (step 40); last chunk shorter
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_index"])
    assert [r["char_start"] for r in c1] == [1, 41, 81]
    assert c1[0]["chunk_text"] == text_val[0:50]
    assert c1[1]["chunk_text"] == text_val[40:90]
    assert c1[2]["chunk_text"] == text_val[80:120]
    # consecutive chunks overlap by exactly `overlap` chars
    assert c1[0]["chunk_text"][-10:] == c1[1]["chunk_text"][:10]
    # short doc → one chunk, empty/null docs → no rows
    assert [r["chunk_text"] for r in by_doc[2]] == ["short"]
    assert 3 not in by_doc and 4 not in by_doc


def test_chunk_documents_reassembly_property(spark):
    """Property: dropping each chunk's leading overlap and concatenating
    in order reconstructs the document exactly — no character lost or
    duplicated at any boundary, for any text length."""
    from hypothesis import given, settings, strategies as st

    from muninn_avro_to_parquet_spark.operators import pipeline

    @settings(max_examples=12, deadline=None)
    @given(
        st.text(alphabet="abZ 9é漢", min_size=1, max_size=300),
        st.integers(min_value=2, max_value=40),
        st.integers(min_value=0, max_value=20),
    )
    def check(text_val, chunk_chars, overlap):
        if overlap >= chunk_chars:
            return
        docs = spark.createDataFrame([(1, text_val)], "doc_id long, text string")
        rows = sorted(
            pipeline.chunk_documents(docs, chunk_chars, overlap).collect(),
            key=lambda r: r["chunk_index"],
        )
        rebuilt = rows[0]["chunk_text"] + "".join(
            r["chunk_text"][overlap:] for r in rows[1:]
        )
        assert rebuilt == text_val

    check()


def test_sample_exact_n_counts_and_determinism(spark):
    from pyspark.sql import functions as F

    from muninn_avro_to_parquet_spark.operators import pipeline

    docs = spark.createDataFrame(
        [(i, "big" if i < 80 else "tiny") for i in range(90)],
        "doc_id long, source string",
    )
    out = pipeline.sample_exact_n(docs, 25, stratum_col="source")
    counts = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts == {"big": 25, "tiny": 10}  # small stratum kept whole
    # deterministic: same ids across invocations
    ids1 = sorted(r["doc_id"] for r in out.collect())
    ids2 = sorted(r["doc_id"] for r in pipeline.sample_exact_n(docs, 25, stratum_col="source").collect())
    assert ids1 == ids2


def test_sample_weighted_bounds_and_monotonicity(spark):
    """weight 0 drops everything, weight >= 1 keeps everything, and the
    kept set at a lower weight is a subset of the kept set at a higher
    weight (same salt → same hash → nested thresholds)."""
    from muninn_avro_to_parquet_spark.operators import pipeline as P

    df = spark.range(2000).withColumnRenamed("id", "doc_id")
    zero = P.sample_weighted(df.withColumn("w", F.lit(0.0)), "doc_id", "w")
    one = P.sample_weighted(df.withColumn("w", F.lit(1.0)), "doc_id", "w")
    lo = P.sample_weighted(df.withColumn("w", F.lit(0.2)), "doc_id", "w")
    hi = P.sample_weighted(df.withColumn("w", F.lit(0.6)), "doc_id", "w")
    assert zero.count() == 0
    assert one.count() == 2000
    lo_ids = {r["doc_id"] for r in lo.collect()}
    hi_ids = {r["doc_id"] for r in hi.collect()}
    assert lo_ids <= hi_ids
    # keep rates near the requested probabilities (16-bit uniform hash)
    assert abs(len(lo_ids) / 2000 - 0.2) < 0.05
    assert abs(len(hi_ids) / 2000 - 0.6) < 0.05


def test_leakage_safe_split_clusters_colocated(spark):
    """Every member of a pair-connected cluster must land in the SAME
    split, and singletons must match the plain per-id assignment."""
    docs = spark.createDataFrame(
        [(i,) for i in range(200)], "doc_id long"
    )
    # two clusters: {0,1,2,3} (chain) and {10,11}; everything else singleton
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    out = pipeline.assign_split_leakage_safe(docs, "doc_id", pairs)
    rows = {r["doc_id"]: (r["split_key"], r["split"]) for r in out.collect()}
    assert len(rows) == 200
    # cluster members share key and split
    assert len({rows[i] for i in (0, 1, 2, 3)}) == 1
    assert rows[0][0] == 0  # representative = cluster minimum
    assert len({rows[i] for i in (10, 11)}) == 1
    assert rows[10][0] == 10
    # singletons: identical to the plain hash split of their own id
    plain = {
        r["doc_id"]: r["split"]
        for r in pipeline.assign_split(docs, "doc_id").collect()
    }
    for i in range(20, 200):
        assert rows[i][0] == i
        assert rows[i][1] == plain[i]


def test_sample_to_target_mixture_exact_shape(spark):
    """Binding stratum kept whole; other strata thinned to the target
    ratio; unlisted strata dropped; deterministic across invocations."""
    rows = (
        [(i, "a") for i in range(1000)]
        + [(10_000 + i, "b") for i in range(300)]
        + [(20_000 + i, "c") for i in range(500)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string")
    # target 1:1 between a and b -> b (300 per unit) binds; a thins to ~300
    out = pipeline.sample_to_target_mixture(
        df, "doc_id", "source", {"a": 1, "b": 1}
    )
    counts = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert "c" not in counts  # unlisted stratum dropped
    assert counts["b"] == 300  # binding stratum kept whole
    assert abs(counts["a"] - 300) < 40  # 16-bit hash thinning tolerance
    ids1 = sorted(r["doc_id"] for r in out.collect())
    ids2 = sorted(
        r["doc_id"]
        for r in pipeline.sample_to_target_mixture(
            df, "doc_id", "source", {"a": 1, "b": 1}
        ).collect()
    )
    assert ids1 == ids2


def test_sample_to_target_mixture_validates_weights(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    with pytest.raises(ValueError):
        pipeline.sample_to_target_mixture(df, "doc_id", "source", {})
    with pytest.raises(ValueError):
        pipeline.sample_to_target_mixture(df, "doc_id", "source", {"a": 0})


def test_fuzzy_pairs_blocked_matches_and_guard(spark):
    from muninn_avro_to_parquet_spark.operators import dedup

    df = spark.createDataFrame(
        [
            (1, "red gear"),
            (2, "red bear"),   # distance 1 from "red gear"? g->b = 1
            (3, "red widget"),
            (4, "blue gear"),  # different block: never compared to red *
            (5, "blue gearz"),
        ],
        "id long, name string",
    )
    out = dedup.fuzzy_pairs_blocked(df, "id", "name", max_distance=2)
    pairs = {(r["id_a"], r["id_b"]): r["distance"] for r in out.collect()}
    assert pairs[(1, 2)] == 1
    assert pairs[(4, 5)] == 1
    assert (1, 4) not in pairs  # cross-block pair, even though distance 1
    assert (1, 3) not in pairs  # same block but distance > 2
    # max_block guard: cap of 1 drops every block with >1 member
    assert (
        dedup.fuzzy_pairs_blocked(df, "id", "name", max_distance=2, max_block=1).count()
        == 0
    )


def test_fuzzy_regimes_row_identical(spark):
    """rows / values / auto regimes are the same relation (r15
    optimization round): the values regime scores the DP once per
    distinct (block, text_a, text_b) and expands back onto id pairs, so
    on a value-repeating corpus (the shape that regime exists for) the
    output multiset must match the row-pair scorer exactly — including
    duplicate texts within a block (distance-0 pairs) and the
    ``id_a < id_b`` orientation."""
    from muninn_avro_to_parquet_spark.operators import dedup

    rows = []
    names = ["red gear", "red bear", "red gearz", "blue bolt", "blue boltz"]
    for i in range(60):  # every name repeated 12x: auto must pick values
        rows.append((i, names[i % len(names)]))
    df = spark.createDataFrame(rows, "id long, name string")
    by_rows = dedup.fuzzy_pairs_blocked(df, "id", "name", 2, regime="rows")
    by_vals = dedup.fuzzy_pairs_blocked(df, "id", "name", 2, regime="values")
    auto = dedup.fuzzy_pairs_blocked(df, "id", "name", 2, regime="auto")
    base = sorted(map(tuple, by_rows.collect()))
    assert sorted(map(tuple, by_vals.collect())) == base
    assert sorted(map(tuple, auto.collect())) == base
    assert len(base) > 0
    # multipass too, both regimes pinned against each other
    m_rows = dedup.fuzzy_pairs_multipass(df, "id", "name", 2, regime="rows")
    m_vals = dedup.fuzzy_pairs_multipass(df, "id", "name", 2, regime="values")
    assert sorted(map(tuple, m_vals.collect())) == sorted(
        map(tuple, m_rows.collect())
    )
    with pytest.raises(ValueError):
        dedup.fuzzy_pairs_blocked(df, "id", "name", 2, regime="bogus")


def test_filter_top_fraction_ceil_and_ties(spark):
    """Kept count per stratum is ceil(n*ppm/1e6) with at least one row;
    ranking is (score DESC, id ASC) so ties resolve to smaller ids."""
    rows = [(i, "a", float(i % 5)) for i in range(10)] + [(100, "b", 1.0)]
    df = spark.createDataFrame(rows, "doc_id long, source string, score double")
    out = pipeline.filter_top_fraction(df, "score", "source", 300_000, "doc_id")
    got = sorted((r["source"], r["doc_id"]) for r in out.collect())
    # stratum a: n=10, ceil(3.0)=3 kept -> scores 4.0 (ids 4,9) then tie at
    # 3.0 between ids 3,8 -> id 3 wins
    # stratum b: n=1 -> ceil(0.3)=1 kept
    assert got == [("a", 3), ("a", 4), ("a", 9), ("b", 100)]
    with pytest.raises(ValueError):
        pipeline.filter_top_fraction(df, "score", "source", 0, "doc_id")


def test_source_overlap_matrix_exact(spark):
    from muninn_avro_to_parquet_spark.operators import dedup

    df = spark.createDataFrame(
        [
            (1, "s1", "alpha beta gamma delta"),   # shingles: abc, bcd
            (2, "s2", "alpha beta gamma epsilon"), # shingles: abc, bce
            (3, "s3", "one two three"),            # shingle: ott
        ],
        "doc_id long, source string, text string",
    )
    out = {
        (r["stratum_a"], r["stratum_b"]): r
        for r in dedup.source_overlap_matrix(df, "source").collect()
    }
    # s1 and s2 share exactly the "alpha beta gamma" shingle
    r = out[("s1", "s2")]
    assert (r["n_shared"], r["n_a"], r["n_b"]) == (1, 2, 2)
    assert abs(r["jaccard"] - 1 / 3) < 1e-12
    # s3 shares nothing -> no row at all
    assert ("s1", "s3") not in out and ("s2", "s3") not in out


def test_write_training_shards_roundtrip_and_manifest(spark, tmp_path):
    """Shards balance, the manifest certifies what's on disk, shard
    membership is deterministic across rebuilds, and a rank-restricted
    read prunes to its shard dirs."""
    import json

    out = str(tmp_path / "shards")
    df = spark.range(0, 5000).withColumnRenamed("id", "doc_id").withColumn(
        "n_tokens", (F.col("doc_id") % 7 + 1).cast("long")
    )
    manifest = pipeline.write_training_shards(
        df, out, "doc_id", n_shards=8, token_count_col="n_tokens"
    )
    assert [m["shard"] for m in manifest] == list(range(8))
    assert sum(m["n_rows"] for m in manifest) == 5000
    total_tokens = df.agg(F.sum("n_tokens")).collect()[0][0]
    assert sum(m["n_tokens"] for m in manifest) == total_tokens
    # balance: 16-bit hash across 8 shards
    assert max(m["n_rows"] for m in manifest) < 5000 / 8 * 1.2
    on_disk = json.loads(open(f"{out}/_MANIFEST.json").read())
    assert on_disk["shards"] == manifest
    # roundtrip + determinism across a rebuild
    back = pipeline.read_training_shards(spark, out)
    assert back.count() == 5000
    first = {r["doc_id"]: r["shard"] for r in back.select("doc_id", "shard").collect()}
    pipeline.write_training_shards(df, out, "doc_id", n_shards=8, token_count_col="n_tokens")
    again = {
        r["doc_id"]: r["shard"]
        for r in pipeline.read_training_shards(spark, out).select("doc_id", "shard").collect()
    }
    assert first == again
    # rank-restricted read: only the named shards come back, and the
    # filter prunes at the partition level (shard= dirs)
    sub = pipeline.read_training_shards(spark, out, shards=[0, 3])
    assert {r["shard"] for r in sub.select("shard").distinct().collect()} == {0, 3}
    plan = sub._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    with pytest.raises(ValueError):
        pipeline.write_training_shards(df, out, "doc_id", n_shards=0)


def test_sample_to_target_mixture_invariants_multi_seed(spark):
    """Across several random count/weight configurations: the binding
    stratum is kept whole, every other stratum's kept count never
    exceeds its exact target share (floor semantics of the integer
    cross-multiplication), and assignments are deterministic."""
    import random

    rng = random.Random(7)
    for trial in range(3):
        strata = [f"s{i}" for i in range(rng.randint(2, 4))]
        counts = {s: rng.randint(50, 800) for s in strata}
        weights = {s: rng.randint(1, 9) for s in strata}
        rows = [
            (i * 10_000 + j, s)
            for i, s in enumerate(strata)
            for j in range(counts[s])
        ]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        out = pipeline.sample_to_target_mixture(df, "doc_id", "source", weights)
        kept = {
            r["source"]: r["n"]
            for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
        }
        binding = min(strata, key=lambda s: (counts[s] * 1_000_000 // weights[s], s))
        assert kept.get(binding, 0) == counts[binding], (trial, binding)
        for s in strata:
            # the hash filter thins to fraction f = (w_s*n_b)/(w_b*n_s);
            # kept counts fluctuate binomially around f*n_s, so assert
            # with a 5-sigma uniformity tolerance, not an exact floor
            f = min(
                1.0,
                (weights[s] * counts[binding])
                / (weights[binding] * counts[s]),
            )
            expected = f * counts[s]
            slack = 5 * (counts[s] ** 0.5) + 1
            assert abs(kept.get(s, 0) - expected) <= slack, (trial, s, kept)
        ids_a = sorted(r["doc_id"] for r in out.collect())
        ids_b = sorted(
            r["doc_id"]
            for r in pipeline.sample_to_target_mixture(
                df, "doc_id", "source", weights
            ).collect()
        )
        assert ids_a == ids_b


def test_training_order_tracks_mixture(spark):
    """Stride scheduling: every prefix of the global order tracks the
    corpus mixture to within ~one example per source, and the order is
    deterministic across invocations."""
    from muninn_avro_to_parquet_spark.operators import pipeline

    rows = [(i, "web") for i in range(60)] + [(100 + i, "code") for i in range(30)] + [
        (200 + i, "books") for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = [
        (r["step"], r["source"], r["doc_id"])
        for r in pipeline.training_order(df, "doc_id", "source")
        .orderBy("step")
        .collect()
    ]
    assert [s for s, _, _ in out] == list(range(1, 101))
    # prefix mixture: at any cut, each source's count is within 1+ratio
    # of its proportional share
    seen = {"web": 0, "code": 0, "books": 0}
    share = {"web": 0.6, "code": 0.3, "books": 0.1}
    for step, src, _ in out:
        seen[src] += 1
        for s in seen:
            assert abs(seen[s] - share[s] * step) <= 1.5, (step, s, seen)
    # no source ever appears 3+ times consecutively (web is 60% → runs of
    # at most 2 under stride scheduling)
    runs = 1
    for prev, cur in zip(out, out[1:]):
        runs = runs + 1 if prev[1] == cur[1] else 1
        assert runs <= 2

    again = [
        (r["step"], r["source"], r["doc_id"])
        for r in pipeline.training_order(df, "doc_id", "source")
        .orderBy("step")
        .collect()
    ]
    assert again == out


def test_training_order_vt_exact_at_10m_rows(spark):
    """The virtual-time expression must survive r = 10^7 (a 100 TB
    training source is billions of examples): in BIGINT the
    (r−1)·10^12 multiply overflows at r ≈ 9.2·10^6 and Spark 4's
    default ANSI mode aborts the whole job (VERDICT r7). The
    DECIMAL(38,0) form must stay exact, injective, and < 10^12 over a
    real 10M-row frame."""
    n = 10_000_000
    df = spark.range(1, n + 1).select(
        F.col("id").alias("_r"), F.lit(n).cast("long").alias("_n")
    )
    agg = (
        df.select(pipeline.virtual_time_expr().alias("vt"))
        .agg(
            F.count("*").alias("n"),
            F.count_distinct("vt").alias("nd"),
            F.min("vt").alias("mn"),
            F.max("vt").alias("mx"),
        )
        .collect()[0]
    )
    assert agg["n"] == n
    assert agg["nd"] == n  # injective: one distinct vt per rank
    assert agg["mn"] == 50_000  # (0·10^12 + 5·10^11) div 10^7
    assert agg["mx"] == 999_999_950_000  # < 10^12: fits BIGINT with 6 nines of headroom

    # and the naive BIGINT form is genuinely the bug the decimal form
    # fixes: under default ANSI it overflows at the same r
    if spark.conf.get("spark.sql.ansi.enabled") == "true":
        bad = F.expr("((_r - 1) * 1000000000000 + 500000000000) div _n")
        with pytest.raises(Exception, match="(?i)overflow"):
            df.filter(F.col("_r") >= 9_300_000).select(bad.alias("vt")).agg(
                F.max("vt")
            ).collect()


def test_temperature_mixture_alpha_error_names_the_value(spark):
    """ADVICE r8: the rejection message used to print the literal
    '{alpha}' instead of the offending value."""
    from muninn_avro_to_parquet_spark.operators import pipeline as pl

    df = spark.createDataFrame([("a", 1)], "source string, x int")
    with pytest.raises(ValueError, match=r"got 0\.3"):
        pl.temperature_mixture_weights(df, "source", alpha=0.3)


def test_broadcast_threshold_parses_unit_suffixes(spark):
    """ADVICE r9: sessions not built by session.py can carry the
    threshold WITH a unit suffix ('10MB', '100m', Spark's canonical
    '10485760b'); the CC broadcast-regime gate must parse them all, and
    fall back to 0 (regime off, shuffle loop — always correct) on junk
    rather than raising."""
    from muninn_avro_to_parquet_spark.operators.dedup import (
        _broadcast_threshold_bytes,
    )

    key = "spark.sql.autoBroadcastJoinThreshold"
    prev = spark.conf.get(key)
    try:
        for raw, want in [
            ("10485760", 10 * 1024 * 1024),
            ("10485760b", 10 * 1024 * 1024),
            ("10MB", 10 * 1024 * 1024),
            ("100m", 100 * 1024 * 1024),
            ("1g", 1 << 30),
            ("64k", 64 * 1024),
            ("-1", -1),
        ]:
            spark.conf.set(key, raw)
            assert _broadcast_threshold_bytes(spark) == want, raw
    finally:
        spark.conf.set(key, prev)

    # junk can't pass spark.conf.set's own validation, but a foreign
    # session wrapper might hand us anything — must degrade to 0, not raise
    class _FakeConf:
        @staticmethod
        def get(k, d=None):
            return "not-a-size"

    class _FakeSpark:
        conf = _FakeConf()

    assert _broadcast_threshold_bytes(_FakeSpark()) == 0


def test_connected_components_with_suffixed_threshold(spark):
    """End-to-end: CC must run (not raise) under a unit-suffixed
    threshold conf, in both the broadcast and the shuffle regime."""
    from muninn_avro_to_parquet_spark.operators import dedup

    key = "spark.sql.autoBroadcastJoinThreshold"
    prev = spark.conf.get(key)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    try:
        for raw in ("10MB", "0b"):
            spark.conf.set(key, raw)
            comp = {
                (r["node"], r["component_id"])
                for r in dedup.connected_components(pairs).collect()
            }
            assert comp == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}
    finally:
        spark.conf.set(key, prev)


def test_sample_priority_exact_n_weighted_and_deterministic(spark):
    """Priority sampling: exact output size, reproducible draw, weight
    monotonicity in expectation (heavier rows selected more often
    across disjoint salts), TakeOrderedAndProject plan (never a global
    sort), stratified form exact per stratum, loud failure on
    non-positive weights."""
    import pytest as _pytest

    from muninn_avro_to_parquet_spark.operators import pipeline as pl

    df = spark.range(400).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 200, 9).otherwise(1).alias("w"),
        (F.col("id") % 2).alias("s"),
    )
    out = pl.sample_priority(df, n=50, weight_col="w")
    rows = out.collect()
    assert len(rows) == 50
    assert rows == pl.sample_priority(df, n=50, weight_col="w").collect()
    # heavy rows (w=9, half the corpus) should dominate the sample in
    # aggregate across several independent draws
    heavy = 0
    for salt in ("a", "b", "c"):
        heavy += (
            pl.sample_priority(df, n=50, weight_col="w", salt=salt)
            .filter(F.col("doc_id") < 200)
            .count()
        )
    assert heavy > 110, heavy  # E[heavy] ≈ 3 * 50 * 0.9
    plan = (
        pl.sample_priority(df, n=50, weight_col="w")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    per = (
        pl.sample_priority(df, n=10, weight_col="w", stratum_col="s")
        .groupBy("s")
        .count()
        .collect()
    )
    assert {r["count"] for r in per} == {10}
    with _pytest.raises(ValueError, match="positive"):
        pl.sample_priority(
            df.withColumn("w", F.col("w") - 9), n=5, weight_col="w"
        )


def test_select_token_budget_prefix_semantics_and_distribution(spark):
    """Budget selection keeps exactly the maximal (quality desc, id)
    prefix whose cumulative tokens fit; a huge row mid-order blocks
    everything after it (prefix, not best-fit); result is identical
    under any input partitioning; plan has no single-task window."""
    from muninn_avro_to_parquet_spark.operators import pipeline as pl

    rows = [
        (1, 90, 10), (2, 80, 10), (3, 70, 1000), (4, 60, 5), (5, 50, 1),
    ]
    df = spark.createDataFrame(rows, "doc_id long, quality long, n_tokens long")
    got = {
        r["doc_id"]: r["cum_tokens"]
        for r in pl.select_token_budget(
            df, budget=25, quality_col="quality", tokens_col="n_tokens"
        ).collect()
    }
    # 10 + 10 fit; doc 3 (1000 tokens) blows the budget and, being a
    # prefix rule, nothing after it enters either
    assert got == {1: 10, 2: 20}
    again = {
        r["doc_id"]: r["cum_tokens"]
        for r in pl.select_token_budget(
            df.repartition(7), budget=25, quality_col="quality",
            tokens_col="n_tokens",
        ).collect()
    }
    assert again == got
    import pytest as _pytest

    with _pytest.raises(ValueError, match="budget"):
        pl.select_token_budget(df, -1, "quality", "n_tokens")


def test_select_token_budget_per_stratum(spark):
    """stratum_col applies the budget PER stratum (the mixture form) —
    each source independently keeps its best-quality prefix."""
    from muninn_avro_to_parquet_spark.operators import pipeline as pl

    rows = [
        ("web", 1, 9, 10), ("web", 2, 8, 10), ("web", 3, 7, 10),
        ("code", 4, 9, 15), ("code", 5, 8, 15),
    ]
    df = spark.createDataFrame(
        rows, "src string, doc_id long, quality long, n_tokens long"
    )
    got = {
        (r["src"], r["doc_id"]): r["cum_tokens"]
        for r in pl.select_token_budget(
            df, budget=20, quality_col="quality", tokens_col="n_tokens",
            stratum_col="src",
        ).collect()
    }
    assert got == {("web", 1): 10, ("web", 2): 20, ("code", 4): 15}


def test_sample_priority_rejects_existing_priority_column(spark):
    """ADVICE r13: the public 'priority' output must not silently
    overwrite a caller's pre-existing column of the same name."""
    from muninn_avro_to_parquet_spark.operators import pipeline as pl

    df = spark.createDataFrame(
        [(1, 2, 99)], "doc_id long, w long, priority long"
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="'priority'"):
        pl.sample_priority(df, n=1, weight_col="w", id_col="doc_id")


def test_select_token_budget_rejects_null_and_negative_tokens(spark):
    """ADVICE r13: a NULL token count would silently inherit the
    previous cumulative sum (window SUM skips NULLs) and a negative
    count breaks the monotone-prefix contract — both fail eagerly,
    mirroring sample_priority's weight validation."""
    from muninn_avro_to_parquet_spark.operators import pipeline as pl

    import pytest as _pytest

    with_null = spark.createDataFrame(
        [(1, 9, 10), (2, 8, None)], "doc_id long, quality long, n_tokens long"
    )
    with _pytest.raises(ValueError, match="non-negative"):
        pl.select_token_budget(with_null, 100, "quality", "n_tokens")
    negative = spark.createDataFrame(
        [(1, 9, 10), (2, 8, -3)], "doc_id long, quality long, n_tokens long"
    )
    with _pytest.raises(ValueError, match="non-negative"):
        pl.select_token_budget(negative, 100, "quality", "n_tokens")
