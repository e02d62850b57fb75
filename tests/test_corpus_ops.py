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


def test_grouped_row_number_matches_grouped_window(spark):
    """grouped_row_number (range partition on (group, order) + per-(pid,
    group) offsets) must equal Window.partitionBy(group) row_number for
    any per-group total order — including groups far larger than a
    single range partition and groups absent from some partitions."""
    from pyspark.sql import Window, functions as F

    from muninn_avro_to_parquet_spark.operators import text

    df = spark.range(0, 1200).select(
        F.when(F.col("id") < 900, "big")
        .when(F.col("id") < 1190, "mid")
        .otherwise("tiny")
        .alias("src"),
        (F.col("id") % 131).alias("score"),
        F.col("id").cast("string").alias("key"),
    )
    order = [F.col("score").desc(), F.col("key").asc()]
    got = {
        (r["src"], r["score"], r["key"]): r["rank"]
        for r in text.grouped_row_number(
            df, ["src"], *order, num_partitions=7
        ).collect()
    }
    w = Window.partitionBy("src").orderBy(*order)
    want = {
        (r["src"], r["score"], r["key"]): r["rank"]
        for r in df.withColumn("rank", F.row_number().over(w)).collect()
    }
    assert got == want


def test_gopher_features_rules(spark):
    good = "the cat and the dog have fun with all of the things that " + " ".join(
        ["word"] * 60
    )
    df = spark.createDataFrame(
        [
            (1, good),                                  # passes everything
            (2, "short text only"),                     # fails word count
            (3, "- bullet\n- bullet\n- bullet"),        # bullet-led lines
            (4, "trails off...\nand again...\nmore..."),  # ellipsis lines
            (5, "#### " + " ".join(["x"] * 60) + " ####"),  # symbol-heavy
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in text.gopher_features(df).collect()}
    assert rows[1]["passes_gopher"]
    assert rows[1]["stop_hits"] >= 2 and rows[1]["ok_word_count"]
    assert not rows[2]["ok_word_count"] and not rows[2]["passes_gopher"]
    assert rows[3]["bullet_ratio"] == 1.0 and not rows[3]["ok_bullets"]
    assert rows[4]["ellipsis_ratio"] == 1.0 and not rows[4]["ok_ellipses"]
    assert rows[5]["symbol_ratio"] > 0.1 and not rows[5]["ok_symbols"]


def test_unigram_rarity_scores(spark):
    df = spark.createDataFrame(
        [
            (1, "common common common"),
            (2, "common rareword"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in text.unigram_rarity(df, "doc_id").collect()}
    # corpus counts: common=4, rareword=1
    assert rows[1]["n_tokens"] == 3 and rows[1]["mean_token_freq"] == 4.0
    assert rows[1]["rare_ratio"] == 0.0
    assert rows[2]["mean_token_freq"] == (4 + 1) / 2
    assert rows[2]["rare_ratio"] == 0.5  # rareword count 1 <= rare_max_count


def test_semantic_dedup_marks_smaller_id_neighbor(spark):
    from muninn_avro_to_parquet_spark.operators import similarity

    # two tight groups + one isolated vector; 2 clusters
    vecs = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.99, 0.01, 0.0, 0.0]),   # near-dup of 1
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [0.01, 0.99, 0.0, 0.0]),   # near-dup of 3
        (5, [0.0, 0.0, 1.0, 0.0]),     # isolated
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = {
        r["vec_id"]: r
        for r in similarity.semantic_dedup(df, num_clusters=4, threshold=0.9).collect()
    }
    assert set(out) == {1, 2, 3, 4, 5}
    # the smaller id of each similar pair is kept; the larger is the dup —
    # IF the pair landed in the same cluster (seeded centroids; with 4
    # centroids over 5 points at least one pair shares a cluster)
    dups = {i for i, r in out.items() if r["is_dup"]}
    keeps = {i for i, r in out.items() if not r["is_dup"]}
    assert 1 in keeps and 3 in keeps and 5 in keeps  # smaller ids / isolated never dup
    assert dups <= {2, 4}
    for d in dups:
        partner = d - 1
        assert out[d]["centroid_id"] == out[partner]["centroid_id"]


def test_minhash_verified_equals_jaccard_restricted_to_candidates(spark):
    """Invariant: the two-stage pipeline returns EXACTLY the jaccard_pairs
    result restricted to the LSH candidate set — verification changes
    where the work happens, never the answer."""
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    docs = []
    for i in range(40):
        docs.append((i, " ".join(rng.choices(vocab, k=12))))
    for i in range(40, 50):  # exact + near duplicates of earlier docs
        base = docs[i - 40][1].split()
        if i % 2:
            base[3] = "mutated"
        docs.append((i, " ".join(base)))
    df = spark.createDataFrame(docs, "doc_id long, text string")

    kw = dict(num_hashes=8, bands=4)
    cand = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_candidate_pairs(df, "doc_id", **kw).collect()
    }
    jacc = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.jaccard_pairs(df, "doc_id", n=3, threshold=0.5).collect()
    }
    verified = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.minhash_verified_pairs(
            df, "doc_id", n=3, threshold=0.5, **kw
        ).collect()
    }
    expected = {p: j for p, j in jacc.items() if p in cand}
    assert verified == expected
    assert verified, "fixture must produce at least one verified near-dup"


def test_gopher_features_consistency(spark):
    """Cross-checks against independently computed features on random
    text: n_words matches token_count, ratios stay in [0, 1], and the
    verdict equals the conjunction of its flags."""
    import random

    rng = random.Random(11)
    pieces = ["the quick fox", "### ###", "- item", "...", "plain words here", "42"]
    docs = [
        (i, "\n".join(rng.choices(pieces, k=rng.randint(1, 6))))
        for i in range(30)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    feats = text.gopher_features(df).collect()
    toks = {
        r["doc_id"]: r["n"]
        for r in df.select("doc_id", text.token_count(F.col("text")).alias("n")).collect()
    }
    flag_cols = [
        "ok_word_count", "ok_word_len", "ok_symbols", "ok_bullets",
        "ok_ellipses", "ok_alpha", "ok_stopwords",
    ]
    for r in feats:
        assert r["n_words"] == toks[r["doc_id"]]
        for c in ["symbol_ratio", "bullet_ratio", "ellipsis_ratio", "alpha_ratio"]:
            if c != "symbol_ratio":  # symbol_ratio is per-word, can exceed 1
                assert 0.0 <= r[c] <= 1.0, (c, r[c])
        assert r["passes_gopher"] == all(r[c] for c in flag_cols)


def test_semantic_dedup_max_cluster_guard(spark):
    """Clusters over the cap are excluded from pairing but their vectors
    stay in the output as non-dups — no silent row drops."""
    from muninn_avro_to_parquet_spark.operators import similarity

    # one big near-dup family (would pair) + one isolated vector
    vecs = [(i, [1.0 - i * 0.001, i * 0.001, 0.0, 0.0]) for i in range(6)]
    vecs.append((99, [0.0, 0.0, 1.0, 0.0]))
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")

    uncapped = {
        r["vec_id"]: r["is_dup"]
        for r in similarity.semantic_dedup(df, num_clusters=2, threshold=0.9).collect()
    }
    capped = {
        r["vec_id"]: r["is_dup"]
        for r in similarity.semantic_dedup(
            df, num_clusters=2, threshold=0.9, max_cluster=3
        ).collect()
    }
    assert set(capped) == set(uncapped) == {0, 1, 2, 3, 4, 5, 99}
    assert any(uncapped.values())  # the family pairs when uncapped
    # the 6-member family exceeds max_cluster=3 → excluded from pairing
    assert not any(capped.values())


def test_candidate_pagerank_star_graph(spark):
    """On a star graph the hub must outrank every leaf, ranks are exact
    integers, and leaves (symmetric positions) get identical ranks."""
    pairs = spark.createDataFrame(
        [(0, i) for i in range(1, 6)] + [(10, 11)],  # star + isolated pair
        "id_a long, id_b long",
    )
    out = {r["node"]: r["rank_micro"] for r in dedup.candidate_pagerank(pairs).collect()}
    assert set(out) == {0, 1, 2, 3, 4, 5, 10, 11}
    hub, leaves = out[0], [out[i] for i in range(1, 6)]
    assert all(hub > l for l in leaves)
    assert len(set(leaves)) == 1  # symmetry → identical integer ranks
    assert out[10] == out[11]     # the pair is symmetric too
    assert all(isinstance(v, int) for v in out.values())


def test_incremental_dedup_equals_batch_and_reuses_bands(spark):
    """Incremental flags over (corpus bands + delta) must reproduce a
    from-scratch run over the union, and the greedy smaller-id rule must
    keep exactly one member of an intra-batch dup group."""
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "completely different corpus text here now"),
        ],
        "doc_id long, text string",
    )
    delta = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta epsilon zeta"),   # dup of corpus 1
            (11, "novel one of a kind fresh content"),     # unique
            (12, "repeated batch text goes right here ok"),
            (13, "repeated batch text goes right here ok"),  # dup of 12
        ],
        "doc_id long, text string",
    )
    corpus_bands = dedup.minhash_bands(
        dedup.minhash_signature(corpus, "doc_id", "text", 8), "doc_id", 8, 4
    )
    out = {
        r["doc_id"]: (r["dup_vs_corpus"], r["dup_in_delta"], r["is_dup"])
        for r in dedup.incremental_dedup_flags(
            delta, corpus_bands, "doc_id", "text", num_hashes=8, bands=4
        ).collect()
    }
    assert out[10] == (True, False, True)
    assert out[11] == (False, False, False)
    assert out[12] == (False, False, False)   # smaller id survives
    assert out[13] == (False, True, True)     # larger id flagged
    # batch equivalence: full-union pair relation implies the same flags
    union = corpus.unionByName(delta)
    pairs = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_candidate_pairs(
            union, "doc_id", "text", num_hashes=8, bands=4
        ).collect()
    }
    corpus_ids = {1, 2}
    for d in (10, 11, 12, 13):
        vs_c = any(
            (a == d and b in corpus_ids) or (b == d and a in corpus_ids)
            for a, b in pairs
        )
        in_d = any(b == d and a not in corpus_ids for a, b in pairs)
        assert out[d] == (vs_c, in_d, vs_c or in_d)


def test_update_dedup_corpus_ledger_lifecycle(spark, tmp_path):
    """Two-batch corpus maintenance: batch-2 dups of KEPT batch-1 docs
    are flagged, dropped docs never enter the ledger, and re-processing
    a batch is idempotent (same flags, no double-append)."""
    bands_dir = str(tmp_path / "bands")
    b1 = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta"),  # intra-batch dup of 1
            (3, "some other first batch content here"),
        ],
        "doc_id long, text string",
    )
    f1 = {
        r["doc_id"]: r["is_dup"]
        for r in dedup.update_dedup_corpus(
            spark, bands_dir, b1, "doc_id", num_hashes=8, bands=4, batch_id="b1"
        ).collect()
    }
    assert f1 == {1: False, 2: True, 3: False}
    b2 = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta epsilon zeta"),  # dup of kept doc 1
            (11, "entirely new second batch material now"),
        ],
        "doc_id long, text string",
    )
    f2 = {
        r["doc_id"]: (r["dup_vs_corpus"], r["is_dup"])
        for r in dedup.update_dedup_corpus(
            spark, bands_dir, b2, "doc_id", num_hashes=8, bands=4, batch_id="b2"
        ).collect()
    }
    assert f2 == {10: (True, True), 11: (False, False)}
    # ledger holds only survivors: 1, 3 from b1; 11 from b2
    ledger_ids = {
        r["doc_id"] for r in spark.read.parquet(bands_dir).select("doc_id").collect()
    }
    assert ledger_ids == {1, 3, 11}
    # idempotent re-process of b2: same flags (no self-collision), ledger unchanged
    f2_again = {
        r["doc_id"]: (r["dup_vs_corpus"], r["is_dup"])
        for r in dedup.update_dedup_corpus(
            spark, bands_dir, b2, "doc_id", num_hashes=8, bands=4, batch_id="b2"
        ).collect()
    }
    assert f2_again == f2
    assert {
        r["doc_id"] for r in spark.read.parquet(bands_dir).select("doc_id").collect()
    } == {1, 3, 11}


def test_fuzzy_multipass_recovers_block_key_typos(spark):
    """A typo in the FIRST token breaks the first-token block but the
    last-token pass recovers the pair; the union dedups pairs found by
    both passes."""
    df = spark.createDataFrame(
        [
            (1, "red gear"),
            (2, "rad gear"),    # first-token typo: only last-token pass pairs it
            (3, "red gearz"),   # same first token: first pass pairs with 1
        ],
        "id long, name string",
    )
    single = {
        (r["id_a"], r["id_b"])
        for r in dedup.fuzzy_pairs_blocked(df, "id", "name", max_distance=2).collect()
    }
    multi = {
        (r["id_a"], r["id_b"]): r["distance"]
        for r in dedup.fuzzy_pairs_multipass(df, "id", "name", max_distance=2).collect()
    }
    assert (1, 2) not in single          # lost by single-pass blocking
    assert multi[(1, 2)] == 1            # recovered by the last-token pass
    assert multi[(1, 3)] == 1
    assert single <= set(multi)          # multipass is a superset
    # dedup across passes: (2, 3) shares NO block ("rad" vs "red", "gear"
    # vs "gearz") so it must not appear even though distance is 2
    assert (2, 3) not in multi


# ---------------------------------------------------------------------------
# BPE merge learning (operators/bpe.py)
# ---------------------------------------------------------------------------


def _ref_bpe(texts, num_merges):
    """In-memory reference BPE (Sennrich-style greedy merges) with the
    operator's tie-break — the independent implementation the distributed
    window-algebra version must match exactly."""
    import re
    from collections import Counter

    wf = Counter()
    for t in texts:
        wf.update(w for w in re.sub(r"[^a-z0-9一-鿿 ]", " ", t.lower()).split() if w)
    vocab = {w: list(w) for w in wf}
    merges = []
    for k in range(1, num_merges + 1):
        pc = Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += wf[w]
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((k, a, b, cnt))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


def test_bpe_matches_reference_including_equal_runs(spark):
    """learn_bpe reproduces the sequential reference merge-for-merge —
    including the greedy even-offset behavior on equal-symbol runs
    ('aaaa' with merge (a,a) → (aa, aa), not (aa, a, a))."""
    from muninn_avro_to_parquet_spark.operators import bpe

    texts = [
        "the cat sat on the mat",
        "the hat and the bat",
        "aaaa aaa banana bandana",
        "low lower lowest new newer",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    expected, _ = _ref_bpe(texts, 8)
    got = [
        (r["merge_rank"], r["left_sym"], r["right_sym"], r["pair_count"])
        for r in bpe.learn_bpe(df, num_merges=8).orderBy("merge_rank").collect()
    ]
    assert got == expected


def _ref_bpe_batched(texts, rounds, batch_size, slice_factor=8):
    """In-memory reference for BATCHED BPE: per round, rank pairs by
    (count desc, left, right) over the top batch·slice slice, keep pairs
    whose both symbols first appear at their own rank (the conservative
    disjoint rule), cap to batch_size, then apply all selected merges in
    one greedy left-to-right scan."""
    import re
    from collections import Counter

    wf = Counter()
    for t in texts:
        wf.update(w for w in re.sub(r"[^a-z0-9一-鿿 ]", " ", t.lower()).split() if w)
    vocab = {w: list(w) for w in wf}
    out_merges = []
    rank = 0
    for rnd in range(1, rounds + 1):
        pc = Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += wf[w]
        if not pc:
            break
        ranked = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        ranked = ranked[: batch_size * slice_factor]
        first: dict[str, int] = {}
        for rk, ((a, b), _) in enumerate(ranked, 1):
            first.setdefault(a, rk)
            first.setdefault(b, rk)
        sel = [
            (a, b, cnt)
            for rk, ((a, b), cnt) in enumerate(ranked, 1)
            if first[a] == rk and first[b] == rk
        ][:batch_size]
        for i, (a, b, cnt) in enumerate(sel, 1):
            rank += 1
            out_merges.append((rank, rnd, a, b, cnt))
        pairs = {(a, b) for a, b, _ in sel}
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) in pairs:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return out_merges, vocab


def test_bpe_batched_matches_reference(spark):
    """learn_bpe_batched reproduces the batched reference round-for-round
    (disjoint selection + one-pass batch apply, incl. equal-symbol runs)."""
    from muninn_avro_to_parquet_spark.operators import bpe

    texts = [
        "the cat sat on the mat the hat",
        "aaaa aaa banana bandana cabana",
        "low lower lowest new newer newest",
        "she sells sea shells by the sea shore",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    expected, ref_vocab = _ref_bpe_batched(texts, rounds=4, batch_size=4)
    got = [
        (r["merge_rank"], r["round_idx"], r["left_sym"], r["right_sym"], r["pair_count"])
        for r in bpe.learn_bpe_batched(df, rounds=4, batch_size=4)
        .orderBy("merge_rank")
        .collect()
    ]
    assert got == expected

    # the final segmentation matches the reference's vocabulary too
    _, seq = bpe.learn_bpe_batched(df, rounds=4, batch_size=4, return_final_seq=True)
    from muninn_avro_to_parquet_spark.operators.bpe import _pieces

    pieces = {r["word"]: list(r["pieces"]) for r in _pieces(seq).collect()}
    assert pieces == ref_vocab


def _ref_bpe_batched_greedy(texts, rounds, batch_size, slice_factor=8):
    """Greedy variant of the batched reference: scan the ranked slice in
    order, keep a pair iff its symbols are untouched by earlier KEEPS
    (not merely earlier appearances), cap to batch_size."""
    import re
    from collections import Counter

    wf = Counter()
    for t in texts:
        wf.update(w for w in re.sub(r"[^a-z0-9一-鿿 ]", " ", t.lower()).split() if w)
    vocab = {w: list(w) for w in wf}
    out_merges = []
    rank = 0
    for rnd in range(1, rounds + 1):
        pc = Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += wf[w]
        if not pc:
            break
        ranked = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        ranked = ranked[: batch_size * slice_factor]
        used: set[str] = set()
        sel = []
        for (a, b), cnt in ranked:
            if a in used or b in used:
                continue
            sel.append((a, b, cnt))
            used.add(a)
            used.add(b)
            if len(sel) >= batch_size:
                break
        for a, b, cnt in sel:
            rank += 1
            out_merges.append((rank, rnd, a, b, cnt))
        pairs = {(a, b) for a, b, _ in sel}
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) in pairs:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return out_merges, vocab


def test_bpe_batched_greedy_matches_reference(spark):
    """selection='greedy' reproduces the greedy batched reference — and
    selects at least as many merges per round as the conservative rule."""
    from muninn_avro_to_parquet_spark.operators import bpe

    texts = [
        "the cat sat on the mat the hat",
        "aaaa aaa banana bandana cabana",
        "low lower lowest new newer newest",
        "she sells sea shells by the sea shore",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    expected, _ = _ref_bpe_batched_greedy(texts, rounds=4, batch_size=4)
    got = [
        (r["merge_rank"], r["round_idx"], r["left_sym"], r["right_sym"], r["pair_count"])
        for r in bpe.learn_bpe_batched(
            df, rounds=4, batch_size=4, selection="greedy"
        )
        .orderBy("merge_rank")
        .collect()
    ]
    assert got == expected
    conservative, _ = _ref_bpe_batched(texts, rounds=4, batch_size=4)
    assert len(got) >= len(conservative)


def test_bpe_batched_batch1_equals_sequential(spark):
    """batch_size=1 degenerates to sequential learn_bpe exactly — the
    conservative disjoint rule always admits the argmax pair."""
    from muninn_avro_to_parquet_spark.operators import bpe

    texts = ["the cat sat on the mat", "aaaa aaa bb aab"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    seq_merges = [
        (r["merge_rank"], r["left_sym"], r["right_sym"], r["pair_count"])
        for r in bpe.learn_bpe(df, num_merges=6).orderBy("merge_rank").collect()
    ]
    batched = [
        (r["merge_rank"], r["left_sym"], r["right_sym"], r["pair_count"])
        for r in bpe.learn_bpe_batched(df, rounds=6, batch_size=1)
        .orderBy("merge_rank")
        .collect()
    ]
    assert batched == seq_merges


def test_bpe_segment_words_matches_reference(spark):
    """segment_words applies learned merges per vocabulary entry and
    yields the reference's final subword split for every word."""
    from muninn_avro_to_parquet_spark.operators import bpe

    texts = ["banana bandana", "low lower", "aaaa aa"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges, ref_vocab = _ref_bpe(texts, 5)
    seg = bpe.segment_words(df, [(m[1], m[2]) for m in merges])
    got = {r["word"]: list(r["pieces"]) for r in seg.collect()}
    assert got == ref_vocab


def test_bigram_lm_perplexity_exact_small_corpus(spark):
    """Hand-checkable bigram LM: corpus {'a b a b', 'a c'} gives bigram
    counts ab=2, ba=1, ac=1; with d=0.75 the discounted probabilities are
    p(ab)=7/12, p(ba)=1/2, p(ac)=1/4 — doc2's perplexity is exactly
    1/p(ac) = 4.0, and doc1's micro-nat total matches the closed form."""
    import math

    from muninn_avro_to_parquet_spark.operators import text as TX

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a c")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in TX.bigram_lm_score(df, "doc_id").collect()}
    p_ab = (2 - 0.75) / 3 + (0.75 * 2 / 3) * (1 / 3)
    p_ba = (1 - 0.75) / 1 + (0.75 * 1 / 1) * (1 / 3)
    p_ac = (1 - 0.75) / 3 + (0.75 * 2 / 3) * (1 / 3)
    q = lambda p: round(-math.log(p) * 1e6)
    assert got[1]["n_bigrams"] == 3
    assert got[1]["nll_micro"] == 2 * q(p_ab) + q(p_ba)
    assert got[2]["nll_micro"] == q(p_ac)
    assert got[2]["perplexity"] == 4.0
    # fluent (repetitive) text scores lower than its own average context
    assert got[1]["perplexity"] < got[2]["perplexity"]


def test_bigram_lm_short_docs_drop_out(spark):
    """Documents with fewer than two tokens have no bigrams and drop out
    (inner semantics, mirroring the SQL oracle)."""
    from muninn_avro_to_parquet_spark.operators import text as TX

    df = spark.createDataFrame(
        [(1, "one"), (2, ""), (3, "two words")], "doc_id long, text string"
    )
    got = [r["doc_id"] for r in TX.bigram_lm_score(df, "doc_id").collect()]
    assert got == [3]


def test_corpus_drift_exact_and_symmetric(spark):
    """Hand-checkable Jeffreys drift: corpora {'a a b'} vs {'a c'} over
    union vocab {a,b,c} with alpha=0.5 — every nano-nat contribution
    matches the closed form, is non-negative, and is invariant under
    swapping the slices (symmetry)."""
    import math

    from muninn_avro_to_parquet_spark.operators import text as TX

    a = spark.createDataFrame([(1, "a a b")], "doc_id long, text string")
    b = spark.createDataFrame([(2, "a c")], "doc_id long, text string")
    got = {r["token"]: r for r in TX.corpus_drift(a, b).collect()}

    counts = {"a": (2, 1), "b": (1, 0), "c": (0, 1)}
    n_a, n_b, v = 3.0, 2.0, 3.0
    for tok, (ca, cb) in counts.items():
        pa = (ca + 0.5) / (n_a + 0.5 * v)
        pb = (cb + 0.5) / (n_b + 0.5 * v)
        expected = round((pa * math.log(pa / pb) + pb * math.log(pb / pa)) * 1e9)
        assert got[tok]["c_a"] == ca and got[tok]["c_b"] == cb
        assert got[tok]["jeffreys_nano"] == expected
        assert got[tok]["jeffreys_nano"] >= 0

    swapped = {r["token"]: r for r in TX.corpus_drift(b, a).collect()}
    for tok in counts:
        assert swapped[tok]["jeffreys_nano"] == got[tok]["jeffreys_nano"]
        assert (swapped[tok]["c_a"], swapped[tok]["c_b"]) == (
            got[tok]["c_b"],
            got[tok]["c_a"],
        )


def test_bpe_differential_random_corpora(spark):
    """Differential check on seeded random corpora (small alphabet →
    dense pair collisions, heavy tie-breaking and equal-symbol runs):
    the distributed loop must match the sequential reference
    merge-for-merge on every corpus."""
    import random

    from muninn_avro_to_parquet_spark.operators import bpe

    for seed in (7, 23, 91):
        rng = random.Random(seed)
        texts = [
            " ".join(
                "".join(rng.choice("abc") for _ in range(rng.randint(1, 6)))
                for _ in range(rng.randint(3, 10))
            )
            for _ in range(8)
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        expected, _ = _ref_bpe(texts, 5)
        got = [
            (r["merge_rank"], r["left_sym"], r["right_sym"], r["pair_count"])
            for r in bpe.learn_bpe(df, num_merges=5).orderBy("merge_rank").collect()
        ]
        assert got == expected, f"seed {seed}: {got} != {expected}"


def test_posting_lists_cap_and_exact_df(spark):
    """Posting lists rank by (tf DESC, doc_id ASC), truncate at the cap,
    and keep the TRUE document frequency even where truncated."""
    from muninn_avro_to_parquet_spark.operators import text as TX

    df = spark.createDataFrame(
        [
            (1, "x x y"),
            (2, "x y y"),
            (3, "x"),
            (4, "x z"),
        ],
        "doc_id long, text string",
    )
    got = {r["token"]: r for r in TX.posting_lists(df, "doc_id", max_postings=2).collect()}
    assert got["x"]["doc_freq"] == 4  # true df, not the cap
    assert got["x"]["postings"] == "1:2 2:1"  # tf desc, then doc_id asc; capped at 2
    assert got["y"]["doc_freq"] == 2
    assert got["y"]["postings"] == "2:2 1:1"
    assert got["z"]["postings"] == "4:1"


def test_bpe_empty_and_pairless_corpora(spark):
    """Degenerate corpora terminate cleanly: an empty corpus and a
    corpus of single-character words (no adjacent pairs) both yield an
    empty, correctly-typed merge table instead of erroring or looping."""
    from muninn_avro_to_parquet_spark.operators import bpe

    empty = spark.createDataFrame([], "doc_id long, text string")
    m = bpe.learn_bpe(empty, num_merges=3)
    assert m.count() == 0
    assert m.columns == ["merge_rank", "left_sym", "right_sym", "pair_count"]

    pairless = spark.createDataFrame([(1, "x y z")], "doc_id long, text string")
    assert bpe.learn_bpe(pairless, num_merges=3).count() == 0


# ---------------------------------------------------------------------------
# record linkage (operators/linkage.py)
# ---------------------------------------------------------------------------


def test_linkage_scores_and_decisions(spark):
    """Hand-checkable Fellegi-Sunter scoring: agreements add, nulls
    behave per contract (null==null agrees under exact, any null on a
    fuzzy field disagrees), and the thresholds split the decisions."""
    from muninn_avro_to_parquet_spark.operators import linkage

    df = spark.createDataFrame(
        [
            (1, 1, "anna", "A"),
            (2, 1, "anne", "A"),     # fuzzy-agree with 1 (dist 1), exact-agree
            (3, 1, "zxqw", None),    # disagrees with both on name
            (4, 1, None, None),      # null name: fuzzy disagree; null==null seg agrees w/ 3
        ],
        "id long, blk int, name string, seg string",
    )
    rules = [
        linkage.FieldRule("name", 1_000_000, -400_000, kind="fuzzy", max_distance=1),
        linkage.FieldRule("seg", 300_000, -300_000),
    ]
    out = {
        (r["id_a"], r["id_b"]): r
        for r in linkage.pair_scores(
            df, "id", F.col("blk"), rules, link_micro=1_300_000, nonlink_micro=-600_000
        ).collect()
    }
    assert len(out) == 6  # all within-block pairs, a < b
    assert out[(1, 2)]["score_micro"] == 1_300_000
    assert out[(1, 2)]["decision"] == "link"
    assert out[(1, 3)]["score_micro"] == -400_000 - 300_000
    assert out[(1, 3)]["decision"] == "non-link"
    # null name vs null name: fuzzy disagree (levenshtein NULL), seg null==null agree
    assert out[(3, 4)]["name_agree"] is False
    assert out[(3, 4)]["seg_agree"] is True
    assert out[(3, 4)]["score_micro"] == -400_000 + 300_000
    assert out[(3, 4)]["decision"] == "possible"


def test_linkage_max_block_drops_hot_blocks(spark):
    """Blocks above max_block are dropped entirely (the fuzzy-join skew
    guard), never exploded into quadratic pairs."""
    from muninn_avro_to_parquet_spark.operators import linkage

    rows = [(i, 1, f"n{i}") for i in range(10)] + [(100, 2, "x"), (101, 2, "x")]
    df = spark.createDataFrame(rows, "id long, blk int, name string")
    out = linkage.pair_scores(
        df, "id", F.col("blk"),
        [linkage.FieldRule("name", 1, -1)],
        link_micro=1, nonlink_micro=-1, max_block=5,
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in out} == {(100, 101)}


# ---------------------------------------------------------------------------
# geospatial neighbor join (operators/geo.py)
# ---------------------------------------------------------------------------


def test_geo_neighbor_pairs_exact_and_cross_cell(spark):
    """Haversine matches the closed form (equator degree ~111.195 km),
    pairs straddling a grid-cell boundary are still found (3x3 probe),
    and the radius filter excludes far pairs."""
    import math

    from muninn_avro_to_parquet_spark.operators import geo

    df = spark.createDataFrame(
        [
            (1, 0.0, 0.0),
            (2, 0.0, 1.0),      # exactly 1 degree east on the equator
            (3, 0.05, -0.05),   # near origin, in the adjacent cell at 0.1 deg
            (4, 40.0, 40.0),    # far away
        ],
        "id long, lat double, lon double",
    )
    out = {
        (r["id_a"], r["id_b"]): r["dist_km"]
        for r in geo.neighbor_pairs(
            df, "id", "lat", "lon", radius_km=150.0, cell_deg=1.5
        ).collect()
    }
    one_deg = 2 * 6371.0 * math.asin(
        math.sqrt(math.cos(0.0) * math.cos(0.0) * math.sin(math.radians(1.0) / 2) ** 2)
    )
    assert set(out) == {(1, 2), (1, 3), (2, 3)}
    assert out[(1, 2)] == round(one_deg, 3)

    # cross-cell recovery at a small cell size: (1,3) sit in different
    # 0.1-degree cells but the probe still pairs them
    small = geo.neighbor_pairs(
        df.filter(F.col("id").isin(1, 3)), "id", "lat", "lon",
        radius_km=20.0, cell_deg=0.1,
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in small} == {(1, 3)}


def test_interpolate_zero_span_gap_parity(spark):
    """Duplicate timestamps around a masked row (prev_ts == next_ts) must
    NOT divide by zero: Spark's non-ANSI 0/0 → NULL and DuckDB's IEEE
    0/0 → NaN would hash-diverge; the next_ts > prev_ts guard routes both
    engines to the prev_v fallback identically."""
    import datetime

    import duckdb
    import pandas as pd

    from muninn_avro_to_parquet_spark.queries import (
        QUERIES,
        _interpolate_masked_events,
    )

    t = datetime.datetime(2026, 1, 1, 12, 0, 0)
    t2 = t + datetime.timedelta(hours=2)
    rows = [
        # user 1: three events at the SAME timestamp, middle one masked
        (1, 1, t, 10.0), (1, 5, t, 77.0), (1, 9, t, 20.0),
        # user 2: normal midpoint interpolation
        (2, 1, t, 0.0), (2, 5, t + datetime.timedelta(hours=1), 77.0),
        (2, 9, t2, 30.0),
    ]
    sdf = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    got = {
        (r["user_id"], r["event_id"]): r["filled"]
        for r in _interpolate_masked_events(sdf).collect()
    }
    assert got[(1, 5)] == 10.0  # zero-span gap → prev_v, not NULL/NaN
    assert got[(2, 5)] == 15.0  # normal path unchanged

    pdf = pd.DataFrame(
        rows, columns=["user_id", "event_id", "ts", "value"]
    )
    con = duckdb.connect()
    con.register("events", pdf)
    oracle = {
        (int(r[0]), int(r[1])): r[3]
        for r in con.execute(QUERIES["q_interpolate_gaps"].oracle).fetchall()
    }
    assert oracle == {k: got[k] for k in oracle}


def test_geo_antimeridian_pairs(spark):
    """Near pairs straddling the ±180° seam are found via the lon±360
    probe duplicates, exactly once, with the same distance the unwrapped
    haversine would give; cell_deg > 90 is rejected."""
    import math

    import pytest

    from muninn_avro_to_parquet_spark.operators import geo

    df = spark.createDataFrame(
        [
            (1, 0.0, 179.9),     # just west of the seam
            (2, 0.0, -179.9),    # just east of it — 0.2 deg apart across ±180
            (3, 0.0, 170.0),     # same side as 1, ~9.9 deg away
            (4, 10.0, 0.0),      # far away
        ],
        "id long, lat double, lon double",
    )
    out = {
        (r["id_a"], r["id_b"]): r["dist_km"]
        for r in geo.neighbor_pairs(
            df, "id", "lat", "lon", radius_km=50.0, cell_deg=1.0
        ).collect()
    }
    point_two_deg = 2 * 6371.0 * math.asin(abs(math.sin(math.radians(0.2) / 2)))
    assert set(out) == {(1, 2)}
    assert out[(1, 2)] == round(point_two_deg, 3)

    # seam pair generated exactly once even when both endpoints sit in
    # the wrap band (no duplicate rows from the two probe directions)
    rows = geo.neighbor_pairs(
        df, "id", "lat", "lon", radius_km=50.0, cell_deg=1.0
    ).collect()
    assert len(rows) == 1

    with pytest.raises(ValueError, match="cell_deg"):
        geo.neighbor_pairs(df, "id", "lat", "lon", radius_km=50.0, cell_deg=120.0)


def test_geo_max_cell_guard(spark):
    """Over-dense cells drop entirely (bucket-guard contract)."""
    from muninn_avro_to_parquet_spark.operators import geo

    rows = [(i, 10.0 + i * 1e-4, 10.0) for i in range(10)] + [
        (100, -50.0, -50.0), (101, -50.0001, -50.0),
    ]
    df = spark.createDataFrame(rows, "id long, lat double, lon double")
    out = geo.neighbor_pairs(
        df, "id", "lat", "lon", radius_km=5.0, cell_deg=1.0, max_cell=5
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in out} == {(100, 101)}


def test_candidate_triangles_counts(spark):
    """Hand-built graph: K4 on {1,2,3,4} (4 triangles, each node in 3) plus
    a star hub 10-{11,12,13} (triangle-free) plus a dangling edge."""
    from muninn_avro_to_parquet_spark.operators import dedup

    k4 = [(a, b) for a in (1, 2, 3, 4) for b in (1, 2, 3, 4) if a < b]
    star = [(10, 11), (10, 12), (10, 13)]
    pairs = spark.createDataFrame(
        k4 + star + [(20, 21), (2, 1)],  # duplicate reversed edge folds away
        "id_a long, id_b long",
    )
    got = {
        r["doc_id"]: r["n_triangles"]
        for r in dedup.candidate_triangles(pairs).collect()
    }
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}  # star/dangling nodes absent


def test_random_projection_matches_reference(spark):
    """Exact integer JL projection: components equal the Python dot of
    round(x*1e7) against the md5-derived planes (offset 1000)."""
    from muninn_avro_to_parquet_spark.operators import similarity

    vecs = [
        (1, [0.5, -0.25, 0.125, 1.0]),
        (2, [0.0, 0.0, 0.0, 0.0]),
        (3, [-1.0, 1.0, -1.0, 1.0]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = {
        r["vec_id"]: list(r["proj"])
        for r in similarity.random_projection(df, dim=4, out_dim=3).collect()
    }
    planes = [similarity._hyperplane(4, 1000 + j) for j in range(3)]
    for vid, v in vecs:
        q = [round(x * 10_000_000) for x in v]
        want = [sum(x * c for x, c in zip(q, p)) for p in planes]
        assert out[vid] == want


def test_containment_catches_quote_inclusion(spark):
    """A short doc fully embedded in a long one: containment 1.0 while
    Jaccard stays ~|short|/|long|; hot shingles above max_shingle_docs
    never generate pairs."""
    from muninn_avro_to_parquet_spark.operators import dedup

    short = "alpha beta gamma delta epsilon"
    long_doc = (
        "intro words before the quote " + short + " and plenty of trailing "
        "commentary that dilutes the union so jaccard drops far below half"
    )
    boiler = "all rights reserved footer"
    df = spark.createDataFrame(
        [
            (1, short),
            (2, long_doc),
            (3, "unrelated content about spark plans " + boiler),
            (4, "different unrelated words entirely " + boiler),
        ],
        "doc_id long, text string",
    )
    out = {
        (r["id_a"], r["id_b"]): r
        for r in dedup.containment_pairs(
            df, "doc_id", "text", n=3, threshold=0.9
        ).collect()
    }
    assert (1, 2) in out and out[(1, 2)]["containment"] == 1.0
    jac = out[(1, 2)]["n_common"] / (
        out[(1, 2)]["n_a"] + out[(1, 2)]["n_b"] - out[(1, 2)]["n_common"]
    )
    assert jac < 0.5  # the pair Jaccard would have missed
    assert (3, 4) not in out  # boilerplate-only overlap below threshold

    # hot-shingle guard: with max_shingle_docs=1 NO shingle may pair
    guarded = dedup.containment_pairs(
        df, "doc_id", "text", n=3, threshold=0.0, max_shingle_docs=1
    )
    assert guarded.count() == 0


def test_tfidf_cosine_pairs_topical_similarity(spark):
    """Two docs sharing distinctive vocabulary pair with high cosine even
    with different phrasing; docs with disjoint top-terms never pair."""
    from muninn_avro_to_parquet_spark.operators import text as text_ops

    df = spark.createDataFrame(
        [
            (1, "quantum entanglement decoherence qubit superposition"),
            (2, "qubit decoherence limits quantum entanglement fidelity"),
            (3, "sourdough fermentation hydration crumb proofing"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r["id_a"], r["id_b"]): r
        for r in text_ops.tfidf_cosine_pairs(
            df, "doc_id", "text", top_k=5, threshold=0.0
        ).collect()
    }
    # 3 of 5 top terms shared (top-k tie-breaks differ per doc) → ~0.49
    assert (1, 2) in out and out[(1, 2)]["cosine"] > 0.4
    assert out[(1, 2)]["n_shared_terms"] >= 3
    assert (1, 3) not in out and (2, 3) not in out

    # hot-term guard: max_token_docs=1 removes every shared term
    assert (
        text_ops.tfidf_cosine_pairs(
            df, "doc_id", "text", top_k=5, threshold=0.0, max_token_docs=1
        ).count()
        == 0
    )


def test_key_skew_report_shares(spark):
    """Counts, shares, and cumulative shares against a known distribution."""
    from muninn_avro_to_parquet_spark.operators import skew

    rows = [(1,)] * 60 + [(2,)] * 30 + [(3,)] * 10
    df = spark.createDataFrame(rows, "k long")
    rep = {r["rank"]: r for r in skew.key_skew_report(df, "k", top_k=2).collect()}
    assert len(rep) == 2
    assert rep[1]["key"] == 1 and rep[1]["n_rows"] == 60 and rep[1]["share"] == 0.6
    assert rep[2]["key"] == 2 and rep[2]["cum_share"] == 0.9


def test_bpe_batched_differential_random_corpora(spark):
    """Differential check of BOTH batched selection modes on seeded
    random corpora (small alphabet → dense collisions, equal-symbol
    runs, heavy tie-breaking): each must match its in-memory reference
    round-for-round, and greedy must never select fewer merges."""
    import random

    from muninn_avro_to_parquet_spark.operators import bpe

    for seed in (11, 47):
        rng = random.Random(seed)
        texts = [
            " ".join(
                "".join(rng.choice("abc") for _ in range(rng.randint(1, 6)))
                for _ in range(rng.randint(3, 10))
            )
            for _ in range(8)
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        exp_cons, _ = _ref_bpe_batched(texts, rounds=3, batch_size=3)
        got_cons = [
            (r["merge_rank"], r["round_idx"], r["left_sym"], r["right_sym"], r["pair_count"])
            for r in bpe.learn_bpe_batched(df, rounds=3, batch_size=3)
            .orderBy("merge_rank")
            .collect()
        ]
        assert got_cons == exp_cons, f"seed {seed} conservative"
        exp_greedy, _ = _ref_bpe_batched_greedy(texts, rounds=3, batch_size=3)
        got_greedy = [
            (r["merge_rank"], r["round_idx"], r["left_sym"], r["right_sym"], r["pair_count"])
            for r in bpe.learn_bpe_batched(
                df, rounds=3, batch_size=3, selection="greedy"
            )
            .orderBy("merge_rank")
            .collect()
        ]
        assert got_greedy == exp_greedy, f"seed {seed} greedy"
        assert len(got_greedy) >= len(got_cons)


def test_triangles_differential_random_graphs(spark):
    """Per-node triangle counts on seeded random graphs must match a
    brute-force O(V^3) reference (duplicate/reversed input edges folded)."""
    import itertools
    import random

    from muninn_avro_to_parquet_spark.operators import dedup

    for seed in (5, 29):
        rng = random.Random(seed)
        nodes = list(range(12))
        edges = set()
        for a, b in itertools.combinations(nodes, 2):
            if rng.random() < 0.35:
                edges.add((a, b))
        rows = [(a, b) if rng.random() < 0.5 else (b, a) for a, b in edges]
        rows += rows[: len(rows) // 3]  # duplicates fold away
        df = spark.createDataFrame(rows, "id_a long, id_b long")
        want: dict[int, int] = {}
        for a, b, c in itertools.combinations(nodes, 3):
            if (a, b) in edges and (b, c) in edges and (a, c) in edges:
                for v in (a, b, c):
                    want[v] = want.get(v, 0) + 1
        got = {
            r["doc_id"]: r["n_triangles"]
            for r in dedup.candidate_triangles(df).collect()
        }
        assert got == want, f"seed {seed}"


def test_grouped_row_number_null_group(spark):
    """A NULL group value must rank as ONE ordinary group — matching
    Window.partitionBy, which treats NULL as a group. The offset join is
    null-safe (eqNullSafe, ADVICE r7); plain equality would silently
    restart every NULL row's rank at 1 in each physical partition."""
    from pyspark.sql import Window, functions as F

    from muninn_avro_to_parquet_spark.operators import text

    df = spark.range(0, 400).select(
        F.when(F.col("id") % 3 == 0, F.lit(None).cast("string"))
        .when(F.col("id") % 3 == 1, "a")
        .otherwise("b")
        .alias("src"),
        F.col("id").cast("string").alias("key"),
    )
    order = [F.col("key").asc()]
    got = {
        (r["src"], r["key"]): r["rank"]
        for r in text.grouped_row_number(
            df, ["src"], *order, num_partitions=7
        ).collect()
    }
    w = Window.partitionBy("src").orderBy(*order)
    want = {
        (r["src"], r["key"]): r["rank"]
        for r in df.withColumn("rank", F.row_number().over(w)).collect()
    }
    assert got == want
    # the NULL group really spans several range partitions (134 rows over
    # 7 partitions), so a per-physical-partition restart would show
    assert max(v for (s, _), v in got.items() if s is None) == 134


def test_pair_generator_guards_default_on(spark):
    """containment_pairs / tfidf_cosine_pairs ship with their hot-key
    guards ON (64 docs per shingle/term, the cosine_pairs /
    repeated_spans precedent): a boilerplate shingle shared by 70 docs
    generates ZERO pairs by default, corpus²/2 pairs only when the guard
    is explicitly disabled (VERDICT r6/r7)."""
    from muninn_avro_to_parquet_spark.operators import dedup
    from muninn_avro_to_parquet_spark.operators import text as text_ops

    boiler = "common header words repeated verbatim"
    rows = [(i, f"{boiler} unique{i} tail{i}") for i in range(70)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    dflt = dedup.containment_pairs(df, "doc_id", "text", n=3, threshold=0.0)
    off = dedup.containment_pairs(
        df, "doc_id", "text", n=3, threshold=0.0, max_shingle_docs=None
    )
    assert dflt.count() == 0
    assert off.count() == 70 * 69 // 2

    t_dflt = text_ops.tfidf_cosine_pairs(df, "doc_id", "text", threshold=0.0)
    t_off = text_ops.tfidf_cosine_pairs(
        df, "doc_id", "text", threshold=0.0, max_token_docs=None
    )
    assert t_dflt.count() == 0
    assert t_off.count() == 70 * 69 // 2


def test_bpe_batched_max_merges_and_rounds_validation(spark):
    """max_merges caps the greedy trainer EXACTLY (the final batch is
    truncated before it applies, so the segmentation matches the
    recorded merges); rounds < 1 raises instead of IndexError
    (ADVICE r6)."""
    import pytest

    from muninn_avro_to_parquet_spark.operators import bpe

    docs = spark.createDataFrame(
        [(1, "low lower lowest"), (2, "new newer newest")],
        "doc_id long, text string",
    )
    merges, seq = bpe.learn_bpe_batched(
        docs, "text", rounds=8, batch_size=3, selection="greedy",
        max_merges=4, return_final_seq=True,
    )
    got = merges.orderBy("merge_rank").collect()
    assert len(got) == 4
    # the segmentation reflects exactly those 4 merges: replaying them
    # over the initial symbols reproduces seq's symbol multiset
    replay = bpe.initial_symbols(bpe.word_frequencies(docs, "text"))
    for r in got:
        sel = spark.createDataFrame(
            [(r["left_sym"], r["right_sym"])], "left_sym string, right_sym string"
        )
        replay = bpe.apply_merge_batch(replay, sel)
    want = sorted((x["word"], x["sym"]) for x in replay.collect())
    have = sorted((x["word"], x["sym"]) for x in seq.collect())
    assert have == want

    with pytest.raises(ValueError, match="rounds"):
        bpe.learn_bpe_batched(docs, "text", rounds=0)
    with pytest.raises(ValueError, match="max_merges"):
        bpe.learn_bpe_batched(docs, "text", rounds=1, max_merges=0)


def test_decontaminate_bloom_superset_of_exact(spark):
    """The Bloom prefilter must flag EVERY document the exact operator
    flags (no false negatives, including when two hash functions collide
    on a position within one shingle), and at a tiny filter it may flag
    more — the deterministic false positives the two-phase pass then
    clears with the exact operator."""
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated words about astronomy and planets"),
            (3, "quick brown fox appears here too"),
            (4, "more harmless filler text entirely distinct tokens"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "watch the quick brown fox run")], "doc_id long, text string"
    )
    exact = {
        r["doc_id"]: r["contaminated"]
        for r in dedup.decontaminate(corpus, bench, "doc_id").collect()
    }
    for m_bits, k in ((1 << 20, 4), (64, 3), (8, 2)):
        bloom = {
            r["doc_id"]: r["contaminated"]
            for r in dedup.decontaminate_bloom(
                corpus, bench, "doc_id", m_bits=m_bits, num_hashes=k
            ).collect()
        }
        assert set(bloom) == set(exact)  # every corpus doc present
        for doc, flagged in exact.items():
            if flagged:
                assert bloom[doc], (m_bits, k, doc)
    # at a roomy filter the flags are exactly the exact operator's
    roomy = {
        r["doc_id"]: r["contaminated"]
        for r in dedup.decontaminate_bloom(
            corpus, bench, "doc_id", m_bits=1 << 20, num_hashes=4
        ).collect()
    }
    assert roomy == exact


def test_heavy_hitters_no_false_negatives_vs_exact(spark):
    """The MG propose phase is stressed (vocab 3000 ≫ 40 counters, many
    partitions) and the two-phase result must still EQUAL the naive exact
    computation — the no-false-negative superset guarantee made visible."""
    import random

    rng = random.Random(7)
    heavy = ["alpha"] * 900 + ["beta"] * 600   # well above 1/10 of ~5k tokens
    tail = [f"t{rng.randrange(3000)}" for _ in range(3500)]
    words = heavy + tail
    rng.shuffle(words)
    docs = [
        (i, " ".join(words[i * 44 : (i + 1) * 44])) for i in range(100)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string").repartition(16)

    got = {
        r["token"]: r["n_occurrences"]
        for r in text.heavy_hitters(
            df, threshold_num=1, threshold_den=10, counters_per_partition=40
        ).collect()
    }
    tok = df.select(F.explode(text.tokens(F.col("text"))).alias("token"))
    n = tok.count()
    exact = {
        r["token"]: r["cnt"]
        for r in tok.groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") * 10 >= F.lit(n))
        .collect()
    }
    assert got == exact
    assert "alpha" in got and "beta" in got


def test_heavy_hitters_rejects_undersized_counters(spark):
    import pytest as _pytest

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="could miss"):
        text.heavy_hitters(df, threshold_num=1, threshold_den=100, counters_per_partition=50)


def test_normalize_nfc(spark):
    """text.normalize_nfc: decomposed sequences compose, precomposed and
    ASCII pass through, NULL stays NULL (r11)."""
    from muninn_avro_to_parquet_spark.operators import text

    df = spark.createDataFrame(
        [
            (0, "cafe\u0301"),   # decomposed e+combining acute
            (1, "caf\u00e9"),    # already NFC
            (2, "plain"),
            (3, None),
        ],
        "doc_id long, t string",
    )
    from pyspark.sql import functions as F

    got = {
        r["doc_id"]: r["n"]
        for r in df.select("doc_id", text.normalize_nfc(F.col("t")).alias("n")).collect()
    }
    assert got == {0: "caf\u00e9", 1: "caf\u00e9", 2: "plain", 3: None}
    assert len(got[0]) == 4


def test_paragraph_dedup_first_occurrence_wins(spark):
    """Corpus-level paragraph dedup: a paragraph's FIRST (doc_id, pos)
    occurrence survives, every later occurrence (same doc or later doc)
    drops, documents reassemble in original order, whitespace-only
    paragraphs never compete."""
    df = spark.createDataFrame(
        [
            (1, "alpha beta\n\nshared one\n\ngamma"),
            (2, "shared one\n\ndelta\n\n \n\nshared one"),
            (3, "delta\n\nalpha beta\n\nepsilon"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in dedup.paragraph_dedup(df, "doc_id", "text").collect()
    }
    assert rows[1]["text_kept"] == "alpha beta\n\nshared one\n\ngamma"
    assert (rows[1]["n_paragraphs"], rows[1]["n_kept"]) == (3, 3)
    # doc 2: "shared one" lost both occurrences to doc 1; the blank
    # paragraph was dropped before dedup (n_paragraphs counts 3, not 4)
    assert rows[2]["text_kept"] == "delta"
    assert (rows[2]["n_paragraphs"], rows[2]["n_kept"]) == (3, 1)
    # doc 3: "delta" lost to doc 2, "alpha beta" to doc 1
    assert rows[3]["text_kept"] == "epsilon"
    assert (rows[3]["n_paragraphs"], rows[3]["n_kept"]) == (3, 1)


def test_paragraph_dedup_preserves_cardinality_and_literal_sep(spark):
    """r12 review fixes: NULL/empty/blank docs come back as ('', 0, 0)
    rows instead of vanishing; the separator is literal (sep='|' must
    not be treated as regex alternation)."""
    df = spark.createDataFrame(
        [(1, "alpha|beta"), (2, None), (3, ""), (4, " \t "), (5, "beta|alpha")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in dedup.paragraph_dedup(df, "doc_id", "text", sep="|").collect()
    }
    assert set(rows) == {1, 2, 3, 4, 5}
    assert rows[1]["text_kept"] == "alpha|beta"
    assert (rows[1]["n_paragraphs"], rows[1]["n_kept"]) == (2, 2)
    for d in (2, 3, 4):
        assert rows[d]["text_kept"] == ""
        assert (rows[d]["n_paragraphs"], rows[d]["n_kept"]) == (0, 0)
    # doc 5 lost both paragraphs to doc 1's occurrences
    assert (rows[5]["n_paragraphs"], rows[5]["n_kept"]) == (2, 0)


def test_char_entropy_known_values_and_zero_rows(spark):
    """Hand-checked entropies: uniform single char = 0; 'ab' = 2 ×
    round(ln(2)/2 · 1e6) micro-nats; empty/NULL text keeps its row at
    zeros (a quality report must not silently drop documents)."""
    from muninn_avro_to_parquet_spark.operators import text as text_ops

    df = spark.createDataFrame(
        [(0, "aaaa"), (1, "ab"), (2, ""), (3, None), (4, "aabb")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in text_ops.char_entropy(df).collect()}
    assert len(out) == 5
    assert out[0]["entropy_micronats"] == 0 and out[0]["n_distinct_chars"] == 1
    assert out[1]["entropy_micronats"] == 2 * 346574  # 2·round(ln2/2·1e6)
    assert out[2]["n_chars_seen"] == 0 and out[2]["entropy_micronats"] == 0
    assert out[3]["n_chars_seen"] == 0
    assert out[4]["entropy_micronats"] == 2 * 346574  # same distribution as 'ab'
    # determinism under repartitioning
    again = {
        r["doc_id"]: r["entropy_micronats"]
        for r in text_ops.char_entropy(df.repartition(7)).collect()
    }
    assert again == {k: v["entropy_micronats"] for k, v in out.items()}
