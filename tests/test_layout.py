"""Z-order layout keys (plans/layout.py) and int8 quantization
(operators/similarity.py quantize_int8): bit-exactness against a pure
Python reference, locality property, and quantization error bounds."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from muninn_avro_to_parquet_spark.operators import similarity
from muninn_avro_to_parquet_spark.plans import layout


def _py_interleave(vals: list[int], bits: int) -> int:
    z = 0
    d = len(vals)
    for j, v in enumerate(vals):
        for i in range(bits):
            z |= ((v >> i) & 1) << (i * d + j)
    return z


def test_zorder_key_matches_python_reference(spark):
    rows = [(0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321), (40000, 7)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.withColumn(
            "z", layout.zorder_key([F.col("x"), F.col("y")], 16)
        ).collect()
    }
    for x, y in rows:
        assert got[(x, y)] == _py_interleave([x, y], 16), (x, y)


def test_zorder_sql_expr_matches_column_form(spark):
    """The SQL string the oracle uses is the same function as the Column
    tree — evaluate both in Spark and compare."""
    df = spark.range(0, 512).select(
        (F.col("id") % 23).alias("x"), (F.col("id") * 7 % 31).alias("y")
    )
    sql = layout.zorder_sql_expr(["x", "y"], bits=8)
    both = df.select(
        layout.zorder_key([F.col("x"), F.col("y")], 8).alias("a"),
        F.expr(sql).alias("b"),
    )
    assert both.filter(F.col("a") != F.col("b")).count() == 0


def test_zorder_three_dims_rejects_overflow():
    with pytest.raises(ValueError):
        layout.zorder_key([F.lit(1), F.lit(1), F.lit(1), F.lit(1)], 16)


def test_zorder_locality_bounds_every_dimension(spark):
    """The point of the layout: after sorting by the Morton key, any
    contiguous chunk of the key space spans a bounded box in EVERY
    dimension. Check that each top-4-bit key bucket covers at most half
    of each 8-bit axis (a z-curve order-2 quadrant), which single-column
    sorting cannot do for the second column."""
    df = spark.range(0, 256 * 8).select(
        (F.col("id") % 256).alias("x"), ((F.col("id") * 37) % 256).alias("y")
    )
    keyed = df.withColumn("z", layout.zorder_key([F.col("x"), F.col("y")], 8))
    spans = (
        keyed.groupBy(F.shiftright("z", 12).alias("b"))
        .agg(
            (F.max("x") - F.min("x")).alias("dx"),
            (F.max("y") - F.min("y")).alias("dy"),
        )
        .agg(F.max("dx").alias("mx"), F.max("dy").alias("my"))
        .first()
    )
    assert spans["mx"] <= 127 and spans["my"] <= 127, spans


def test_write_zordered_roundtrip(spark, tmp_path):
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"),
        (F.col("id") % 97).alias("x"),
        ((F.col("id") * 13) % 89).alias("y"),
    )
    out = str(tmp_path / "zo")
    layout.write_zordered(df, out, ["x", "y"], num_files=4, bits=8)
    back = spark.read.parquet(out)
    assert back.count() == 1000
    assert set(back.columns) == {"k", "x", "y"}


def test_quantize_int8_bounds_and_reconstruction(spark):
    """Codes live in [-128, 127]; extremes hit the endpoints; per-dim
    dequantization error is within half a step of the calibrated range."""
    vecs = [
        (1, [0.0, -1.0, 0.5]),
        (2, [1.0, 1.0, 0.5]),
        (3, [0.25, 0.0, 0.5]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    q = {r["vec_id"]: r["q"] for r in similarity.quantize_int8(df).collect()}
    # dim0 range [0,1]: 0.0 -> -128, 1.0 -> 127; dim1 range [-1,1]; dim2 degenerate -> 0
    assert q[1][0] == -128 and q[2][0] == 127
    assert q[1][1] == -128 and q[2][1] == 127
    assert all(q[v][2] == 0 for v in (1, 2, 3))
    # mid-range reconstruction: code -> mn + (code+128)*(mx-mn)/255 within half step
    step = 1.0 / 255
    recon = (q[3][0] + 128) * step
    assert abs(recon - 0.25) <= step / 2 + 1e-9


def test_quantize_int8_no_shuffle_on_corpus_side(spark):
    """The calibration relation must come back as a broadcast, not a
    shuffled join: the corpus-side plan should contain a
    BroadcastNestedLoopJoin/BroadcastExchange and no SortMergeJoin."""
    df = spark.createDataFrame(
        [(i, [float(i), float(-i)]) for i in range(100)],
        "vec_id long, embedding array<float>",
    )
    plan = similarity.quantize_int8(df)._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan
    assert "SortMergeJoin" not in plan


def test_int8_topk_recall_vs_exact(spark):
    """Quantization must preserve neighbor structure: recall@10 of the
    int8 top-k vs the float top-k on the real embeddings table."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    emb.createOrReplaceTempView("embeddings")
    # the override re-points a registered table name: invalidate the
    # register_views skip marker so the next caller repairs the catalog
    from muninn_avro_to_parquet_spark import tables

    tables.invalidate_views(spark)
    exact = similarity.cosine_topk(emb, emb.filter(F.col("vec_id") < 5), k=10)
    codes = similarity.quantize_int8(emb)
    q8 = similarity.cosine_topk_int8(codes, codes.filter(F.col("vec_id") < 5), k=10)
    ex = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    got = {(r["query_id"], r["vec_id"]) for r in q8.collect()}
    recall = len(ex & got) / len(ex)
    # i.i.d.-random synthetic embeddings are the adversarial case for
    # this metric: neighbor cosines are nearly tied, so ±1-code noise
    # can swap ranks 8..12 freely (observed ≈0.78 here; real clustered
    # embeddings sit far higher because true neighbors have a margin).
    assert recall >= 0.7, recall


def test_write_zordered_files_have_tight_stats(spark, tmp_path):
    """The data-skipping proof: after write_zordered, each output FILE's
    parquet footer min/max covers a small box in BOTH dimensions, so a
    2-D predicate prunes most files. Compare against a single-column
    sort, where the second dimension's per-file spread stays ~global."""
    import pyarrow.parquet as pq
    import glob as _glob

    # the full 128x128 grid, one row per point — every (x, y) independent
    df = spark.range(0, 1 << 14).select(
        (F.col("id") % 128).alias("x"),
        ((F.col("id") / 128).cast("long") % 128).alias("y"),
    )
    zdir, sdir = str(tmp_path / "z"), str(tmp_path / "s")
    layout.write_zordered(df, zdir, ["x", "y"], num_files=16, bits=7)
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(sdir)

    def spreads(d):
        out = []
        for f in _glob.glob(f"{d}/part-*.parquet"):
            md = pq.read_metadata(f)
            mnx = mny = 1 << 30
            mxx = mxy = -(1 << 30)
            for rg in range(md.num_row_groups):
                row = md.row_group(rg)
                for ci in range(row.num_columns):
                    col = row.column(ci)
                    name = col.path_in_schema
                    st = col.statistics
                    if name == "x":
                        mnx, mxx = min(mnx, st.min), max(mxx, st.max)
                    elif name == "y":
                        mny, mxy = min(mny, st.min), max(mxy, st.max)
            out.append(((mxx - mnx), (mxy - mny)))
        return out

    z = spreads(zdir)
    s = spreads(sdir)
    # z-order: the TYPICAL file covers a small box in BOTH dims (median;
    # a file straddling a top-level quadrant boundary can legitimately
    # span wider, so max is not the right statistic for unaligned splits)
    med = sorted(dx for dx, _ in z)[len(z) // 2], sorted(dy for _, dy in z)[len(z) // 2]
    assert med[0] <= 63 and med[1] <= 63, z
    # single-column x-sort: every file spans the whole y domain
    assert min(dy for _, dy in s) >= 120, s
    assert max(dx for dx, _ in s) <= 15, s


def test_pq_model_and_adc_invariants(spark):
    """PQ invariants on the real embeddings: exactly one code per
    (vector, subspace); the assigned code minimizes the subspace
    distance; ADC totals equal the sum of the query's own table entries
    at the corpus codes (checked for one query-corpus pair)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    codes = similarity.quantize_int8(emb)
    dist, enc = similarity.pq_model(codes, m=8, k=16)
    n_vec = emb.count()
    assert enc.count() == n_vec * 8
    # argmin property: joining enc back to dist finds no strictly smaller
    # distance for any (vec, sub)
    d2 = dist.select(
        F.col("vec_id"), F.col("sub"), F.col("code_id").alias("other"),
        F.col("dist").alias("other_dist"),
    )
    assigned = enc.join(dist, ["vec_id", "sub", "code_id"]).select(
        "vec_id", "sub", "code_id", "dist"
    )
    violations = (
        assigned.join(d2, ["vec_id", "sub"])
        .filter(F.col("other_dist") < F.col("dist"))
        .count()
    )
    assert violations == 0


def test_pq_topk_recall_vs_int8_exact(spark):
    """PQ is lossy by design (4 bytes/vector here), but with 16 codes ×
    8 subspaces over 640 i.i.d. vectors the ADC top-10 must still
    overlap the exact int8 top-10 well above chance (10/639 ≈ 0.016)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    codes = similarity.quantize_int8(emb)
    exact = similarity.cosine_topk_int8(codes, codes.filter(F.col("vec_id") < 5), k=10)
    pq = similarity.ann_topk_pq(codes, F.col("vec_id") < 5, m=8, k=16, top_k=10)
    ex = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    got = {(r["query_id"], r["vec_id"]) for r in pq.collect()}
    recall = len(ex & got) / len(ex)
    assert recall >= 0.1, recall


def test_pq_rerank_recall_dominates_plain_pq(spark):
    """The exact re-rank stage must recover recall: rerank@10 vs the
    exact int8 top-10 is at least plain-PQ recall, and the shortlist
    bound guarantees any exact top-10 member inside the 50-candidate
    shortlist is surfaced."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    codes = similarity.quantize_int8(emb)
    exact = similarity.cosine_topk_int8(codes, codes.filter(F.col("vec_id") < 5), k=10)
    pq = similarity.ann_topk_pq(codes, F.col("vec_id") < 5, top_k=10)
    rr = similarity.ann_topk_pq_rerank(codes, F.col("vec_id") < 5, shortlist=50, top_k=10)
    ex = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    got_pq = {(r["query_id"], r["vec_id"]) for r in pq.collect()}
    got_rr = {(r["query_id"], r["vec_id"]) for r in rr.collect()}
    recall_pq = len(ex & got_pq) / len(ex)
    recall_rr = len(ex & got_rr) / len(ex)
    assert recall_rr >= recall_pq, (recall_rr, recall_pq)
    assert recall_rr >= 0.2, recall_rr


def test_ivfpq_results_respect_probed_lists(spark):
    """Structural IVF-PQ invariant: every returned neighbor lives in one
    of its query's nprobe probed lists — the partition pruning is real,
    not advisory."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    res = similarity.ann_topk_ivfpq(
        emb, F.col("vec_id") < 5, n_centroids=16, nprobe=2, top_k=10
    )
    cents = similarity.ivf_centroids(emb, 16)
    corpus_lists = {
        (r["vec_id"], r["centroid_id"])
        for r in similarity.ivf_assign(emb, cents, nprobe=1).collect()
    }
    probed = {}
    for r in similarity.ivf_assign(emb.filter(F.col("vec_id") < 5), cents, nprobe=2).collect():
        probed.setdefault(r["vec_id"], set()).add(r["centroid_id"])
    rows = res.collect()
    assert rows, "ivfpq returned no rows"
    for r in rows:
        lists_of_v = {c for v, c in corpus_lists if v == r["vec_id"]}
        assert lists_of_v & probed[r["query_id"]], (
            r["query_id"], r["vec_id"], lists_of_v, probed[r["query_id"]],
        )


def test_pq_refined_reduces_distortion(spark):
    """One Lloyd round must tighten the codebook: total quantization
    distortion (sum of each vector's assigned-cell distance) drops
    measurably vs the seeded pick (observed ~22% on the real
    embeddings; assert a conservative strict improvement)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    codes = similarity.quantize_int8(emb)

    def distortion(model):
        dist, enc = model
        return (
            enc.join(dist, ["vec_id", "sub", "code_id"])
            .agg(F.sum("dist"))
            .collect()[0][0]
        )

    seeded = distortion(similarity.pq_model(codes, m=8, k=16))
    refined = distortion(similarity.pq_model_refined(codes, m=8, k=16, rounds=1))
    assert refined < seeded * 0.95, (refined, seeded)


def test_ivfpq_index_search_equals_one_shot(spark):
    """Build-once/query-many decomposition (r11): ivfpq_index +
    ivfpq_search must return exactly what the one-shot ann_topk_ivfpq
    returns, ivfflat_search must return exactly what ann_topk_ivf
    returns (same lists, same exact scoring), and turning the nprobe
    dial on the SAME index must be monotone for the flat path (exact
    scoring of a candidate superset can never evict a true hit)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    # both sides at the API defaults (r13: k=256, refined, auto-numpy)
    # so the one-shot's default build matches the decomposed index
    idx = similarity.ivfpq_index(emb, n_centroids=16)
    one_shot = {
        (r["query_id"], r["vec_id"], r["approx_sqdist"], r["rank"])
        for r in similarity.ann_topk_ivfpq(
            emb, F.col("vec_id") < 5, n_centroids=16, nprobe=2, top_k=10,
            rerank=False,
        ).collect()
    }
    via_index = {
        (r["query_id"], r["vec_id"], r["approx_sqdist"], r["rank"])
        for r in similarity.ivfpq_search(
            idx, emb, F.col("vec_id") < 5, nprobe=2, top_k=10, rerank=False
        ).collect()
    }
    assert via_index == one_shot
    # the r12 DEFAULT path (rerank=True): one-shot and decomposed agree
    # on the reranked output too, including the exact cosine scores
    one_shot_rr = {
        (r["query_id"], r["vec_id"], r["cosine_sim"], r["rank"])
        for r in similarity.ann_topk_ivfpq(
            emb, F.col("vec_id") < 5, n_centroids=16, nprobe=2, top_k=10
        ).collect()
    }
    via_index_rr = {
        (r["query_id"], r["vec_id"], r["cosine_sim"], r["rank"])
        for r in similarity.ivfpq_search(
            idx, emb, F.col("vec_id") < 5, nprobe=2, top_k=10
        ).collect()
    }
    assert via_index_rr == one_shot_rr
    flat_one_shot = {
        (r["query_id"], r["vec_id"], r["rank"])
        for r in similarity.ann_topk_ivf(
            emb, emb.filter(F.col("vec_id") < 5), num_centroids=16, nprobe=4, k=10
        ).collect()
    }
    flat_via_index = {
        (r["query_id"], r["vec_id"], r["rank"])
        for r in similarity.ivfflat_search(
            idx, emb, F.col("vec_id") < 5, nprobe=4, top_k=10
        ).collect()
    }
    assert flat_via_index == flat_one_shot
    # flat monotonicity on the shared index: hits vs exact only grow
    exact = {
        (r["query_id"], r["vec_id"])
        for r in similarity.cosine_topk(
            emb, emb.filter(F.col("vec_id") < 5), k=10
        ).select("query_id", "vec_id").collect()
    }
    prev = -1.0
    for nprobe in (2, 6, 16):
        got = {
            (r["query_id"], r["vec_id"])
            for r in similarity.ivfflat_search(
                idx, emb, F.col("vec_id") < 5, nprobe=nprobe, top_k=10
            ).collect()
        }
        rec = len(got & exact) / len(exact)
        assert rec >= prev, (nprobe, rec, prev)
        prev = rec
    assert prev == 1.0  # nprobe = all 16 lists scans everything: exact


def test_pq_encode_numpy_equals_catalyst(spark):
    """The two pq_encode engines must be BIT-IDENTICAL — the numpy
    Arrow-pass encoder exists so a production k=256 codebook never
    stages the corpus × m × k Catalyst fanout, and it may only replace
    that plan if every assignment (including dist ties, which break to
    the lowest code_id) matches exactly. Checked on the seeded codebook
    AND a Lloyd-refined one, and the refined codebooks themselves must
    agree across engines (the numpy path aggregates scatter-added
    partial sums; integer floor-means are order-independent)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    codes = similarity.quantize_int8(emb)
    cb = similarity.pq_codebook(codes, m=8, k=16)
    for cb_i in (
        cb,
        similarity.pq_refine_codebook(codes, cb, m=8, rounds=1),
    ):
        cat = {
            (r["vec_id"], r["sub"], r["code_id"])
            for r in similarity.pq_encode(codes, cb_i, m=8, engine="catalyst").collect()
        }
        npy = {
            (r["vec_id"], r["sub"], r["code_id"])
            for r in similarity.pq_encode(codes, cb_i, m=8, engine="numpy").collect()
        }
        assert npy == cat
    cb_cat = {
        (r["code_id"], r["sub"], r["pos"], r["cq"])
        for r in similarity.pq_refine_codebook(
            codes, cb, m=8, rounds=1, engine="catalyst"
        ).collect()
    }
    cb_npy = {
        (r["code_id"], r["sub"], r["pos"], r["cq"])
        for r in similarity.pq_refine_codebook(
            codes, cb, m=8, rounds=1, engine="numpy"
        ).collect()
    }
    assert cb_npy == cb_cat


def test_ivfpq_rerank_default_recalls_flat(spark):
    """r12 verdict #1: the DEFAULT ivfpq_search path must return real
    answers — with the shortlist covering the probed candidates, the
    reranked result must EQUAL ivfflat_search over the same index and
    nprobe (both score the same candidate set with the same exact
    cosine), which makes its recall the flat path's recall, not ADC's."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    idx = similarity.ivfpq_index(emb, n_centroids=16, m=8, k=16)
    pred = F.col("vec_id") < 5
    reranked = {
        (r["query_id"], r["vec_id"], r["rank"])
        for r in similarity.ivfpq_search(
            idx, emb, pred, nprobe=4, top_k=10, shortlist=10**6
        ).collect()
    }
    flat = {
        (r["query_id"], r["vec_id"], r["rank"])
        for r in similarity.ivfflat_search(
            idx, emb, pred, nprobe=4, top_k=10
        ).collect()
    }
    assert reranked == flat


def test_round_half_up_q_matches_spark_round(spark):
    """_round_half_up_q (the numpy ivf_assign quantizer) must agree
    with Spark's round(x * 1e7) on EVERY double, including values one
    ulp below a .5 boundary where floor(x+0.5) on the binary double
    disagrees with BigDecimal HALF_UP on the shortest-decimal value
    (ADVICE r12: 0.49999999999999994 + 0.5 == 1.0 but rounds to 0).
    Adversarial inputs: neighbors of k+0.5 boundaries (both signs,
    small and large k), the classic one-ulp-below-half doubles, and a
    deterministic pseudo-random sample."""
    import numpy as np

    vals = [0.49999999999999994e-7, -0.49999999999999994e-7]
    for k in (0, 1, 2, 7, 123, 2**20 + 3):
        b = (k + 0.5) / 1e7
        for d in (-2, -1, 0, 1, 2):
            x = b
            for _ in range(abs(d)):
                x = float(np.nextafter(x, np.inf if d > 0 else -np.inf))
            vals.extend([x, -x])
    rng = np.random.default_rng(20260816)
    vals.extend((rng.random(200) * 2.0 - 1.0).tolist())
    arr = np.array(vals, dtype=np.float64)
    ours = similarity._round_half_up_q(arr)
    sdf = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "i long, x double"
    ).select("i", F.expr("cast(round(x * 10000000) as bigint) as q"))
    theirs = {r["i"]: r["q"] for r in sdf.collect()}
    for i, v in enumerate(vals):
        assert int(ours[i]) == theirs[i], (v, int(ours[i]), theirs[i])


def test_ivfpq_defaults_are_the_measured_config():
    """r12 verdict #3: ivfpq_index's DEFAULTS must be the configuration
    the bench measures (k=256 codebook, one Lloyd refinement round,
    auto encoder resolving to numpy) — not the lossier k=16/unrefined
    config that raw-ADC benches proved shortlist-grade at best."""
    import inspect

    sig = inspect.signature(similarity.ivfpq_index)
    assert sig.parameters["k"].default == 256
    assert sig.parameters["refine_rounds"].default == 1
    assert sig.parameters["encoder"].default == "auto"
    assert similarity._resolve_encoder("auto") == "numpy"
    assert similarity._resolve_encoder("catalyst") == "catalyst"
    one_shot = inspect.signature(similarity.ann_topk_ivfpq)
    assert one_shot.parameters["k"].default == 256
    assert one_shot.parameters["refine_rounds"].default == 1


def test_ivf_assign_numpy_equals_catalyst(spark):
    """The numpy ivf_assign engine may only replace the Catalyst
    crossJoin+window plan (corpus × C rows through an exchange) if every
    probed-list assignment matches exactly. The cosine arithmetic is
    exact-integer dot / deterministic IEEE norm product on both sides,
    so equality is bit-for-bit, not approximate — checked at nprobe=1
    (the index build shape) and nprobe=3 (the query multi-probe shape)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = similarity.ivf_centroids(emb, 16)
    for nprobe in (1, 3):
        cat = {
            (r["vec_id"], r["centroid_id"])
            for r in similarity.ivf_assign(
                emb, cents, nprobe=nprobe, engine="catalyst"
            ).collect()
        }
        npy = {
            (r["vec_id"], r["centroid_id"])
            for r in similarity.ivf_assign(
                emb, cents, nprobe=nprobe, engine="numpy"
            ).collect()
        }
        assert npy == cat


def test_ivfpq_index_numpy_encoder_matches_catalyst_index(spark):
    """ivfpq_index(encoder="numpy") — the 1M-bench build path — must
    produce the same lists and the same PQ code assignment as the
    all-Catalyst build (same corpus, same seeds, same codebook).
    Catalyst is pinned explicitly on one side — since r13 the default
    encoder resolves to numpy, so an unpinned pair would compare the
    numpy engine against itself."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = similarity.ivfpq_index(
        emb, n_centroids=8, m=8, k=16, encoder="catalyst"
    )
    b = similarity.ivfpq_index(emb, n_centroids=8, m=8, k=16, encoder="numpy")
    assert {
        (r["vec_id"], r["centroid_id"]) for r in a.lists.collect()
    } == {(r["vec_id"], r["centroid_id"]) for r in b.lists.collect()}
    assert {
        (r["vec_id"], r["sub"], r["code_id"]) for r in a.enc.collect()
    } == {(r["vec_id"], r["sub"], r["code_id"]) for r in b.enc.collect()}


def test_knn_graph_mutual_and_cap(spark):
    """mutual=True keeps exactly the edges whose reverse also ranked;
    max_list caps candidate targets but never drops a SOURCE row."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    edges = similarity.knn_graph(emb, k=3, num_centroids=4)
    e = {(r["src_id"], r["dst_id"]) for r in edges.collect()}
    m = {
        (r["src_id"], r["dst_id"])
        for r in similarity.knn_graph(
            emb, k=3, num_centroids=4, mutual=True
        ).collect()
    }
    assert m == {(a, b) for (a, b) in e if (b, a) in e}
    assert m  # the fixture is dense enough that some edges are mutual
    # a binding cap: every source still appears, targets shrink
    capped = similarity.knn_graph(emb, k=3, num_centroids=4, max_list=5)
    srcs_all = {r["src_id"] for r in edges.collect()}
    srcs_cap = {r["src_id"] for r in capped.collect()}
    assert srcs_cap == srcs_all
    dsts_cap = {r["dst_id"] for r in capped.collect()}
    assert len(dsts_cap) <= 4 * 5


def test_ivfpq_flat_relation_matches_sql_operators(spark):
    """The fused flat relation (r16: one Arrow pass emits assignment +
    exact-cosine quantization + int8 codes) must reproduce the standalone
    SQL operators bit-for-bit — ``_q``/``_norm`` equal ``_with_qnorm``'s
    and ``q``/``n_dims`` equal ``quantize_int8``'s, per row — including
    the frozen-calibration CLAMP path for appended out-of-range vectors."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    idx = similarity.ivfpq_index(emb, n_centroids=8, m=8, k=16, encoder="numpy")
    sql_codes = {
        r["vec_id"]: (list(r["q"]), r["n_dims"])
        for r in similarity.quantize_int8(emb).collect()
    }
    sql_qn = {
        r["vec_id"]: (list(r["_q"]), r["_norm"])
        for r in similarity._with_qnorm(emb, "vec_id", "embedding").collect()
    }
    flat_rows = idx.flat.collect()
    assert {r["vec_id"] for r in flat_rows} == set(sql_codes)
    for r in flat_rows:
        assert (list(r["q"]), r["n_dims"]) == sql_codes[r["vec_id"]]
        # float equality on purpose: same exact ints, same IEEE sqrt
        assert (list(r["_q"]), r["_norm"]) == sql_qn[r["vec_id"]]

    # frozen-calibration clamp: vectors scaled far outside the stored
    # [mn, mx] range must saturate identically in both engines
    drift = emb.filter(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 10_000).alias("vec_id"),
        F.expr("transform(embedding, x -> x * 3.0D + 1.5D)").alias(
            "embedding"
        ),
    )
    idx2 = similarity.ivfpq_append(idx, drift)
    drifted = {
        r["vec_id"]: list(r["q"])
        for r in idx2.flat.filter(F.col("vec_id") >= 10_000).collect()
    }
    sql_drift = {
        r["vec_id"]: list(r["q"])
        for r in similarity.quantize_int8(
            drift, calibration=idx.calib
        ).collect()
    }
    assert drifted == sql_drift
    assert any(
        c in (-128, 127) for codes in drifted.values() for c in codes
    ), "drifted vectors should hit the clamp"


def test_ivfpq_append_frozen_model(spark):
    """ivfpq_append must leave every stored row untouched (frozen
    calibration/codebook/centroids — a recalibrating append would
    silently re-mean stored codes), add exactly the delta's rows, and
    the appended index must retrieve delta vectors as neighbors."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    base = emb.filter(F.col("vec_id") % 5 != 4)
    delta = emb.filter(F.col("vec_id") % 5 == 4)
    idx = similarity.ivfpq_index(base, n_centroids=8, m=8, k=16)
    before_enc = {(r["vec_id"], r["sub"], r["code_id"]) for r in idx.enc.collect()}
    before_lists = {(r["vec_id"], r["centroid_id"]) for r in idx.lists.collect()}
    idx2 = similarity.ivfpq_append(idx, delta)
    after_enc = {(r["vec_id"], r["sub"], r["code_id"]) for r in idx2.enc.collect()}
    after_lists = {(r["vec_id"], r["centroid_id"]) for r in idx2.lists.collect()}
    assert before_enc <= after_enc and before_lists <= after_lists
    n_delta = delta.count()
    assert len(after_lists) == len(before_lists) + n_delta
    delta_ids = {r["vec_id"] for r in delta.select("vec_id").collect()}
    assert {v for v, _ in after_lists - before_lists} == delta_ids
    # the search must actually see appended vectors: with nprobe at max
    # every list is probed, so the reranked result equals exact cosine
    # over the union — which includes delta neighbors
    got = {
        (r["query_id"], r["vec_id"])
        for r in similarity.ivfpq_search(
            idx2, emb, F.col("vec_id") < 3, nprobe=8, top_k=10,
            shortlist=10**6,
        ).collect()
    }
    exact = {
        (r["query_id"], r["vec_id"])
        for r in similarity.cosine_topk(
            emb, emb.filter(F.col("vec_id") < 3), k=10
        ).collect()
    }
    assert got == exact
    assert any(v in delta_ids for _, v in got)


def test_knn_graph_numpy_equals_catalyst(spark):
    """The numpy per-list scorer may only replace the Catalyst
    per-pair lambda aggregate if every edge, score, and rank matches
    exactly — same exact-integer dot, same IEEE divide, same
    (cosine desc, id asc) tie-break, same md5 target cap."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    for kwargs in (
        dict(k=3, num_centroids=4),
        dict(k=5, num_centroids=8, max_list=10),  # binding cap
    ):
        cat = {
            (r["src_id"], r["dst_id"], r["cosine_sim"], r["rank"])
            for r in similarity.knn_graph(
                emb, engine="catalyst", **kwargs
            ).collect()
        }
        npy = {
            (r["src_id"], r["dst_id"], r["cosine_sim"], r["rank"])
            for r in similarity.knn_graph(
                emb, engine="numpy", **kwargs
            ).collect()
        }
        assert npy == cat, kwargs


def test_knn_graph_zero_norm_engines_agree(spark):
    """A zero vector's pairs score NULL cosine but still rank (NULLS
    LAST) — both engines must emit the identical edge set including the
    NULL-cosine rows (r12 review: the numpy engine dropped them)."""
    rows = [(i, [float(i % 7 + 1), float((i * 3) % 5 + 1)]) for i in range(1, 12)]
    rows.append((0, [0.0, 0.0]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cat = {
        (r["src_id"], r["dst_id"], r["cosine_sim"], r["rank"])
        for r in similarity.knn_graph(
            emb, k=11, num_centroids=2, engine="catalyst"
        ).collect()
    }
    npy = {
        (r["src_id"], r["dst_id"], r["cosine_sim"], r["rank"])
        for r in similarity.knn_graph(
            emb, k=11, num_centroids=2, engine="numpy"
        ).collect()
    }
    assert npy == cat
    assert any(c is None for _, _, c, _ in cat)  # the zero vector's pairs
