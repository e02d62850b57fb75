"""Count-Min sketch (operators/sketches.py, r13): the overestimate-only
law, exactness when collision-free, mergeability (the property that
makes it a 100 TB operator), weights, unseen keys, and validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from muninn_avro_to_parquet_spark.operators import sketches


def _freqs(spark, pairs):
    rows = [(k,) for k, n in pairs for _ in range(n)]
    return spark.createDataFrame(rows, "k string"), dict(pairs)


def test_cms_overestimate_only_and_exact_when_wide(spark):
    df, truth = _freqs(
        spark, [("a", 50), ("b", 7), ("c", 1), ("dd", 13), ("e", 29)]
    )
    keys = spark.createDataFrame([(k,) for k in truth], "k string")
    # narrow sketch: collisions likely → est >= true on EVERY key
    cms = sketches.count_min_build(df, "k", depth=3, width=4)
    est = {
        r["k"]: r["est_cnt"]
        for r in sketches.count_min_query(cms, keys, "k", depth=3, width=4).collect()
    }
    assert set(est) == set(truth)
    assert all(est[k] >= truth[k] for k in truth), (est, truth)
    # wide sketch: 5 keys in 3x(1<<14) counters collide with prob ~0 →
    # estimates are EXACT
    cms_w = sketches.count_min_build(df, "k", depth=3, width=1 << 14)
    est_w = {
        r["k"]: r["est_cnt"]
        for r in sketches.count_min_query(
            cms_w, keys, "k", depth=3, width=1 << 14
        ).collect()
    }
    assert est_w == truth


def test_cms_merge_equals_whole(spark):
    """sketch(A) ⊎ sketch(B) re-summed == sketch(A ∪ B) cell-for-cell —
    the shard/stream merge that makes the sketch usable at scale."""
    a, _ = _freqs(spark, [("x", 9), ("y", 4)])
    b, _ = _freqs(spark, [("x", 2), ("z", 6)])
    sa = sketches.count_min_build(a, "k", depth=2, width=16)
    sb = sketches.count_min_build(b, "k", depth=2, width=16)
    merged = (
        sa.unionByName(sb).groupBy("row", "col").agg(F.sum("cnt").alias("cnt"))
    )
    whole = sketches.count_min_build(a.unionByName(b), "k", depth=2, width=16)
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in whole.collect()
    }


def test_cms_unseen_key_weights_and_nulls(spark):
    df = spark.createDataFrame(
        [("a", 5), ("a", 3), ("b", 2), (None, 99)], "k string, w long"
    )
    cms = sketches.count_min_build(df, "k", depth=2, width=1 << 10, weight_col="w")
    keys = spark.createDataFrame([("a",), ("b",), ("ghost",), (None,)], "k string")
    est = {
        r["k"]: r["est_cnt"]
        for r in sketches.count_min_query(
            cms, keys, "k", depth=2, width=1 << 10
        ).collect()
    }
    # weighted counts; NULL keys hash nowhere (excluded both sides)
    assert est == {"a": 8, "b": 2, "ghost": 0}


def test_cms_validation():
    with pytest.raises(ValueError, match="depth"):
        sketches.count_min_build(None, "k", depth=0)


# --- quantile sketch (r15 verdict #6) ---


def _prices(spark, sf="/root/testdata/sf0.01"):
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    return li.select(
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("rid"),
        F.col("l_extendedprice").alias("price"),
    )


def test_quantile_sketch_merge_equals_whole(spark):
    """shard ⊎ shard ≡ whole, BIT-exactly — the law that makes the
    md5-rank bottom-k the mergeable quantile summary (and the reason a
    literal KLL/t-digest, whose compaction is sequence-dependent, was
    not the design): membership is a pure row predicate, so any disjoint
    sharding unions back to the identical sample. 2-way and 3-way."""
    rel = _prices(spark)
    whole = sorted(
        map(tuple, sketches.quantile_sketch_build(rel, "price", "rid", k=256).collect())
    )
    for n_shards in (2, 3):
        shards = [
            sketches.quantile_sketch_build(
                rel.filter(F.col("rid") % n_shards == i), "price", "rid", k=256
            )
            for i in range(n_shards)
        ]
        merged = sorted(
            map(tuple, sketches.quantile_sketch_merge(shards, k=256).collect())
        )
        assert merged == whole, n_shards


def test_quantile_sketch_error_bound_law(spark):
    """Rank error of every estimated quantile stays ≤ 40,000 ppm (4%)
    at k=1024 on two different value distributions — deterministic (the
    md5 draw is fixed), so this is a pinned law, not a flaky sample."""
    qs = [1, 5, 25, 50, 75, 95, 99]
    rels = {
        "lineitem_price": _prices(spark),
        "documents_chars": spark.read.parquet(
            "/root/testdata/sf0.01/documents.parquet"
        ).select(F.col("doc_id").alias("rid"), F.col("n_chars").alias("price")),
    }
    for name, rel in rels.items():
        n_total = rel.count()
        sk = sketches.quantile_sketch_build(rel, "price", "rid", k=1024)
        for r in sketches.quantile_sketch_query(sk, qs).collect():
            lt = rel.filter(F.col("price") < r["est"]).count()
            err = abs(1_000_000 * lt // n_total - r["q_pct"] * 10_000)
            assert err <= 40_000, (name, r["q_pct"], err)


def test_quantile_sketch_small_corpus_and_nulls(spark):
    """k larger than the corpus keeps every row (the sample IS the data
    → estimates are exact order statistics); NULL values are excluded;
    validation errors are loud."""
    rows = [(i, float(v)) for i, v in enumerate([50, 10, 30, 20, 40])]
    df = spark.createDataFrame(rows + [(99, None)], "rid long, price double")
    sk = sketches.quantile_sketch_build(df, "price", "rid", k=100)
    assert sk.count() == 5  # NULL excluded, all non-null kept
    est = {
        r["q_pct"]: r["est"]
        for r in sketches.quantile_sketch_query(sk, [1, 20, 40, 60, 80, 100]).collect()
    }
    # n=5: idx = ceil(q*5/100) clamped to >= 1 → exact order statistics
    assert est == {1: 10.0, 20: 10.0, 40: 20.0, 60: 30.0, 80: 40.0, 100: 50.0}
    with pytest.raises(ValueError):
        sketches.quantile_sketch_build(df, "price", "rid", k=0)
    with pytest.raises(ValueError):
        sketches.quantile_sketch_query(sk, [])
    with pytest.raises(ValueError):
        sketches.quantile_sketch_query(sk, [0])
    with pytest.raises(ValueError):
        sketches.quantile_sketch_merge([], k=4)


def test_quantile_sketch_grouped_merge_and_small_groups(spark):
    """Per-group merge law (2-way and 3-way) and the small-group
    degenerate case: a group with fewer than k rows keeps them ALL, so
    its estimates are exact order statistics."""
    rel = _prices(spark).withColumn("g", (F.col("rid") % 7).cast("int"))
    whole = sorted(
        map(
            tuple,
            sketches.quantile_sketch_build_grouped(
                rel, "price", "rid", "g", k=64
            ).collect(),
        )
    )
    for n_shards in (2, 3):
        shards = [
            sketches.quantile_sketch_build_grouped(
                rel.filter(F.col("rid") % n_shards == i), "price", "rid", "g", k=64
            )
            for i in range(n_shards)
        ]
        merged = sorted(
            map(
                tuple,
                sketches.quantile_sketch_merge_grouped(shards, k=64).collect(),
            )
        )
        assert merged == whole, n_shards
    # small groups: 3 rows per group, k=10 -> exact order statistics
    tiny = spark.createDataFrame(
        [(g * 10 + i, float((i + 1) * 100), g) for g in range(2) for i in range(3)],
        "rid long, price double, g int",
    )
    sk = sketches.quantile_sketch_build_grouped(tiny, "price", "rid", "g", k=10)
    est = {
        (r["g"], r["q_pct"]): r["est"]
        for r in sketches.quantile_sketch_query_grouped(sk, [1, 34, 67, 100]).collect()
    }
    # n=3: idx = max(1, ceil(q*3/100)) -> q=1:1st, 34:2nd, 67:3rd, 100:3rd
    for g in range(2):
        assert est[(g, 1)] == 100.0 and est[(g, 34)] == 200.0
        assert est[(g, 67)] == 300.0 and est[(g, 100)] == 300.0


def test_quantile_sketch_grouped_error_bound_law(spark):
    """Per-group rank error stays ≤ 80,000 ppm at k=256 on the orders
    priority groups — deterministic md5 draw, a pinned law."""
    o = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    rel = o.select(
        F.col("o_orderkey").alias("rid"),
        F.col("o_totalprice").alias("price"),
        F.col("o_orderpriority").alias("g"),
    )
    sizes = {r["g"]: r["n"] for r in rel.groupBy("g").agg(F.count("*").alias("n")).collect()}
    sk = sketches.quantile_sketch_build_grouped(rel, "price", "rid", "g", k=256)
    for r in sketches.quantile_sketch_query_grouped(sk, [25, 50, 75, 95]).collect():
        lt = rel.filter((F.col("g") == r["g"]) & (F.col("price") < r["est"])).count()
        err = abs(1_000_000 * lt // sizes[r["g"]] - r["q_pct"] * 10_000)
        assert err <= 80_000, (r["g"], r["q_pct"], err)


def test_quantile_sketch_grouped_salt_transparent(spark):
    """The few-groups salt dial never changes the result: a group's
    true bottom-k survives every salt's bottom-k, so n_salts 1, 8, 32
    produce the identical sketch relation."""
    rel = _prices(spark).withColumn("g", (F.col("rid") % 3).cast("int"))
    base = sorted(
        map(
            tuple,
            sketches.quantile_sketch_build_grouped(
                rel, "price", "rid", "g", k=128, n_salts=1
            ).collect(),
        )
    )
    for n_salts in (8, 32):
        salted = sorted(
            map(
                tuple,
                sketches.quantile_sketch_build_grouped(
                    rel, "price", "rid", "g", k=128, n_salts=n_salts
                ).collect(),
            )
        )
        assert salted == base, n_salts
    with pytest.raises(ValueError):
        sketches.quantile_sketch_build_grouped(rel, "price", "rid", "g", k=4, n_salts=0)


def test_quantile_sketch_duplicate_ids_deterministic(spark):
    """Colliding ids with DIVERGING values (the sf0.001 lineitem rid
    collision that made q_profile_quantiles nondeterministic, r15
    optimization round) must produce a sample that is a pure function
    of the row multiset: the (h, id, v) bottom-k order resolves the
    tie by value, identically in every engine and under any
    partitioning."""
    rows = [(i % 7, float(i)) for i in range(50)]  # id 0..6, 7-8 rows each
    df = spark.createDataFrame(rows, "rid long, price double")
    a = sorted(
        map(tuple, sketches.quantile_sketch_build(df, "price", "rid", k=5).collect())
    )
    b = sorted(
        map(
            tuple,
            sketches.quantile_sketch_build(
                df.repartition(13), "price", "rid", k=5
            ).collect(),
        )
    )
    assert a == b
    # expected: bottom-5 of (h(rid), rid, price) computed independently
    import hashlib

    def h(rid):
        return int(hashlib.md5(f"q:{rid}".encode()).hexdigest()[:14], 16)

    exp = sorted((h(r), r, v) for r, v in rows)[:5]
    assert a == sorted(exp)
    g = df.withColumn("g", (F.col("rid") % 2).cast("int"))
    ga = sorted(
        map(
            tuple,
            sketches.quantile_sketch_build_grouped(
                g, "price", "rid", "g", k=3, n_salts=4
            ).collect(),
        )
    )
    gb = sorted(
        map(
            tuple,
            sketches.quantile_sketch_build_grouped(
                g.repartition(11), "price", "rid", "g", k=3, n_salts=1
            ).collect(),
        )
    )
    assert ga == gb


def test_quantile_sketch_grouped_rank_col_identical(spark):
    """The precomputed-rank path (rank_col) must reproduce the default
    build exactly — it exists so unpivoting callers can compute the md5
    draw once per SOURCE row (r15 optimization round), never to change
    the draw."""
    rel = _prices(spark).withColumn("g", (F.col("rid") % 3).cast("int"))
    pre = rel.withColumn("hh", sketches._qs_rank(F.col("rid")))
    base = sorted(
        map(
            tuple,
            sketches.quantile_sketch_build_grouped(
                rel, "price", "rid", "g", k=64, n_salts=8
            ).collect(),
        )
    )
    via_rank = sorted(
        map(
            tuple,
            sketches.quantile_sketch_build_grouped(
                pre, "price", "rid", "g", k=64, n_salts=8, rank_col="hh"
            ).collect(),
        )
    )
    assert via_rank == base


def test_distinct_sketch_merge_exact_and_estimates(spark):
    """KMV: shard ⊎ shard ≡ whole (hash sets collapse shared keys),
    below-capacity sketches count EXACTLY, at-capacity estimates obey
    the ~1/√k law (deterministic md5 draw, pinned bound), and
    validation is loud."""
    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    whole = sorted(
        r["h"] for r in sketches.distinct_sketch_build(li, "l_orderkey", k=512).collect()
    )
    for n_shards in (2, 3):
        shards = [
            sketches.distinct_sketch_build(
                li.filter(F.col("l_orderkey") % n_shards == i), "l_orderkey", k=512
            )
            for i in range(n_shards)
        ]
        merged = sorted(
            r["h"]
            for r in sketches.distinct_sketch_merge(shards, k=512).collect()
        )
        assert merged == whole, n_shards
    # overlapping shards: shared keys collapse to one hash
    s_even = sketches.distinct_sketch_build(
        li.filter(F.col("l_linenumber") <= 4), "l_orderkey", k=512
    )
    s_odd = sketches.distinct_sketch_build(
        li.filter(F.col("l_linenumber") >= 2), "l_orderkey", k=512
    )
    overlap = sorted(
        r["h"]
        for r in sketches.distinct_sketch_merge([s_even, s_odd], k=512).collect()
    )
    assert overlap == whole
    # exact below capacity
    small = spark.createDataFrame([(f"k{i % 9}",) for i in range(50)], "x string")
    est = sketches.distinct_sketch_estimate(
        sketches.distinct_sketch_build(small, "x", k=64), k=64
    ).first()
    assert (est["n_hashes"], est["est_distinct"]) == (9, 9)
    # at capacity: relative error within 10% on l_orderkey (true 14743)
    true = li.agg(F.countDistinct("l_orderkey")).first()[0]
    est = sketches.distinct_sketch_estimate(
        sketches.distinct_sketch_build(li, "l_orderkey", k=1024), k=1024
    ).first()
    assert abs(est["est_distinct"] - true) * 1_000_000 // true <= 100_000
    with pytest.raises(ValueError):
        sketches.distinct_sketch_build(small, "x", k=1)
    with pytest.raises(ValueError):
        sketches.distinct_sketch_merge([], k=8)


def test_distinct_sketch_overlap_exact_below_capacity(spark):
    """Below capacity the merged sketch is the whole union hash set, so
    union, intersection, and Jaccard are all EXACT — the degeneracy the
    rest of the family honors."""
    a = spark.createDataFrame([(f"k{i}",) for i in range(30)], "x string")
    b = spark.createDataFrame([(f"k{i}",) for i in range(20, 60)], "x string")
    ov = sketches.distinct_sketch_overlap(
        sketches.distinct_sketch_build(a, "x", k=128),
        sketches.distinct_sketch_build(b, "x", k=128),
        k=128,
    ).first()
    # |A|=30, |B|=40, inter=10, union=60
    assert ov["n_merged"] == 60
    assert ov["c_both"] == 10
    assert ov["union_est"] == 60
    assert ov["inter_est"] == 10
    assert ov["jaccard_est_ppm"] == 1_000_000 * 10 // 60
    # disjoint sets: zero intersection, exact union
    c = spark.createDataFrame([(f"z{i}",) for i in range(25)], "x string")
    ov2 = sketches.distinct_sketch_overlap(
        sketches.distinct_sketch_build(a, "x", k=128),
        sketches.distinct_sketch_build(c, "x", k=128),
        k=128,
    ).first()
    assert (ov2["c_both"], ov2["inter_est"], ov2["union_est"]) == (0, 0, 55)


def test_distinct_sketch_overlap_membership_is_exact_at_capacity(spark):
    """The load-bearing lemma: for every hash in the merged bottom-k,
    presence in an INPUT sketch is an exact test of presence in that
    input SET — so c_both equals the true intersection count restricted
    to the merged sample, computed here directly from the full hash
    sets."""
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    a = li.filter(F.col("l_linenumber") <= 3)
    b = li.filter(F.col("l_linenumber") >= 2)
    k = 64
    sk_a = sketches.distinct_sketch_build(a, "l_orderkey", k=k)
    sk_b = sketches.distinct_sketch_build(b, "l_orderkey", k=k)
    ov = sketches.distinct_sketch_overlap(sk_a, sk_b, k=k).first()
    assert ov["n_merged"] == k  # at capacity
    # ground truth from the FULL hash sets (no k cut)
    full_a = {
        r["h"]
        for r in sketches.distinct_sketch_build(a, "l_orderkey", k=1 << 20)
        .collect()
    }
    full_b = {
        r["h"]
        for r in sketches.distinct_sketch_build(b, "l_orderkey", k=1 << 20)
        .collect()
    }
    merged = sorted(full_a | full_b)[:k]
    want_c = sum(1 for h in merged if h in full_a and h in full_b)
    assert ov["c_both"] == want_c


def test_distinct_sketch_overlap_composes_with_shard_merge(spark):
    """Sketches built per shard and merged give the IDENTICAL overlap
    row as sketches built from the whole inputs — the merge law carries
    through the set algebra."""
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    a = li.filter(F.col("l_linenumber") <= 3)
    b = li.filter(F.col("l_linenumber") >= 2)
    k = 64
    whole = sketches.distinct_sketch_overlap(
        sketches.distinct_sketch_build(a, "l_orderkey", k=k),
        sketches.distinct_sketch_build(b, "l_orderkey", k=k),
        k=k,
    ).first()
    sharded_a = sketches.distinct_sketch_merge(
        [
            sketches.distinct_sketch_build(
                a.filter(F.col("l_orderkey") % 2 == i), "l_orderkey", k=k
            )
            for i in (0, 1)
        ],
        k=k,
    )
    sharded_b = sketches.distinct_sketch_merge(
        [
            sketches.distinct_sketch_build(
                b.filter(F.col("l_orderkey") % 3 == i), "l_orderkey", k=k
            )
            for i in (0, 1, 2)
        ],
        k=k,
    )
    sharded = sketches.distinct_sketch_overlap(sharded_a, sharded_b, k=k).first()
    assert tuple(whole) == tuple(sharded)


def test_distinct_sketch_overlap_validation(spark):
    a = spark.createDataFrame([("x",)], "x string")
    sk = sketches.distinct_sketch_build(a, "x", k=8)
    with pytest.raises(ValueError):
        sketches.distinct_sketch_overlap(sk, sk, k=1)
