"""Mergeable frequency sketches — the Count-Min table (Cormode &
Muthukrishnan 2005) as a RELATION.

The reference job has no sketch surface; this module extends the
engine's sketch family (Misra-Gries heavy hitters in ``text.py``, the
Bloom position set in ``dedup.decontaminate_bloom``, HLL++ via Spark's
``approx_count_distinct``) with the one classic it lacked: point
FREQUENCY estimates over a key space too large to count exactly, with
the overestimate-only guarantee (``est ≥ true`` always;
``est ≤ true + εN`` w.h.p. for ε = e/width).

Everything stays engine-deterministic (the repo's standing sketch
discipline): row ``r``'s hash of a key is the 56-bit prefix of
``md5(r || ':' || key)`` mod ``width`` — not a seeded/implementation-
defined hash — so the full counter table, the probe, and therefore
every estimate replays bit-for-bit in DuckDB.

Scale shape: the sketch IS a DataFrame of at most ``depth × width``
rows built by one map-side-combined aggregate over the key relation —
the 100 TB corpus never moves, only counter partials do; two sketches
(two corpus shards, a stream's micro-batches) merge by unioning and
re-summing, which is how CMS earns its keep at scale. Queries join the
``depth``-row probe set against the sketch — broadcast-sized by
construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cms_col(key: Column, row: int, width: int) -> Column:
    """Row ``row``'s counter column for ``key``: 56-bit md5 prefix mod
    width (same BIGINT-safe idiom as the Bloom positions)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{row}:"), key)), 1, 14),
            16,
            10,
        ).cast("long")
        % width
    )


def count_min_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1 << 14,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-Min sketch of the ``key_col`` multiset: one row per
    occurrence (or ``weight_col`` units per row) lands in ``depth``
    counters. Returns the counter RELATION (row int, col long,
    cnt long) — ≤ depth × width rows, mergeable by
    ``unionByName(...).groupBy("row","col").sum("cnt")``.

    NULL keys are excluded (a NULL hashes nowhere; count them
    separately if they matter). Plan: project → explode(depth) →
    hash-aggregate — partial aggregation combines map-side, so the
    shuffle moves counter partials, never key rows."""
    if depth < 1 or width < 2:
        raise ValueError(f"need depth >= 1 and width >= 2, got {depth}x{width}")
    key = F.col(key_col).cast("string")
    w = (
        F.col(weight_col).cast("long")
        if weight_col is not None
        else F.lit(1).cast("long")
    )
    cells = F.array(
        *[
            F.struct(
                F.lit(r).cast("int").alias("row"),
                _cms_col(key, r, width).alias("col"),
            )
            for r in range(depth)
        ]
    )
    return (
        df.filter(key.isNotNull())
        .select(F.explode(cells).alias("_c"), w.alias("_w"))
        .groupBy(F.col("_c.row").alias("row"), F.col("_c.col").alias("col"))
        .agg(F.sum("_w").alias("cnt"))
    )


def count_min_query(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1 << 14,
) -> DataFrame:
    """Point-frequency estimates for every DISTINCT key in ``keys``
    against a sketch built with the SAME (depth, width): est =
    min over the key's ``depth`` counters, absent counters read 0.
    Output: (key_col, est_cnt). The CMS law — est_cnt ≥ the key's true
    count, always (collisions only ADD) — is what the registry entry's
    oracle asserts per key.

    Plan: the probe relation is |keys| × depth rows; the join hits the
    ≤ depth × width sketch (broadcast it when collected small, or let
    AQE choose). The left join keeps never-seen keys (est 0)."""
    key = F.col(key_col).cast("string")
    probes = F.array(
        *[
            F.struct(
                F.lit(r).cast("int").alias("row"),
                _cms_col(key, r, width).alias("col"),
            )
            for r in range(depth)
        ]
    )
    probe = (
        keys.select(F.col(key_col)).filter(key.isNotNull()).distinct()
        .select(key_col, F.explode(probes).alias("_p"))
        .select(key_col, F.col("_p.row").alias("row"), F.col("_p.col").alias("col"))
    )
    return (
        probe.join(sketch, ["row", "col"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_cnt"))
    )


def distinct_sketch_build(df: DataFrame, key_col: str, k: int = 1024) -> DataFrame:
    """KMV (k-minimum-values) cardinality sketch: the ``k`` smallest
    DISTINCT 56-bit md5 hashes of the key — the mergeable distinct-count
    summary that completes the sketch family (CMS = frequency, bottom-k
    sample = rank, KMV = cardinality). Returns the hash RELATION
    (h long, ≤ k rows); ``distinct_sketch_estimate`` turns it into a
    count, ``distinct_sketch_merge`` unions shards.

    Same determinism discipline as every sketch here: the hash is the
    md5 prefix (``'d:' || key``), so the sketch, the estimate, and the
    error replay bit-for-bit in DuckDB — and the merge law is exact
    (bottom-k distinct of a union is a pure function of the key SET, so
    shard ⊎ shard ≡ whole; duplicate keys collapse to one hash by
    construction).

    Scale shape: one map-side-combined distinct on the hash (the same
    exchange COUNT(DISTINCT) pays, moving hash partials, never rows)
    then TakeOrderedAndProject for the k head. Estimate error is the
    classic KMV bound ~1/√k (≈3% at k=1024), fixed here because the
    draw is fixed."""
    if k < 2:
        raise ValueError(f"need k >= 2, got {k}")
    key = F.col(key_col).cast("string")
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("d:"), key)), 1, 14), 16, 10
    ).cast("long")
    return (
        df.filter(key.isNotNull())
        .select(h.alias("h"))
        .distinct()
        .orderBy(F.asc("h"))
        .limit(k)
    )


def distinct_sketch_merge(sketches: list[DataFrame], k: int = 1024) -> DataFrame:
    """⊎ of shard KMV sketches: union, dedupe, bottom-k again — exactly
    the whole-corpus sketch (hashes of shared keys collapse)."""
    if not sketches:
        raise ValueError("distinct_sketch_merge needs at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.distinct().orderBy(F.asc("h")).limit(k)


def distinct_sketch_estimate(sketch: DataFrame, k: int = 1024) -> DataFrame:
    """1-row estimate relation (n_hashes long, est_distinct long): with
    fewer than k hashes the sketch IS the distinct set (exact count);
    at capacity the KMV estimator ``(k−1) · 2^56 div h_(k)`` applies,
    in DECIMAL(38,0) so the product is exact far past the long range
    (the DuckDB oracle mirrors it in HUGEINT)."""
    if k < 2:
        raise ValueError(f"need k >= 2, got {k}")
    return sketch.agg(
        F.count("*").cast("long").alias("n_hashes"),
        F.max("h").alias("_hk"),
    ).select(
        "n_hashes",
        F.when(F.col("n_hashes") < k, F.col("n_hashes"))
        .otherwise(
            F.expr(
                f"cast((cast({k - 1} as decimal(38,0)) * 72057594037927936)"
                " div _hk as bigint)"
            )
        )
        .cast("long")
        .alias("est_distinct"),
    )


def distinct_sketch_overlap(
    sk_a: DataFrame, sk_b: DataFrame, k: int = 1024
) -> DataFrame:
    """KMV set algebra: union, intersection, and Jaccard cardinality
    estimates for two key sets from their bottom-k sketches ALONE — the
    100 TB corpus-overlap question ("how much of crawl B is already in
    crawl A?") answered without ever joining the corpora. Input: two
    ``distinct_sketch_build`` relations over the SAME key domain (the
    md5 draw must match for hashes to be comparable).

    Correctness shape (Beyer et al., "On synopses for distinct-value
    estimation under multiset operations", SIGMOD 2007 — public
    literature): the bottom-k of ``sk_a ⊎ sk_b`` IS the union's KMV
    sketch (the exact merge law), and for every hash h in that merged
    bottom-k, membership in each INPUT sketch is an EXACT test of set
    membership — h among the union's k smallest and h ∈ A implies
    fewer than k A-hashes below h, so h is among A's k smallest. The
    fraction c/|M| of merged hashes present in both inputs is
    therefore a uniform k-sample estimate of the Jaccard similarity,
    and ``inter_est = c · union_est div |M|``. Below capacity
    (|A ∪ B| < k) the merged sketch is the whole union hash set, c is
    the true intersection count, and every output is EXACT — the same
    degeneracy the other family members honor.

    All arithmetic is integer (the union estimator in DECIMAL(38,0),
    ratios in ppm via integer div), so the DuckDB oracle replays every
    output bit-for-bit. Output (one row): n_merged, c_both,
    union_est, inter_est, jaccard_est_ppm — all long.

    Scale shape: the inputs are ≤ k-row relations; everything here is
    two broadcast joins and one aggregate over ≤ k rows. The corpus
    passes already happened when the sketches were built — shard
    sketches union in, per the merge law, so fleet-wide overlap is a
    metadata-sized computation. Each input sketch is referenced twice
    (the merge and its membership join), so both are session-cached
    here — without that, lazy evaluation would re-run each input's
    corpus scan+top-k a second time for the membership side."""
    if k < 2:
        raise ValueError(f"need k >= 2, got {k}")
    from muninn_avro_to_parquet_spark.operators.cacheutil import cache_scoped

    sk_a = cache_scoped(sk_a, "kmv_overlap_a")
    sk_b = cache_scoped(sk_b, "kmv_overlap_b")
    m = distinct_sketch_merge([sk_a, sk_b], k=k)
    flagged = (
        m.join(
            F.broadcast(sk_a.select(F.col("h"), F.lit(True).alias("_in_a"))),
            "h",
            "left",
        )
        .join(
            F.broadcast(sk_b.select(F.col("h"), F.lit(True).alias("_in_b"))),
            "h",
            "left",
        )
        .select(
            "h",
            (F.col("_in_a").isNotNull() & F.col("_in_b").isNotNull()).alias(
                "_both"
            ),
        )
    )
    agg = flagged.agg(
        F.count("*").cast("long").alias("n_merged"),
        F.sum(F.col("_both").cast("long")).cast("long").alias("c_both"),
        F.max("h").alias("_hk"),
    )
    union_est = (
        F.when(F.col("n_merged") < k, F.col("n_merged"))
        .otherwise(
            F.expr(
                f"cast((cast({k - 1} as decimal(38,0)) * 72057594037927936)"
                " div _hk as bigint)"
            )
        )
        .cast("long")
    )
    return agg.select(
        "n_merged",
        "c_both",
        union_est.alias("union_est"),
    ).select(
        "n_merged",
        "c_both",
        "union_est",
        F.expr(
            "case when n_merged = 0 then 0"
            " else c_both * union_est div n_merged end"
        )
        .cast("long")
        .alias("inter_est"),
        F.expr(
            "case when n_merged = 0 then 0"
            " else 1000000 * c_both div n_merged end"
        )
        .cast("long")
        .alias("jaccard_est_ppm"),
    )


def _qs_rank(id_expr: Column) -> Column:
    """The md5 sampling rank of a row: 56-bit prefix of ``md5('q:'||id)``
    as BIGINT — the same BIGINT-safe idiom as the CMS counters, prefixed
    so a value reused as a CMS key lands elsewhere."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit("q:"), id_expr.cast("string"))), 1, 14),
        16,
        10,
    ).cast("long")


def quantile_sketch_build(
    df: DataFrame,
    value_col: str,
    id_col: str,
    k: int = 1024,
) -> DataFrame:
    """Mergeable quantile sketch: the ``k`` rows whose md5 sampling rank
    is smallest — a bottom-k uniform sample keyed by deterministic
    md5-of-id "randomness", the repo's standing sketch discipline.
    Returns the sample RELATION (h long, id, v) ordered nowhere (it is
    a set); ``quantile_sketch_query`` turns it into rank estimates.

    Why not a literal KLL / t-digest: their compactions are
    SEQUENCE-dependent (which pairs collapse depends on arrival and
    merge order), so ``sketch(A) ⊎ sketch(B)`` can never be proven
    bit-identical to ``sketch(A ∪ B)`` — only error-equivalent. The
    bottom-k sample is the homomorphic summary: membership is a pure
    row predicate (rank among the k smallest), so shard ⊎ shard ≡ whole
    EXACTLY (pinned in tests/test_sketches.py), every engine replays it
    bit-for-bit, and the classic sample bound still holds — rank error
    ≤ ε·N with k = O(1/ε²) (P(|err| > εN) ≤ 2·exp(−2kε²), fixed here
    because the md5 draw is fixed). The price is O(1/ε²) space vs KLL's
    O(1/ε·log²log(1/δ)) — at k=1024 the sketch is 24 KB, noise next to
    a 100 TB scan.

    Scale shape: ONE TakeOrderedAndProject (map-side per-partition
    top-k, driver-side merge of partition heads) — the corpus never
    shuffles, no full sort. ``id_col`` SHOULD be row-unique (it IS the
    random draw); NULL values are excluded like every profile relation.
    Merge = union the shard sketches and take bottom-k again
    (``quantile_sketch_merge``).

    Duplicate-id hardening (r15 optimization round): the bottom-k order
    is (h, id, v) — with a row-unique id the v never matters, but when
    ids collide (two rows, same draw, different values) a bare (h, id)
    order leaves the k-boundary pick to the engine's arbitrary tie
    resolution, and the sf0.001 lineitem corpus exposed exactly that
    (Spark and DuckDB disagreeing on one sample row ⇒ one estimate).
    With v in the order the sample is a pure function of the row
    multiset again: rows equal in (id, v) are interchangeable."""
    if k < 1:
        raise ValueError(f"need k >= 1, got {k}")
    rel = (
        df.filter(F.col(value_col).isNotNull())
        .select(
            _qs_rank(F.col(id_col)).alias("h"),
            F.col(id_col).alias("id"),
            F.col(value_col).alias("v"),
        )
    )
    return rel.orderBy(F.asc("h"), F.asc("id"), F.asc("v")).limit(k)


def quantile_sketch_merge(sketches: list[DataFrame], k: int = 1024) -> DataFrame:
    """⊎ of shard sketches: union, bottom-k again. Exactly equal to the
    whole-corpus build because bottom-k is a pure function of the
    multiset of (h, id, v) rows (shards are disjoint in id)."""
    if not sketches:
        raise ValueError("quantile_sketch_merge needs at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.orderBy(F.asc("h"), F.asc("id"), F.asc("v")).limit(k)


def quantile_sketch_build_grouped(
    df: DataFrame,
    value_col: str,
    id_col: str,
    group_col: str,
    k: int = 256,
    n_salts: int = 1,
    rank_col: str | None = None,
) -> DataFrame:
    """Per-GROUP mergeable quantile sketch — the production profiling
    ask at 100 TB is per-key tails ("p50/p95/p99 per service"), and an
    exact per-group percentile costs a full exchange of every value.
    This keeps each group's bottom-``k`` md5-rank rows: output
    (g, h, id, v), ≤ k rows per group, with the same exact merge law as
    the global sketch per group (membership is still a pure row
    predicate within its group).

    Plan: ONE hash exchange on the group key (the same shuffle any
    per-group aggregate pays) + a rank window; rows past rank k are
    dropped before anything else touches them. Merge = union shards and
    re-take per-group bottom-k (``quantile_sketch_merge_grouped``).
    NULL groups carry no identity and are excluded, like NULL keys
    everywhere in the profile family.

    ``n_salts`` > 1 is the FEW-GROUPS dial (per-COLUMN profiling has a
    handful of groups; a single window per group would funnel each
    column's whole corpus through one task): a first rank window over
    (g, h % n_salts) keeps k rows per salt — n_salts-way parallel —
    and the final per-group window ranks only ≤ k·n_salts survivors.
    Transparent to the result: a group's true bottom-k survives every
    salt's bottom-k, so the output is IDENTICAL for any n_salts
    (pinned in tests/test_sketches.py), and the oracle never needs to
    know the salt.

    ``rank_col`` (r15 optimization round): name of a column already
    holding this row's md5 sampling rank (``_qs_rank(id)``), for callers
    that unpivot one source row into SEVERAL sketch rows sharing one
    draw — computing the md5 once per SOURCE row instead of once per
    unpivoted row is the profiling family's single biggest CPU line.
    Must equal ``_qs_rank(id_col)`` row-for-row (pinned in
    tests/test_sketches.py); default None computes it here."""
    if k < 1:
        raise ValueError(f"need k >= 1, got {k}")
    if n_salts < 1:
        raise ValueError(f"need n_salts >= 1, got {n_salts}")
    from pyspark.sql import Window

    rel = (
        df.filter(F.col(value_col).isNotNull() & F.col(group_col).isNotNull())
        .select(
            F.col(group_col).alias("g"),
            (
                F.col(rank_col) if rank_col is not None
                else _qs_rank(F.col(id_col))
            ).alias("h"),
            F.col(id_col).alias("id"),
            F.col(value_col).alias("v"),
        )
    )
    # (h, id, v) order everywhere a bottom-k is taken: duplicate-id
    # hardening, see quantile_sketch_build — rows equal in (id, v) are
    # interchangeable, anything else is deterministically resolved
    if n_salts > 1:
        ws = Window.partitionBy("g", F.col("h") % n_salts).orderBy(
            F.asc("h"), F.asc("id"), F.asc("v")
        )
        rel = (
            rel.withColumn("_srn", F.row_number().over(ws))
            .filter(F.col("_srn") <= k)
            .drop("_srn")
        )
    w = Window.partitionBy("g").orderBy(F.asc("h"), F.asc("id"), F.asc("v"))
    return (
        rel.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def quantile_sketch_merge_grouped(
    sketches: list[DataFrame], k: int = 256
) -> DataFrame:
    """⊎ of per-group shard sketches: union, per-group bottom-k again —
    exactly the whole-corpus grouped build (disjoint ids per shard)."""
    if not sketches:
        raise ValueError("quantile_sketch_merge_grouped needs at least one sketch")
    from pyspark.sql import Window

    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    w = Window.partitionBy("g").orderBy(F.asc("h"), F.asc("id"), F.asc("v"))
    return (
        out.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def quantile_sketch_query_grouped(
    sketch: DataFrame, quantiles_pct: list[int]
) -> DataFrame:
    """Per-group quantile estimates from the grouped sample alone: for
    each (g, q) the value at 1-based index ``greatest(1, (q·n_g + 99)
    div 100)`` of group g's sample ordered by (v, id) — n_g is the
    GROUP's sample size, so small groups degrade to exact order
    statistics. Output: (g, q_pct int, est, n_sample long). One window
    over the ≤ k·|groups| sketch rows; the probe list broadcasts."""
    if not quantiles_pct:
        raise ValueError("quantile_sketch_query_grouped needs at least one quantile")
    if not all(1 <= q <= 100 for q in quantiles_pct):
        raise ValueError(f"quantiles must be integer percent in [1, 100]: {quantiles_pct}")
    from pyspark.sql import Window

    w = Window.partitionBy("g").orderBy(F.asc("v"), F.asc("id"))
    ranked = sketch.select(
        "g",
        "v",
        F.row_number().over(w).alias("_rn"),
        F.count("*").over(Window.partitionBy("g")).alias("_n"),
    )
    spark = sketch.sparkSession
    qrel = spark.createDataFrame(
        [(int(q),) for q in quantiles_pct], "q_pct int"
    )
    return (
        ranked.crossJoin(F.broadcast(qrel))
        .filter(
            F.col("_rn")
            == F.greatest(
                F.lit(1), F.expr("cast((q_pct * _n + 99) div 100 as int)")
            )
        )
        .select(
            "g",
            "q_pct",
            F.col("v").alias("est"),
            F.col("_n").cast("long").alias("n_sample"),
        )
    )


def quantile_sketch_query(
    sketch: DataFrame, quantiles_pct: list[int]
) -> DataFrame:
    """Quantile estimates from the sample alone: for each q (percent),
    the value at 1-based index ``greatest(1, (q·n + 99) div 100)``
    (integer ceil — no float division anywhere) of the sample ordered
    by (v, id) — the index convention the DuckDB oracle mirrors
    verbatim. Output: (q_pct int, est v-type, n_sample long).
    Everything here is ≤ k rows; the window rides a constant partition
    key (the ``single_partition_key`` discipline) and the probe list
    broadcasts."""
    if not quantiles_pct:
        raise ValueError("quantile_sketch_query needs at least one quantile")
    if not all(1 <= q <= 100 for q in quantiles_pct):
        raise ValueError(f"quantiles must be integer percent in [1, 100]: {quantiles_pct}")
    from pyspark.sql import Window

    from muninn_avro_to_parquet_spark.plans.windows import single_partition_key

    w = Window.partitionBy(single_partition_key(F.col("v"))).orderBy(
        F.asc("v"), F.asc("id")
    )
    ranked = sketch.select(
        "v", F.row_number().over(w).alias("_rn"), F.count("*").over(
            Window.partitionBy(single_partition_key(F.col("v")))
        ).alias("_n")
    )
    spark = sketch.sparkSession
    qrel = spark.createDataFrame(
        [(int(q),) for q in quantiles_pct], "q_pct int"
    )
    return (
        ranked.crossJoin(F.broadcast(qrel))
        .filter(
            F.col("_rn")
            == F.greatest(
                F.lit(1), F.expr("cast((q_pct * _n + 99) div 100 as int)")
            )
        )
        .select(
            "q_pct",
            F.col("v").alias("est"),
            F.col("_n").cast("long").alias("n_sample"),
        )
    )
