"""Graph analytics over edge relations: fixed-point PageRank.

Crawl-scale corpora carry a link graph (``operators/html.py`` extracts
the outlinks), and the canonical whole-graph signal over it is
PageRank — used in training-data pipelines for source weighting and
crawl-frontier prioritization. This implementation follows the dedup
family's determinism discipline: all arithmetic is INTEGER fixed-point
(ranks in parts-per-``scale``, truncating division), so the same graph
produces bit-identical ranks on any engine, under any partitioning —
and a fixed iteration count unrolls into plain SQL for the DuckDB
oracle (the BPE/k-means pattern).

Update rule per iteration, all in integers (floor division; every
quantity is non-negative, so floor == truncation on both engines):

    contrib(u→v) = rank(u) div outdeg(u)
    dangling     = Σ rank(u) over nodes with outdeg 0
    rank'(v)     = (d_den−d_num)·(scale div N)
                   + d_num·(Σ contrib(·→v) + dangling div N)
                   , all div d_den

Spark shape (the 100 TB story): the edge relation is cached
hash-partitioned on ``src`` once — every iteration's contribution join
then reuses that partitioning; the per-destination sum is the one
shuffle per iteration, map-side combined. The dangling mass is a 1-row
aggregate broadcast into the update (never a driver collect), and each
iteration ends in a lazy ``localCheckpoint`` so the rank relation —
referenced by the contribution join, the dangling aggregate, and the
next update — is computed once per iteration instead of fanning out
exponentially. Rank relations are node-sized; edge-sized state never
rides a broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SCALE = 10**12


def _edge_cache(
    e: DataFrame, part_col: str, fill_with_count: bool = True
) -> tuple[DataFrame, DataFrame, int, int]:
    """Shared edge-cache preamble of every iterative graph loop
    (pagerank / label_propagation / hits): one wide cache to learn the
    edge count, then a narrow re-read re-cached hash-partitioned on the
    loop's join key so every iteration reuses the partitioning, with
    partitions sized at ~100k edges capped at core count. Returns
    (ecached, esized, n_edges, n_part); with ``fill_with_count`` the
    sized cache is filled and the wide one released here — pass False
    to fill it with a caller-side aggregate instead (the weighted
    pagerank validation job) and unpersist ``ecached`` yourself."""
    spark = e.sparkSession
    cores = spark.sparkContext.defaultParallelism
    ecached = e.cache()
    n_edges = ecached.count()
    n_part = max(1, min((n_edges + 99_999) // 100_000, cores))
    esized = ecached.repartition(n_part, part_col).cache()
    if fill_with_count:
        esized.count()
        ecached.unpersist()
    return ecached, esized, n_edges, n_part


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = DEFAULT_SCALE,
    weight_col: str | None = None,
    stats: dict | None = None,
    seeds: DataFrame | None = None,
    seed_col: str = "node",
) -> DataFrame:
    """(node, rank_fp) after ``iterations`` integer fixed-point PageRank
    rounds over the directed edge relation. ``rank_fp`` is in parts per
    ``scale``; Σ rank_fp ≈ scale (truncation loses at most N·iterations
    parts). Parallel edges are NOT deduplicated — pass a distinct edge
    relation if multiplicity should not add weight.

    ``weight_col``: optional POSITIVE-INTEGER edge weights (link
    multiplicity, anchor quality) — node u sends ``rank·w div Σw(u)``
    along each edge instead of ``rank div outdeg``. The product runs in
    DECIMAL(38,0) so rank·weight is exact far past the long range, and
    ``div`` keeps the floor-division contract the DuckDB oracle mirrors
    with HUGEINT ``//``.

    ``stats``: pass a dict to receive the attribution the bench reports
    (``regime`` — broadcast/shuffle, ``n_edges``, ``n_part``,
    ``n_nodes``, ``iter_walls``). Collecting walls forces each
    iteration's lazy checkpoint with a count — one extra O(1)-result
    job per iteration, the materialized partitions are reused by the
    next iteration either way.

    ``seeds``: pass a (``seed_col``) relation for PERSONALIZED pagerank
    (random walk with restart): the walk starts at the seeds, teleport
    mass returns only to seeds (split ``scale div S`` each), and
    dangling mass redistributes to seeds instead of everywhere — the
    crawl-frontier prioritization signal ("rank relative to my trusted
    hosts"). Seeds outside the node universe are ignored; same integer
    arithmetic, so the oracle unrolls identically."""
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    if not 0 < damping_num < damping_den:
        raise ValueError(
            f"need 0 < damping_num < damping_den, got {damping_num}/{damping_den}"
        )
    spark = edges.sparkSession
    wcol = (
        F.col(weight_col).cast("long")
        if weight_col is not None
        else F.lit(1).cast("long")
    )
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"), wcol.alias("w")
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    ecached, esized, n_edges, n_part = _edge_cache(
        e, "src", fill_with_count=weight_col is None
    )
    if weight_col is not None:
        # validate the positive-integer weight contract while the same
        # job fills the cache: w <= 0 (or NULL after the long cast) can
        # zero a node's degree, and Spark's `div` returns NULL on a
        # zero divisor — contributions would silently vanish where the
        # DuckDB oracle's HUGEINT `//` errors. Fail loud instead.
        wmin = esized.agg(
            F.min(F.coalesce(F.col("w"), F.lit(0))).alias("m")
        ).first()["m"]
        if wmin is not None and wmin <= 0:
            raise ValueError(
                f"pagerank weight_col={weight_col!r} must be a positive"
                f" integer on every edge; found min(w)={wmin}"
                " (NULLs count as 0)"
            )
        ecached.unpersist()
    # outdegree is STATIC — fold it into the rank relation ONCE (deg is
    # NULL for dangling nodes) and checkpoint. The first version of this
    # loop recomputed the outdeg aggregate lazily inside every iteration
    # (3 references/iteration → 3 extra edge-cache scans + shuffles per
    # round, visible in the sf0.1 bench) and resolved dangling mass with
    # a per-round anti-JOIN; with deg carried on the ranks row the
    # dangling mass is a plain filter-aggregate — no join, no shuffle.
    seed = nodes.join(
        esized.groupBy("src").agg(F.sum("w").alias("deg")),
        nodes["node"] == F.col("src"),
        "left",
    ).select("node", "deg")
    if seeds is not None:
        sflag = seeds.select(
            F.col(seed_col).alias("node"), F.lit(True).alias("_seed")
        ).distinct()
        seed = seed.join(sflag, "node", "left").select(
            "node", "deg", F.coalesce(F.col("_seed"), F.lit(False)).alias("_seed")
        )
    else:
        seed = seed.select("node", "deg", F.lit(True).alias("_seed"))
    # LAZY checkpoint forced by the sizes aggregate right below: the
    # full-scan agg drains every partition (the same guarantee the CC
    # loop's convergence count relies on), so the checkpoint is fully
    # materialized in the SAME job that returns the sizes — one job
    # where eager-checkpoint-then-agg paid two.
    seed = seed.coalesce(n_part).localCheckpoint(eager=False)
    # ONE action for both universe and restart-set size (r15: the
    # personalized variant used to pay a second full pass / extra job
    # for `seed.filter(_seed).count()`; the job-count audit attributed
    # its whole wall gap vs plain pagerank to preamble jobs like it)
    _sizes = seed.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("_seed"), 1).otherwise(0)).alias("s"),
    ).first()
    n_nodes = _sizes["n"]
    if n_nodes == 0:
        esized.unpersist()
        # empty result keeps the INPUT's node type (string-keyed URL /
        # host graphs must not come back as long) so downstream
        # joins/unions still pass analysis
        from pyspark.sql import types as T

        return spark.createDataFrame(
            [],
            T.StructType(
                [
                    T.StructField("node", e.schema["src"].dataType),
                    T.StructField("rank_fp", T.LongType()),
                ]
            ),
        )
    # S = the restart set size: every node for uniform pagerank (the
    # _seed flag is all-true, so the formulas below reduce exactly to
    # the classic ones and S is n_nodes with no extra count job), the
    # seed intersection for personalized
    n_seeds = n_nodes if seeds is None else int(_sizes["s"] or 0)
    if n_seeds == 0:
        esized.unpersist()
        raise ValueError(
            "personalized pagerank: no seed intersects the node universe"
        )
    base = scale // n_seeds
    ranks = seed.select(
        "node",
        "deg",
        "_seed",
        F.when(F.col("_seed"), F.lit(base).cast("long"))
        .otherwise(F.lit(0).cast("long"))
        .alias("rank_fp"),
    )
    teleport = (damping_den - damping_num) * base
    # CC's broadcast-regime discipline: when the EXACT node count proves
    # the rank relation fits the session's broadcast budget, hint the
    # per-iteration joins to broadcast it — the edge cache then never
    # re-exchanges and the rank relation never shuffles inside the loop.
    # Past the budget the shuffle shape is unchanged (a billion-node
    # rank relation must never ride a broadcast). 64 B/row deliberately
    # fat, matching dedup._cc_loop.
    from muninn_avro_to_parquet_spark.operators.dedup import (
        _broadcast_threshold_bytes,
    )

    bc = 0 < (n_nodes * 64) < max(_broadcast_threshold_bytes(spark), 0)

    def _maybe_bc(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if bc else df

    if stats is not None:
        import time as _time

        stats["regime"] = "broadcast" if bc else "shuffle"
        stats["n_edges"] = n_edges
        stats["n_part"] = n_part
        stats["n_nodes"] = n_nodes
        stats["iter_walls"] = []

    for _ in range(iterations):
        # dangling mass: filter-aggregate over the node-sized rank
        # relation (1 row, broadcast into every update row)
        dang = ranks.filter(F.col("deg").isNull()).agg(
            F.coalesce(F.sum("rank_fp"), F.lit(0)).alias("_dang")
        )
        contrib = (
            esized.join(
                _maybe_bc(ranks.filter(F.col("deg").isNotNull())),
                esized["src"] == ranks["node"],
            )
            .select(
                F.col("dst").alias("node"),
                F.expr(
                    "rank_fp div deg"
                    if weight_col is None
                    else "(cast(rank_fp as decimal(38,0)) * w) div deg"
                ).alias("_c"),
            )
            .groupBy("node")
            .agg(F.sum("_c").alias("_infl"))
        )
        ranks = (
            ranks.select("node", "deg", "_seed")
            .join(_maybe_bc(contrib), "node", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                "deg",
                "_seed",
                # `div` (integer division) throughout — `/` would be
                # DOUBLE division and lose exactness past 2^53; teleport
                # and dangling mass return to the restart set only
                # (all nodes for uniform, seeds for personalized)
                F.expr(
                    f"cast(((CASE WHEN _seed THEN {teleport} ELSE 0 END)"
                    f" + {damping_num} * "
                    f"(coalesce(_infl, cast(0 as bigint)) + "
                    f"(CASE WHEN _seed THEN _dang div {n_seeds} ELSE 0 END)))"
                    f" div {damping_den} as bigint)"
                ).alias("rank_fp"),
            )
            .coalesce(n_part)
            .localCheckpoint(eager=False)
        )
        if stats is not None:
            _it0 = _time.perf_counter()
            ranks.count()
            stats["iter_walls"].append(round(_time.perf_counter() - _it0, 4))
    out = ranks.select("node", "rank_fp").localCheckpoint(eager=True)
    esized.unpersist()
    return out


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    stats: dict | None = None,
) -> DataFrame:
    """(node, label) after ``iterations`` SYNCHRONOUS deterministic
    label-propagation rounds over the UNDIRECTED view of the edge
    relation — the community-detection primitive (Raghavan et al. 2007)
    link analytics use where connected components are too coarse: CC
    merges anything reachable, LPA needs a neighbor MAJORITY, so a
    single bridge edge does not fuse two dense communities.

    Determinism discipline (the pagerank/BPE contract): labels start as
    the node id; each round every node adopts the (count DESC, label
    ASC)-first label among its NEIGHBORS' labels (a node with no
    neighbors keeps its own). Integer counts + total-order tie-break →
    bit-identical on any engine, and a fixed iteration count unrolls
    into plain SQL for the DuckDB oracle. Synchronous barrier updates
    (not the paper's randomized asynchronous sweep): determinism is
    worth the known oscillation risk on bipartite structures, and the
    tie-break makes low labels win ties — bridges can bleed a label
    across when counts tie, which the majority inside any community
    ≥3-dense immediately reverts.

    Spark shape: the undirected edge relation caches hash-partitioned
    on the source side once; each round is one contribution join riding
    that partitioning (labels broadcast under the exact-count budget
    gate — the pagerank regime discipline), ONE (node, label) count
    shuffle, the argmax window riding that same partitioning, and a
    lazy localCheckpoint so the label relation (referenced by the next
    join AND the keep-own-label merge) computes once per round."""
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    from pyspark.sql import Window

    from muninn_avro_to_parquet_spark.operators.dedup import (
        _broadcast_threshold_bytes,
    )

    spark = edges.sparkSession
    d = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    e = d.union(
        d.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    _, esized, n_edges, n_part = _edge_cache(e, "a")
    labels = (
        esized.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .coalesce(n_part)
        # lazy: the count below is a full scan and materializes the
        # checkpoint in the same job (the pagerank seed fold)
        .localCheckpoint(eager=False)
    )
    n_nodes = labels.count()
    bc = 0 < (n_nodes * 64) < max(_broadcast_threshold_bytes(spark), 0)

    def _maybe_bc(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if bc else df

    if stats is not None:
        import time as _time

        stats["regime"] = "broadcast" if bc else "shuffle"
        stats["n_edges"] = n_edges
        stats["n_part"] = n_part
        stats["n_nodes"] = n_nodes
        stats["iter_walls"] = []

    w = Window.partitionBy("node").orderBy(
        F.col("c").desc(), F.col("nb_label").asc()
    )
    for _ in range(iterations):
        if stats is not None:
            _t0 = _time.perf_counter()
        counts = (
            esized.join(_maybe_bc(labels), esized["a"] == labels["node"])
            .select(F.col("b").alias("node"), F.col("label").alias("nb_label"))
            .groupBy("node", "nb_label")
            .agg(F.count("*").alias("c"))
        )
        winner = (
            counts.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") == 1)
            .select("node", F.col("nb_label").alias("_new"))
        )
        labels = (
            labels.join(_maybe_bc(winner), "node", "left")
            .select(
                "node", F.coalesce(F.col("_new"), F.col("label")).alias("label")
            )
            .localCheckpoint(eager=False)
        )
        if stats is not None:
            labels.count()
            stats["iter_walls"].append(round(_time.perf_counter() - _t0, 4))
    # materialize the result BEFORE releasing the edge cache (the lazy
    # per-round checkpoints pull on it), then free executor storage —
    # the r12 review found the two new loops leaking their caches
    out = labels.localCheckpoint(eager=True)
    esized.unpersist()
    return out


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 2,
    scale: int = 10**9,
    stats: dict | None = None,
) -> DataFrame:
    """(node, hub_fp, auth_fp) after ``iterations`` integer fixed-point
    HITS rounds (Kleinberg 1999) over the directed edge relation — the
    hubs-and-authorities signal that complements PageRank for link
    analysis: a good HUB points at good authorities (directories, link
    lists), a good AUTHORITY is pointed at by good hubs (the documents
    a crawl wants). PageRank conflates the two.

    Determinism discipline (the pagerank contract): mutual
    reinforcement with L1 normalization instead of the textbook L2 —
    ``sqrt`` is not bit-portable, a sum is — so every round is

        auth(v) = Σ hub(u) over in-edges,  then auth·scale div Σauth
        hub(u)  = Σ auth(v) over out-edges, then hub·scale div Σhub

    all in integers (products through DECIMAL(38,0), floor division —
    the weighted-pagerank pattern), so results are bit-identical on any
    engine and a fixed iteration count unrolls into plain SQL for the
    oracle. Scores are parts-per-``scale``; nodes with no in-edges have
    auth 0, no out-edges hub 0.

    Spark shape: the edge relation caches hash-partitioned on ``src``
    once; each half-round is one join riding that partitioning (the
    node-sized score relation broadcasts under the exact-count budget
    gate) + one groupBy shuffle + a 1-row L1 aggregate broadcast into
    the normalize (never a driver collect); each round ends in a lazy
    localCheckpoint (the score relation feeds two consumers)."""
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    from muninn_avro_to_parquet_spark.operators.dedup import (
        _broadcast_threshold_bytes,
    )

    spark = edges.sparkSession
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    _, esized, n_edges, n_part = _edge_cache(e, "src")
    nodes = (
        esized.select(F.col("src").alias("node"))
        .union(esized.select(F.col("dst").alias("node")))
        .distinct()
        .coalesce(n_part)
        # lazy: the count below is a full scan and materializes the
        # checkpoint in the same job (the pagerank seed fold)
        .localCheckpoint(eager=False)
    )
    n_nodes = nodes.count()
    bc = 0 < (n_nodes * 64) < max(_broadcast_threshold_bytes(spark), 0)

    def _maybe_bc(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if bc else df

    if stats is not None:
        import time as _time

        stats["regime"] = "broadcast" if bc else "shuffle"
        stats["n_edges"] = n_edges
        stats["n_part"] = n_part
        stats["n_nodes"] = n_nodes
        stats["iter_walls"] = []

    def _l1_normalize(scored: DataFrame, col: str) -> DataFrame:
        total = scored.agg(
            F.coalesce(F.sum(col), F.lit(0)).cast("decimal(38,0)").alias("_s")
        )
        # the 1-row total broadcasts UNCONDITIONALLY (pagerank's dang
        # pattern) — gating it on the node-count regime would lose the
        # hint exactly on the big graphs where a cartesian re-plan hurts
        return scored.crossJoin(F.broadcast(total)).select(
            "node",
            F.expr(
                f"cast((cast({col} as decimal(38,0)) * {scale}) div _s as long)"
            ).alias(col),
        )

    hubs = nodes.select("node", F.lit(scale).cast("long").alias("hub_fp"))
    auths = None
    for _ in range(iterations):
        if stats is not None:
            _t0 = _time.perf_counter()
        araw = (
            esized.join(_maybe_bc(hubs), esized["src"] == hubs["node"])
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("hub_fp").alias("auth_fp"))
        )
        auths = _l1_normalize(araw, "auth_fp").localCheckpoint(eager=False)
        hraw = (
            esized.join(_maybe_bc(auths), esized["dst"] == auths["node"])
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("auth_fp").alias("hub_fp"))
        )
        hubs = _l1_normalize(hraw, "hub_fp").localCheckpoint(eager=False)
        if stats is not None:
            hubs.count()
            stats["iter_walls"].append(round(_time.perf_counter() - _t0, 4))
    out = (
        nodes.join(hubs, "node", "left")
        .join(auths, "node", "left")
        .select(
            "node",
            F.coalesce("hub_fp", F.lit(0)).alias("hub_fp"),
            F.coalesce("auth_fp", F.lit(0)).alias("auth_fp"),
        )
        # materialize before releasing the edge cache (the lazy
        # half-round checkpoints pull on it), then free executor storage
        .localCheckpoint(eager=True)
    )
    esized.unpersist()
    return out
