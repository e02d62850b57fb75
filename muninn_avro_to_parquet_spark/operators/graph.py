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


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = DEFAULT_SCALE,
) -> DataFrame:
    """(node, rank_fp) after ``iterations`` integer fixed-point PageRank
    rounds over the directed edge relation. ``rank_fp`` is in parts per
    ``scale``; Σ rank_fp ≈ scale (truncation loses at most N·iterations
    parts). Parallel edges are NOT deduplicated — pass a distinct edge
    relation if multiplicity should not add weight."""
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    if not 0 < damping_num < damping_den:
        raise ValueError(
            f"need 0 < damping_num < damping_den, got {damping_num}/{damping_den}"
        )
    spark = edges.sparkSession
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    # N as an exact literal: one O(1)-result job up front (the CC
    # discipline — counts yes, data collects no)
    n_nodes = nodes.count()
    if n_nodes == 0:
        return spark.createDataFrame([], "node long, rank_fp long")
    cores = spark.sparkContext.defaultParallelism
    n_part = max(1, min((n_nodes + 9999) // 10000, cores))
    ecached = e.repartition(n_part, "src").cache()
    ecached.count()
    outdeg = (
        ecached.groupBy("src").count().select("src", F.col("count").alias("deg"))
    )
    base = scale // n_nodes
    ranks = (
        nodes.select("node", F.lit(base).cast("long").alias("rank_fp"))
        .coalesce(n_part)
        .localCheckpoint(eager=True)
    )
    teleport = (damping_den - damping_num) * base
    for _ in range(iterations):
        # dangling mass: nodes with no outedges (1-row aggregate,
        # broadcast into every update row)
        dang = (
            ranks.join(outdeg, ranks["node"] == outdeg["src"], "left_anti")
            .agg(F.coalesce(F.sum("rank_fp"), F.lit(0)).alias("_dang"))
        )
        contrib = (
            ecached.join(outdeg, "src")
            .join(ranks, ecached["src"] == ranks["node"])
            .select(
                F.col("dst").alias("node"),
                F.expr("rank_fp div deg").alias("_c"),
            )
            .groupBy("node")
            .agg(F.sum("_c").alias("_infl"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                # `div` (integer division) throughout — `/` would be
                # DOUBLE division and lose exactness past 2^53
                F.expr(
                    f"cast(({teleport} + {damping_num} * "
                    f"(coalesce(_infl, cast(0 as bigint)) + _dang div {n_nodes}))"
                    f" div {damping_den} as bigint)"
                ).alias("rank_fp"),
            )
            .coalesce(n_part)
            .localCheckpoint(eager=False)
        )
    out = ranks.localCheckpoint(eager=True)
    ecached.unpersist()
    return out
