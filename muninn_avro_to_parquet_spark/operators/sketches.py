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
