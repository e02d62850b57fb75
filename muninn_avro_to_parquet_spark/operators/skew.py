"""Skew-mitigation utilities: salted joins and explicit co-partitioning.

AQE's skew-join splitting (on in ``session.py``) handles most runtime
skew; ``salted_join`` is the explicit form for the pathological case AQE
can't fix — a single join key holding a double-digit percentage of all
rows (the "null key" / "boilerplate doc" problem), where one task would
otherwise process a whole key alone.

Mechanics: the big (skewed) side gets a deterministic salt in [0, n);
the small side is replicated n times (explode over the salt range); the
join key becomes (key, salt), spreading each hot key over n tasks. Cost:
the small side shuffles n× its size — choose n ≈ the skew factor, not
larger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def salt_side(df: DataFrame, num_salts: int) -> DataFrame:
    """Add a deterministic per-row salt (hash of the whole row, not a RNG
    — reruns and retried tasks must agree)."""
    return df.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(num_salts))
    )


def replicate_side(df: DataFrame, num_salts: int) -> DataFrame:
    """Replicate every row once per salt value (the small side)."""
    return df.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i).cast("bigint") for i in range(num_salts)]))
    )


# join modes where replicating the small side cannot duplicate output
# rows: unmatched replicas vanish (inner/semi/anti) or only the big side
# is preserved (left). right/full would emit one row PER REPLICA for
# every unmatched small row — silently wrong, so they are rejected.
_SAFE_HOWS = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti", "semi", "anti"}


def key_skew_report(
    df: DataFrame, key_col: str, top_k: int = 20
) -> DataFrame:
    """Join-key skew diagnostic: the ``top_k`` hottest keys with their
    row counts, corpus share, and cumulative share — the number an
    engineer reads BEFORE picking ``num_salts`` (cum_share of the top
    handful ≈ how much of the shuffle one task would own un-salted).

    Scale shape: one groupBy on the key (aggregate-sized output), a
    distributed TakeOrdered for the top_k (never a global sort), a
    broadcast 1-row total; the rank/cumulative windows run over top_k
    rows only. Shares divide exact BIGINTs in double, rounded at 6 —
    engine-exact.

    Output: (rank, key, n_rows, share, cum_share)."""
    from pyspark.sql import Window

    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count("*").alias("n_rows")
    )
    total = counts.agg(
        F.sum("n_rows").alias("_total"), F.count("*").alias("_n_keys")
    )
    top = counts.orderBy(F.desc("n_rows"), F.asc("key")).limit(top_k)
    # constant partition key: the windows see top_k rows;
    # single_partition_key states the single partition on purpose (lit(0)
    # folds away in Spark 4.1 and trips the empty-partition-spec warning)
    from muninn_avro_to_parquet_spark.plans.windows import single_partition_key

    w = Window.partitionBy(single_partition_key(F.col("key"))).orderBy(
        F.desc("n_rows"), F.asc("key")
    )
    wc = w.rowsBetween(Window.unboundedPreceding, 0)
    return (
        top.crossJoin(F.broadcast(total))
        .select(
            F.row_number().over(w).alias("rank"),
            "key",
            "n_rows",
            F.round(F.col("n_rows") / F.col("_total"), 6).alias("share"),
            F.round(F.sum("n_rows").over(wc) / F.col("_total"), 6).alias(
                "cum_share"
            ),
        )
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the hot-key pressure spread over ``num_salts`` tasks.

    Row-for-row equivalent to ``big.join(small, on, how)`` for the
    supported join modes; the salt column never escapes.

    Limitation: the salt derives from the big side's full row content, so
    BYTE-IDENTICAL duplicate rows all land in one salt bucket — salting
    spreads a hot KEY with varied payloads, not a corpus of exact clones
    (deduplicate those first)."""
    if how.lower().replace("_", "") not in {h.replace("_", "") for h in _SAFE_HOWS}:
        raise ValueError(
            f"salted_join supports inner/left/semi/anti joins, not {how!r}: "
            "replicating the small side duplicates its unmatched rows under "
            "right/full joins"
        )
    for df, side in ((big, "big"), (small, "small")):
        if SALT_COL in df.columns:
            raise ValueError(f"{side} side already has a {SALT_COL!r} column")
    b = salt_side(big, num_salts)
    s = replicate_side(small, num_salts)
    return b.join(s, on + [SALT_COL], how).drop(SALT_COL)
