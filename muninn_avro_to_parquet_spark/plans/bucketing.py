"""Bucketed-table helpers: pre-shuffle once at write time, join free after.

At 100 TB the dominant recurring cost of a star-schema workload is
re-shuffling the fact table for every join on the same key. Writing the
table bucketed by that key (``bucketBy(n, key)`` + ``sortBy``) pays the
shuffle ONCE; every later equi-join or aggregation on the key reads
co-located buckets and plans with no exchange on the bucketed side(s).

Bucket count guidance: target ~128–512 MB per bucket at final table size
(e.g. 100 TB / 256 MB ≈ 400k buckets is too many files per partition —
combine with date partitioning so each partition holds n buckets of its
own data). Both join sides must agree on (key, n) — keep the registry in
one place (the table catalog), not per-job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) managed table."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    writer = writer.sortBy(*(sort_cols or bucket_cols))
    writer.format("parquet").saveAsTable(table)


def bucketed_join_plan_is_shuffle_free(
    spark: SparkSession, left_table: str, right_table: str, on: list[str]
) -> tuple[bool, str]:
    """Join two bucketed tables on the bucket key and report whether the
    physical plan contains a SHUFFLE exchange (it must not). A
    BroadcastExchange is fine — broadcasting is also shuffle-free; the
    property being verified is that no side re-hash-partitions."""
    joined = spark.table(left_table).join(spark.table(right_table), on)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" not in plan, plan
