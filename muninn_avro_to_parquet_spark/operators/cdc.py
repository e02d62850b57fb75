"""CDC snapshot materialization: turn a converted change stream into the
latest-state table its consumers actually query.

The reference's pipeline ends at partitioned Parquet of raw CDC envelopes
(`/root/reference/main.py:569-577` — append-only, one file per input); every
downstream user then needs the same two steps: pick the LATEST change per
primary key, and drop keys whose latest change is a delete. This module is
that step, expressed as one window pass.

Scale: a single hash shuffle on the key columns (the same partitioning a
MERGE INTO target table would use); no join, no second pass. For petabyte
change logs you run it incrementally per ingestion_date partition and merge
against the previous snapshot — the operator composes either way because
``latest_per_key(old_snapshot ∪ new_changes)`` is associative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame, key_cols: list[str], order_cols: list[str]
) -> DataFrame:
    """Keep the single latest row per key, ordered by ``order_cols``
    descending (NULL order values sort oldest). Deterministic: the order
    columns must form a total order within a key — append a unique
    tie-break column (event id, lsn) to guarantee it."""
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c).desc_nulls_last() for c in order_cols]
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def cdc_latest_snapshot(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str] | None = None,
    drop_deletes: bool = True,
) -> DataFrame:
    """Materialize the current state of a converted CDC table.

    ``df`` is the output of ``sources.avro_source.read_avro`` /
    ``convert.convert``: a ``source_metadata`` envelope struct plus typed
    payload columns. Keys are payload column names; ordering defaults to
    ``(tx_id, lsn)`` from the envelope — transaction id first, log
    sequence number as the within-transaction tie-break, matching the
    envelope fields the reference carries (main.py:75-87).

    ``drop_deletes``: a key whose winning row is a delete
    (``is_deleted`` or ``change_type = 'DELETE'``) disappears from the
    snapshot; pass False to keep tombstones (for audit or incremental
    anti-join consumers).
    """
    if order_cols is None:
        order_cols = ["source_metadata.tx_id", "source_metadata.lsn"]
    latest = latest_per_key(df, key_cols, order_cols)
    if drop_deletes:
        latest = latest.filter(
            ~(
                F.coalesce(F.col("source_metadata.is_deleted"), F.lit(False))
                | (F.upper(F.coalesce(F.col("source_metadata.change_type"), F.lit(""))) == "DELETE")
            )
        )
    return latest


def scd2_history(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    attr_cols: list[str],
    tie_break_cols: list[str] | None = None,
) -> DataFrame:
    """Type-2 slowly-changing-dimension history from a change stream: one
    row per change with a half-open validity interval.

    ``valid_from`` is the change's own ``order_col`` value; ``valid_to``
    is the NEXT change's value for the same key (NULL while current —
    ``is_current`` marks it). Consumers time-travel with
    ``valid_from <= t AND (valid_to IS NULL OR t < valid_to)`` — the
    standard warehouse SCD2 contract the reference's append-only CDC
    output (main.py:569-577) leaves every downstream team to rebuild.

    One window pass per key — the same single hash shuffle as
    ``latest_per_key``; no join, no second pass, so it scales exactly as
    far as the snapshot compaction does."""
    from pyspark.sql import Window

    order_exprs = [F.col(order_col).asc()] + [
        F.col(c).asc() for c in (tie_break_cols or [])
    ]
    w = Window.partitionBy(*key_cols).orderBy(*order_exprs)
    nxt = F.lead(F.col(order_col)).over(w)
    return df.select(
        *key_cols,
        *attr_cols,
        F.col(order_col).alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )
