"""Session-scoped operator caches shared by the dedup/similarity families."""

from __future__ import annotations

from pyspark.sql import DataFrame


def cache_scoped(df: DataFrame, scope_key: str) -> DataFrame:
    """Cache ``df``, unpersisting whatever was previously cached under the
    same (session, scope_key). Bounds storage-memory growth to one cached
    relation per operator in long-lived sessions — repeated
    ``*_candidate_pairs`` calls used to accumulate band tables forever.
    The unpersist is safe for in-flight results from the previous call:
    Spark recomputes evicted partitions from lineage."""
    session_caches = df.sparkSession.__dict__.setdefault("_muninn_op_caches", {})
    prev = session_caches.get(scope_key)
    if prev is not None:
        prev.unpersist()
    cached = df.cache()
    session_caches[scope_key] = cached
    return cached
