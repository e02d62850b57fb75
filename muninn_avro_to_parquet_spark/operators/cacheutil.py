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


# A checkpoint_scoped analogue for localCheckpoint relations (unpersist
# the previous build's blocks per (session, scope_key) — ADVICE r15) was
# built and REJECTED here: a localCheckpoint's lineage is truncated, so
# unpersisting the previous generation is a HARD invalidation, not a
# cache eviction — any still-live index (or plan derived from one) fails
# with CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND instead of recomputing
# (reproduced on test_layout's two-index sessions). Only the JVM's
# ContextCleaner sees true RDD reachability; block release stays
# GC-driven by design.
