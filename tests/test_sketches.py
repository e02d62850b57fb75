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
