"""Local replica of the driver's correctness gate: run registry queries on
Spark AND their DuckDB oracles, compare canonicalized values.

The full 40+ query sweep at sf0.01 runs in the per-round driver; CI keeps
a representative per-category subset at sf0.001 so a parity regression
fails fast. ``PARITY_FULL=1 python -m pytest tests/test_oracle_parity.py``
runs everything at sf0.01.
"""

from __future__ import annotations

import os

import pytest

from muninn_avro_to_parquet_spark.plans import parity
from muninn_avro_to_parquet_spark.queries import QUERIES
from tests.conftest import SF_CORRECT, SF_SMOKE

REPRESENTATIVE = [
    "q1_pricing_summary",       # filter + decimal aggregation
    "q3_shipping_priority",     # 3-way join + agg + top-k
    "q_topk_per_group",         # window functions
    "q_set_ops",                # union/intersect/except
    "q_events_json",            # JSON extraction
    "dedup_exact",              # dedup family
    "dedup_minhash_signature",  # sketching
    "embedding_cosine_pairs",   # quantized vector math
    "text_quality",             # text scoring
    "q_asof_join",              # temporal join
    "q_tumbling_events",        # event-time window
    "multimodal_image_features",  # mapInPandas feature extraction
    "text_bpe_merges",          # iterative tokenizer training (r5s3)
    "text_lm_perplexity",       # fixed-point LM scoring (r5s3)
    "ann_topk_pq",              # product-quantization ANN (r5s3)
    "q_snapshot_diff",          # CDC version diff (r5s3)
]

FULL = os.environ.get("PARITY_FULL") == "1"
NAMES = sorted(QUERIES) if FULL else REPRESENTATIVE
SF_DIR = SF_CORRECT if FULL else SF_SMOKE


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, name):
    entry = QUERIES[name]
    sdf = entry.spark(spark, SF_DIR)
    if entry.oracle is None:
        assert sdf.count() >= 0  # rows-only contract for approximate ops
        return
    con = parity.duckdb_connection(SF_DIR)
    report = parity.compare(sdf, con.sql(entry.oracle).df())
    assert report["ok"], {k: v for k, v in report.items() if k != "ok"}


def test_no_oracle_emits_hugeint():
    """Every registered oracle must produce driver-hashable types.

    DuckDB returns HUGEINT for integer SUM; pandas renders HUGEINT as
    float64, so the driver hashes '101005.0' against Spark's '101005' and
    the row fails even though values are equal. DESCRIBE binds the query
    without executing it, so sweeping the whole registry is cheap."""
    con = parity.duckdb_connection(SF_SMOKE)
    offenders = {}
    for name, entry in sorted(QUERIES.items()):
        if entry.oracle is None:
            continue
        cols = con.sql(f"DESCRIBE {entry.oracle}").fetchall()
        bad = [(c[0], c[1]) for c in cols if "HUGEINT" in c[1].upper()]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        f"oracles emitting HUGEINT (wrap in CAST(... AS BIGINT)): {offenders}"
    )


def test_gate_detects_each_perturbation_class(spark):
    """Meta-test of the gate itself: a green board is only evidence if
    the comparator actually trips on wrong results. Perturb q1's Spark
    side four ways — wrong value, renamed column, dropped row, int→float
    dtype drift — and assert the corresponding guard catches each."""
    from pyspark.sql import functions as F

    entry = QUERIES["q1_pricing_summary"]
    con = parity.duckdb_connection(SF_SMOKE)
    oracle = con.sql(entry.oracle).df()

    good = entry.spark(spark, SF_SMOKE)
    assert parity.compare(good, oracle)["ok"]

    wrong_value = good.withColumn("count_order", F.col("count_order") + 1)
    r = parity.compare(wrong_value, oracle)
    assert not r["ok"] and r["value_mismatches"]

    renamed = good.withColumnRenamed("count_order", "n_orders")
    r = parity.compare(renamed, oracle)
    assert not r["ok"] and not r["cols_match"]

    dropped = good.limit(good.count() - 1)
    r = parity.compare(dropped, oracle)
    assert not r["ok"] and not r["rows_match"]

    drifted = good.withColumn("count_order", F.col("count_order").cast("double"))
    r = parity.compare(drifted, oracle)
    assert not r["ok"] and r["dtype_conflicts"]
