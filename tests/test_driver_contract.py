"""Guards on the driver contract (__spark_entry__.py): the first thing
the per-round verify exercises, so breakage here fails every gate at
once. Checks are structural — fast enough for every CI run."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry_mod
from muninn_avro_to_parquet_spark.plans import parity
from tests.conftest import SF_SMOKE


def test_queries_and_oracles_consistent():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert qs, "queries() must not be empty"
    # every oracle key must name a query; missing oracles are the
    # explicit rows-only exceptions, not typos
    assert set(oracles) <= set(qs)
    rows_only = set(qs) - set(oracles)
    assert rows_only == {
        "ann_topk_lsh",
        "ann_topk_ivf",
        "embedding_near_dup_lsh",
        "q_approx_distinct",
    }, f"unexpected rows-only entries: {sorted(rows_only)}"


@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql()))
def test_every_oracle_parses_in_duckdb(name):
    """EXPLAIN each oracle against the registered views — a syntax error
    or schema drift in an oracle string fails here, not in the driver."""
    con = parity.duckdb_connection(SF_SMOKE)
    con.sql("EXPLAIN " + entry_mod.oracle_sql()[name])


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0
