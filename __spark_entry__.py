"""Driver contract: bridges the driver's verify harness to the engine's
query registry (``muninn_avro_to_parquet_spark.queries.QUERIES``).

``entry(spark)`` runs the flagship shipping-priority query (join-heavy,
agg + top-k) at sf0.001. ``queries()`` / ``oracle_sql()`` expose every
registry entry; entries whose oracle is ``None`` (approximate /
non-SQL-expressible ops) are omitted from ``oracle_sql()`` so the driver
records the weaker rows-only check for them.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from muninn_avro_to_parquet_spark.queries import QUERIES

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q3_shipping_priority"].spark(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: entry_.spark for name, entry_ in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: entry_.oracle
        for name, entry_ in QUERIES.items()
        if entry_.oracle is not None
    }
