"""SparkSession factory with scale-appropriate defaults.

Local testing runs on ``local[N]``; the same config block is what we would
ship to a 1000-executor cluster (AQE on, UTC, Arrow enabled). Shuffle
partitions default to the local core count — on a real cluster this is
overridden by AQE coalescing anyway.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


# Configs a query's CORRECTNESS depends on, all runtime-settable via
# spark.conf.set. The driver's harness (and any downstream user) builds its
# own vanilla SparkSession, so these must NOT live only in the get_spark()
# factory below — ensure_runtime_confs() is called from tables.register_views
# before any read, making the engine session-independent (round-1 verdict:
# every query erred on PARQUET_TYPE_ILLEGAL / non-UTC hash drift otherwise).
RUNTIME_CONFS = {
    # test tables carry TIMESTAMP(NANOS) parquet columns, which Spark
    # rejects by default; read them as raw nano longs and normalize to
    # microsecond timestamps in the table catalog (tables.py)
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # fixture timestamps carry no UTC flag; read them as session-UTC
    # TimestampType (not TIMESTAMP_NTZ) so timestamp arithmetic
    # (unix_micros, window()) and DuckDB's TIMESTAMP semantics line up
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    # reference converts with explicit UTC (main.py:496); all timestamp
    # formatting / literals assume it
    "spark.sql.session.timeZone": "UTC",
    # AQE: runtime re-plan, partition coalesce, skew-join — also rescues a
    # vanilla session's default 200 shuffle partitions at small SF
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow batch transfer for the pandas-UDF operators
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # route format("avro") to the DataSource V2 path: Spark pins "avro"
    # to V1 by default, but the upstream spark-avro module is a V1
    # FileFormat absent from this image — the engine ships its own DSv2
    # implementation (jars/muninn-spark-avro.jar, source under jvm/)
    # registered under the same short name. With no avro source on the
    # classpath this conf changes nothing (lookup still fails over to
    # the pure-Python codec).
    "spark.sql.sources.useV1SourceList": "csv,json,kafka,orc,parquet,text",
}

JVM_AVRO_JAR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "jars", "muninn-spark-avro.jar"
)


def ensure_runtime_confs(spark: SparkSession) -> None:
    """Pin every correctness-relevant SQL conf on an arbitrary session.

    Idempotent and cheap (conf.set on an already-set value is a no-op
    py4j call); safe to call per register_views."""
    for key, value in RUNTIME_CONFS.items():
        spark.conf.set(key, value)


def get_spark(app_name: str = "muninn_spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or min(32, os.cpu_count() or 4)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if os.path.exists(JVM_AVRO_JAR):
        # launch-time only (spark.jars is a static conf): sessions built
        # elsewhere simply fall back to the Python Avro codec
        builder = builder.config("spark.jars", JVM_AVRO_JAR)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ensure_runtime_confs(spark)
    return spark
