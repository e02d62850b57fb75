"""Source/sink surface beyond Avro+Parquet: CSV, JSON, ORC, text, JDBC.

The reference reads exactly one format (Avro on GCS, main.py:604-608) and
writes one (Parquet, main.py:576). Spark's `DataFrameReader`/`Writer`
already cover the rest; these wrappers pin the engine's defaults — explicit
schema (never runtime inference on a 100 TB path), UTC timestamps, snappy
— and keep every option in one audited place.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CSV_DEFAULTS = {
    "header": "true",
    "timestampFormat": "yyyy-MM-dd HH:mm:ss",
    "escape": '"',
    "mode": "PERMISSIVE",
    "columnNameOfCorruptRecord": "_corrupt_record",
}

JSON_DEFAULTS = {
    "timestampFormat": "yyyy-MM-dd HH:mm:ss",
    "mode": "PERMISSIVE",
    "columnNameOfCorruptRecord": "_corrupt_record",
}


def _with_corrupt_col(schema: T.StructType) -> T.StructType:
    """PERMISSIVE mode needs the corrupt-record column present in the
    schema to actually capture bad rows."""
    if any(f.name == "_corrupt_record" for f in schema.fields):
        return schema
    return T.StructType(list(schema.fields) + [T.StructField("_corrupt_record", T.StringType(), True)])


def read_csv(spark: SparkSession, path: str, schema: T.StructType, **options) -> DataFrame:
    opts = {**CSV_DEFAULTS, **options}
    return spark.read.options(**opts).schema(_with_corrupt_col(schema)).csv(path)


def read_json(spark: SparkSession, path: str, schema: T.StructType, **options) -> DataFrame:
    opts = {**JSON_DEFAULTS, **options}
    return spark.read.options(**opts).schema(_with_corrupt_col(schema)).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def read_xml(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    row_tag: str = "row",
    **options,
) -> DataFrame:
    """Spark 4's built-in XML source (the spark-xml module merged
    upstream in 4.0 — no external package). ``schema=None`` infers;
    passing one pins types and enables the shared PERMISSIVE
    corrupt-record capture used by csv/json."""
    reader = spark.read.format("xml").option("rowTag", row_tag)
    for k, v in options.items():
        reader = reader.option(k, v)
    if schema is not None:
        reader = reader.option("mode", "PERMISSIVE").option(
            "columnNameOfCorruptRecord", "_corrupt_record"
        ).schema(_with_corrupt_col(schema))
    return reader.load(path)


def read_text(spark: SparkSession, path: str, whole_file: bool = False) -> DataFrame:
    return spark.read.option("wholetext", str(whole_file).lower()).text(path)


def read_binary_dir(
    spark: SparkSession,
    path: str,
    glob_filter: str | None = None,
    recursive: bool = True,
) -> DataFrame:
    """Ingest a directory of opaque media files as binary rows — the
    multimodal primitive (SURVEY §2.3): one row per file with
    (path, modificationTime, length, content), feeding
    ``multimodal.decode_images`` / ``decode_audio``.

    Spark's ``binaryFile`` source does the heavy lifting: listing and
    reads go through the Hadoop filesystem layer (so ``s3://``/``gs://``
    directories work unchanged), files never split (binary blobs are not
    splittable), and ``pathGlobFilter`` prunes at listing time. At 100 TB
    the scan parallelizes per file; pair with ``repartition`` on
    ``length`` when media sizes are heavily skewed."""
    r = spark.read.format("binaryFile")
    if glob_filter:
        r = r.option("pathGlobFilter", glob_filter)
    if recursive:
        r = r.option("recursiveFileLookup", "true")
    return r.load(path)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 32,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    **options,
) -> DataFrame:
    """JDBC scan; ALWAYS pass a partition column for tables of any size —
    without one the whole table streams through a single connection.
    Bounds are REQUIRED with a partition column: a guessed range (e.g.
    [0, 2^31)) silently collapses a table whose keys live elsewhere into
    one unbounded stride — query min/max first and pass them in."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError(
                "partition_column requires explicit lower_bound/upper_bound "
                "(SELECT min(col), max(col) first); guessed bounds skew every "
                "partition onto one connection"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", num_partitions)
            .option("lowerBound", lower_bound)
            .option("upperBound", upper_bound)
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def write(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "append",
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
    **options,
) -> None:
    """One sink entry point for parquet/orc/csv/json sinks."""
    writer = df.write.mode(mode).format(fmt)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save(path)
