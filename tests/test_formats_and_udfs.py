"""Multi-format source/sink round-trips and the registered SQL-function
surface."""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import functions as F
from pyspark.sql import types as T

from muninn_avro_to_parquet_spark.functions import register
from muninn_avro_to_parquet_spark.sources import formats

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ]
)

ROWS = [(1, "ann", 1.5), (2, "bob", 2.5), (3, "cal", None)]


def _df(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def test_csv_roundtrip(spark, tmp_path):
    p = str(tmp_path / "csv")
    formats.write(_df(spark), p, fmt="csv", mode="overwrite", header="true")
    back = formats.read_csv(spark, p, SCHEMA)
    assert sorted((r.id, r.name, r.score) for r in back.collect()) == sorted(ROWS)


def test_csv_corrupt_record_capture(spark, tmp_path):
    p = tmp_path / "bad"
    p.mkdir()
    (p / "x.csv").write_text("id,name,score\n1,ok,2.0\nnot_a_long,b,c\n")
    back = formats.read_csv(spark, str(p), SCHEMA)
    rows = back.collect()
    corrupt = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(corrupt) == 1 and "not_a_long" in corrupt[0]["_corrupt_record"]


def test_json_roundtrip(spark, tmp_path):
    p = str(tmp_path / "json")
    formats.write(_df(spark), p, fmt="json", mode="overwrite")
    back = formats.read_json(spark, p, SCHEMA).drop("_corrupt_record")
    assert sorted((r.id, r.name, r.score) for r in back.collect()) == sorted(ROWS)


def test_orc_roundtrip(spark, tmp_path):
    p = str(tmp_path / "orc")
    formats.write(_df(spark), p, fmt="orc", mode="overwrite")
    back = formats.read_orc(spark, p)
    assert sorted((r.id, r.name, r.score) for r in back.collect()) == sorted(ROWS)


def test_xml_roundtrip(spark, tmp_path):
    """Spark 4 native XML (rowTag mode): write -> read with a pinned
    schema must round-trip values; inference mode must agree on the
    row count."""
    p = str(tmp_path / "xml")
    formats.write(
        _df(spark), p, fmt="xml", mode="overwrite", rowTag="row", rootTag="rows"
    )
    back = formats.read_xml(spark, p, SCHEMA)
    assert sorted((r.id, r.name, r.score) for r in back.collect()) == sorted(ROWS)
    assert formats.read_xml(spark, p).count() == len(ROWS)


def test_text_read(spark, tmp_path):
    p = tmp_path / "txt"
    p.mkdir()
    (p / "a.txt").write_text("line one\nline two\n")
    assert formats.read_text(spark, str(p)).count() == 2


def test_partitioned_sink(spark, tmp_path):
    p = str(tmp_path / "parts")
    df = _df(spark).withColumn("bucket", F.col("id") % 2)
    formats.write(df, p, fmt="parquet", mode="overwrite", partition_by=["bucket"])
    import os

    assert sorted(d for d in os.listdir(p) if d.startswith("bucket=")) == [
        "bucket=0",
        "bucket=1",
    ]


def test_registered_sql_functions(spark):
    names = register.register_all(spark)
    assert "cdc_bytes_decimal" in names and "cdc_to_bool" in names

    raw = (123 * 10**29).to_bytes(16, "big", signed=True)  # 12.3 at scale 30
    df = spark.createDataFrame(
        [(raw, "yes", "+5", None)],
        "b binary, flag string, n string, nothing string",
    )
    df.createOrReplaceTempView("udf_probe")
    row = spark.sql(
        """
        SELECT cdc_bytes_decimal(b) AS dec,
               cdc_to_bool(flag) AS flag,
               cdc_to_int(n) AS n,
               cdc_to_bool(nothing) AS nothing
        FROM udf_probe
        """
    ).collect()[0]
    assert row["dec"] == Decimal("12.300000000")
    assert row["flag"] is True
    assert row["n"] == 5
    assert row["nothing"] is None


def test_registered_stringify_sorts_keys(spark):
    register.register_all(spark)
    df = spark.createDataFrame([({"z": "1", "a": "2"},)], "m map<string,string>")
    df.createOrReplaceTempView("udf_probe2")
    got = spark.sql("SELECT cdc_stringify(m) AS s FROM udf_probe2").collect()[0]["s"]
    assert got == '{"a":"2","z":"1"}'


def test_duration_seconds_lenient(spark):
    register.register_all(spark)
    df = spark.createDataFrame([("45m",), ("2d",), ("90x",), (None,)], "d string")
    df.createOrReplaceTempView("dur_probe")
    got = [r["s"] for r in spark.sql("SELECT duration_seconds(d) AS s FROM dur_probe").collect()]
    assert got == [2700, 172800, None, None]


def test_jdbc_requires_bounds(spark):
    import pytest

    with pytest.raises(ValueError, match="lower_bound"):
        formats.read_jdbc(spark, "jdbc:h2:mem:x", "t", partition_column="id")


def test_cdc_udfs_handle_nan_nulls(spark):
    """NaN (pandas' NULL spelling in float columns) must come back NULL
    from cdc_to_int / cdc_to_bool, never crash or coerce to True."""
    register.register_all(spark)
    df = spark.createDataFrame([(1.5,), (None,), (float("inf"),)], "x double")
    df.createOrReplaceTempView("nan_probe")
    rows = spark.sql(
        "SELECT cdc_to_int(x) AS i, cdc_to_bool(x) AS b FROM nan_probe"
    ).collect()
    got = [(r["i"], r["b"]) for r in rows]
    assert (1, True) in got
    assert (None, None) in got  # the NULL row
    assert (None, True) in got  # inf: unparsable int, truthy bool


def test_duration_seconds_long_range(spark):
    register.register_all(spark)
    df = spark.createDataFrame([("30000d",)], "d string")
    df.createOrReplaceTempView("dur_long")
    got = spark.sql("SELECT duration_seconds(d) AS s FROM dur_long").collect()[0]["s"]
    assert got == 30000 * 86400  # > 2^31, needs LONG


def test_read_binary_dir_ingests_fixture_images(spark):
    """binaryFile ingest: one row per media file, opaque binary content,
    decodable by the multimodal operators (SURVEY §2.3 primitive)."""
    import hashlib
    import os

    from pyspark.sql import functions as F

    from muninn_avro_to_parquet_spark.operators import multimodal
    from muninn_avro_to_parquet_spark.queries import _BINARY_FIXTURE_DIR

    df = formats.read_binary_dir(spark, _BINARY_FIXTURE_DIR, glob_filter="*.bmp")
    assert {"path", "modificationTime", "length", "content"} <= set(df.columns)
    rows = df.select("path", "length", "content").collect()
    assert len(rows) == 5
    for r in rows:
        local = r["path"].removeprefix("file:")
        assert r["length"] == os.path.getsize(local)
        assert hashlib.md5(bytes(r["content"])).hexdigest() == hashlib.md5(
            open(local, "rb").read()
        ).hexdigest()
    feats = multimodal.decode_images(
        df.select(F.col("path").alias("img"), "content"),
        id_col="img",
        media_col="content",
    ).collect()
    assert all(f["width"] >= 1 and f["height"] >= 1 for f in feats)


def test_read_binary_dir_glob_filter_excludes(spark, tmp_path):
    (tmp_path / "a.bmp").write_bytes(b"BMfake")
    (tmp_path / "b.txt").write_bytes(b"nope")
    df = formats.read_binary_dir(spark, str(tmp_path), glob_filter="*.bmp")
    assert [r["path"].rsplit("/", 1)[-1] for r in df.collect()] == ["a.bmp"]


def test_token_runs_udtf_rle_and_nulls(spark):
    """UDTF contract: maximal runs with 1-based starts, NULL text yields
    no rows, and the lateral join drops rows for token-free documents."""
    from muninn_avro_to_parquet_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    df = spark.createDataFrame(
        [(1, "a a b a"), (2, None), (3, "!!!")], "doc_id long, text string"
    )
    df.createOrReplaceTempView("udtf_docs")
    rows = spark.sql(
        """
        SELECT t.doc_id, r.start_pos, r.token, r.run_len
        FROM udtf_docs t, LATERAL token_runs(t.text) r
        ORDER BY t.doc_id, r.start_pos
        """
    ).collect()
    assert [(r.doc_id, r.start_pos, r.token, r.run_len) for r in rows] == [
        (1, 1, "a", 2),
        (1, 3, "b", 1),
        (1, 4, "a", 1),
    ]
