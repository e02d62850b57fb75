"""Table-driven tests for the Avro → Spark schema mapper (SURVEY §1.3)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from muninn_avro_to_parquet_spark import schema as S
from tests.conftest import CDC_SCHEMA


def node_type(node):
    dt, nullable, _src = S.map_avro_node(node)
    return dt, nullable


PRIMITIVES = [
    ("string", T.StringType(), False),
    ("boolean", T.BooleanType(), False),
    ("int", T.IntegerType(), False),
    ("long", T.LongType(), False),
    ("float", T.FloatType(), False),
    ("double", T.DoubleType(), False),
    ("bytes", T.BinaryType(), False),
    ("null", T.StringType(), True),
    ("decimal", T.DoubleType(), False),  # non-standard bare name quirk
    ("weirdtype", T.StringType(), True),  # unknown → friendly fallback
]


@pytest.mark.parametrize("name,expected,nullable", PRIMITIVES)
def test_primitive(name, expected, nullable):
    assert node_type(name) == (expected, nullable)


UNIONS = [
    # first member not null → collapse to string
    (["int", "null"], T.StringType(), True),
    (["string", "int", "long"], T.StringType(), True),
    # ["null"] alone → string
    (["null"], T.StringType(), True),
    # ["null", primitive]
    (["null", "long"], T.LongType(), True),
    (["null", "string"], T.StringType(), True),
    # third member ignored
    (["null", "int", "string"], T.IntegerType(), True),
    # ["null", dict] → logicalType-aware
    (["null", {"type": "long", "logicalType": "timestamp-millis"}], T.TimestampType(), True),
    (["null", {"type": "long", "logicalType": "timestamp-micros"}], T.TimestampType(), True),
    (["null", {"type": "int", "logicalType": "date"}], T.DateType(), True),
    # decimal in union forced to (38,9) regardless of declared precision/scale
    (
        ["null", {"type": "bytes", "logicalType": "decimal", "precision": 20, "scale": 4}],
        T.DecimalType(38, 9),
        True,
    ),
    # other logicalTypes fall to base
    (["null", {"type": "long", "logicalType": "time-millis"}], T.LongType(), True),
    # complex second member degrades to string (array/map/record not primitive names)
    (["null", {"type": "array", "items": "string"}], T.StringType(), True),
    (["null", {"type": "map", "values": "string"}], T.StringType(), True),
    (["null", {"type": "record", "name": "x", "fields": []}], T.StringType(), True),
]


@pytest.mark.parametrize("node,expected,nullable", UNIONS)
def test_union(node, expected, nullable):
    assert node_type(node) == (expected, nullable)


DIRECT_DICTS = [
    # timestamps honored on the direct path
    ({"type": "long", "logicalType": "timestamp-millis"}, T.TimestampType(), True),
    ({"type": "long", "logicalType": "timestamp-micros"}, T.TimestampType(), True),
    # date/decimal IGNORED outside unions — the reference's asymmetry
    ({"type": "int", "logicalType": "date"}, T.IntegerType(), False),
    ({"type": "bytes", "logicalType": "decimal", "precision": 10, "scale": 2}, T.BinaryType(), False),
    ({"type": "long", "logicalType": "time-micros"}, T.LongType(), False),
    # complex types survive OUTSIDE unions
    ({"type": "array", "items": "int"}, T.ArrayType(T.IntegerType(), True), True),
    ({"type": "map", "values": "double"}, T.MapType(T.StringType(), T.DoubleType(), True), True),
    ({"type": "weird"}, T.StringType(), True),
]


@pytest.mark.parametrize("node,expected,nullable", DIRECT_DICTS)
def test_direct_dict(node, expected, nullable):
    assert node_type(node) == (expected, nullable)


def test_record_recursion():
    node = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": ["null", "string"]},
        ],
    }
    dt, nullable = node_type(node)
    assert dt == T.StructType(
        [T.StructField("a", T.LongType(), False), T.StructField("b", T.StringType(), True)]
    )
    assert nullable is False


def test_derive_flat_schema_canonical():
    flat = S.derive_flat_schema(CDC_SCHEMA)
    names = [f.name for f in flat.fields]
    # uuid / read_timestamp / sort_keys dropped; payload promoted
    assert names == [
        "source_metadata", "id", "name", "age", "balance", "score", "active",
        "created_at", "updated_at", "birth_date", "tags", "attrs",
    ]
    by = {f.name: f.dataType for f in flat.fields}
    assert by["source_metadata"] == S.SOURCE_METADATA_TYPE
    assert by["id"] == T.LongType()
    assert by["balance"] == T.DecimalType(38, 9)
    assert by["created_at"] == T.TimestampType()
    assert by["birth_date"] == T.DateType()
    # arrays/maps inside ["null", ·] unions collapse to string
    assert by["tags"] == T.StringType()
    assert by["attrs"] == T.StringType()


def test_payload_missing_or_scalar():
    assert S.derive_field_plans({"type": "record", "name": "r", "fields": []}) == []
    assert (
        S.derive_field_plans(
            {"type": "record", "name": "r", "fields": [{"name": "payload", "type": "string"}]}
        )
        == []
    )


NESTED = [
    # records with logical members stay TYPED: the cast layer rebuilds the
    # struct per leaf (STRUCT_CAST), so nested millis never reach Arrow raw
    (
        {"type": "record", "name": "r", "fields": [
            {"name": "created", "type": {"type": "long", "logicalType": "timestamp-millis"}}]},
        T.StructType([T.StructField("created", T.TimestampType(), True)]),
        S.STRUCT_CAST,
    ),
    # arrays/maps with non-RAW elements still degrade to JSON string
    # (element-level casts inside containers are not expressible per leaf)
    (
        {"type": "array", "items": {"type": "long", "logicalType": "timestamp-millis"}},
        T.StringType(),
        S.STRINGIFY,
    ),
    (
        {"type": "map", "values": ["null", {"type": "bytes", "logicalType": "decimal"}]},
        T.StringType(),
        S.STRINGIFY,
    ),
    # all-RAW nested members keep the typed container with passthrough
    (
        {"type": "record", "name": "r2", "fields": [
            {"name": "a", "type": "long"}, {"name": "b", "type": "string"}]},
        T.StructType([T.StructField("a", T.LongType(), False),
                      T.StructField("b", T.StringType(), False)]),
        S.RAW,
    ),
    ({"type": "array", "items": "long"}, T.ArrayType(T.LongType(), True), S.RAW),
]


@pytest.mark.parametrize("node,expected,expected_src", NESTED)
def test_nested_logical_handling(node, expected, expected_src):
    dt, _, src = S.map_avro_node(node)
    assert dt == expected
    assert src == expected_src


BASE_RESTRICTED = [
    # logical types only apply to their spec base types (main.py:280-288);
    # a string-base "timestamp-millis" stays a string, values preserved
    (["null", {"type": "string", "logicalType": "timestamp-millis"}], T.StringType()),
    (["null", {"type": "long", "logicalType": "date"}], T.LongType()),
    (["null", {"type": "int", "logicalType": "timestamp-micros"}], T.TimestampType()),
]


@pytest.mark.parametrize("node,expected", BASE_RESTRICTED)
def test_logical_base_restrictions(node, expected):
    dt, _, _ = S.map_avro_node(node)
    assert dt == expected
