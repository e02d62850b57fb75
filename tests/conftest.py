from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from muninn_avro_to_parquet_spark import get_spark

    s = get_spark("tests", cpus=4)
    yield s


CDC_SCHEMA = {
    "type": "record",
    "name": "cdc_row",
    "fields": [
        {"name": "uuid", "type": "string"},
        {"name": "read_timestamp", "type": {"type": "long", "logicalType": "timestamp-millis"}},
        {"name": "sort_keys", "type": {"type": "array", "items": "string"}},
        {
            "name": "source_metadata",
            "type": {
                "type": "record",
                "name": "meta",
                "fields": [
                    {"name": "schema", "type": ["null", "string"]},
                    {"name": "table", "type": ["null", "string"]},
                    {"name": "is_deleted", "type": ["null", "boolean"]},
                    {"name": "change_type", "type": ["null", "string"]},
                    {"name": "tx_id", "type": ["null", "long"]},
                    {"name": "lsn", "type": ["null", "string"]},
                    {"name": "primary_keys", "type": ["null", {"type": "array", "items": "string"}]},
                ],
            },
        },
        {
            "name": "payload",
            "type": [
                "null",
                {
                    "type": "record",
                    "name": "row",
                    "fields": [
                        {"name": "id", "type": "long"},
                        {"name": "name", "type": ["null", "string"]},
                        {"name": "age", "type": ["null", "int"]},
                        {
                            "name": "balance",
                            "type": [
                                "null",
                                {"type": "bytes", "logicalType": "decimal", "precision": 38, "scale": 30},
                            ],
                        },
                        {"name": "score", "type": ["null", "double"]},
                        {"name": "active", "type": ["null", "boolean"]},
                        {
                            "name": "created_at",
                            "type": ["null", {"type": "long", "logicalType": "timestamp-micros"}],
                        },
                        {
                            "name": "updated_at",
                            "type": ["null", {"type": "long", "logicalType": "timestamp-millis"}],
                        },
                        {"name": "birth_date", "type": ["null", {"type": "int", "logicalType": "date"}]},
                        {"name": "tags", "type": ["null", {"type": "array", "items": "string"}]},
                        {"name": "attrs", "type": ["null", {"type": "map", "values": "string"}]},
                    ],
                },
            ],
        },
    ],
}
