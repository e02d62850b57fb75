"""Value-coercion parity tests (SURVEY §1.4) for the scalar helpers."""

from __future__ import annotations

from decimal import Decimal

import pytest

from muninn_avro_to_parquet_spark.functions import scalars


@pytest.mark.parametrize(
    "value,expected",
    [
        ("true", True), ("T", True), ("1", True), ("YES", True), ("y", True),
        ("false", False), ("F", False), ("0", False), ("no", False), ("N", False),
        ("2", True),  # bool(int("2")) branch
        ("-3", True),
        ("garbage", None),
        ("", None),
        (None, None),
        (True, True), (False, False),
        (1, True), (0, False), (0.0, False), (2.5, True),
    ],
)
def test_to_bool(value, expected):
    assert scalars.to_bool(value) is expected


@pytest.mark.parametrize(
    "value,expected",
    [
        ("+42", 42), ("42", 42), ("-7", -7), (3.9, 3), (-3.9, -3),
        (True, 1), (False, 0), ("abc", None), (None, None), ("3.7", 3),
    ],
)
def test_to_int(value, expected):
    assert scalars.to_int(value) == expected


def test_to_list_of_str():
    assert scalars.to_list_of_str(None) is None
    assert scalars.to_list_of_str("x") == ["x"]
    assert scalars.to_list_of_str([1, None, "a"]) == ["1", None, "a"]


def test_stringify_sorted_compact_json():
    assert scalars.stringify_any({"z": 1, "a": [2, {"c": None}]}) == '{"a":[2,{"c":null}],"z":1}'
    assert scalars.stringify_any([1, 2]) == "[1,2]"
    assert scalars.stringify_any("héllo") == "héllo"
    assert scalars.stringify_any(5) == "5"
    assert scalars.stringify_any(None) is None
    assert scalars.stringify_any(b"\xff") == "b'\\xff'"  # str() on bytes, reference parity


class TestBytesDecimal:
    def test_positive_scale30(self):
        raw = (123456789 * 10**22).to_bytes(16, "big", signed=True)
        assert scalars.bytes_to_decimal(raw) == Decimal("1.234567890")

    def test_negative_twos_complement(self):
        raw = (-5 * 10**30).to_bytes(16, "big", signed=True)
        assert scalars.bytes_to_decimal(raw) == Decimal("-5.000000000")

    def test_bankers_rounding(self):
        # x.xxxxxxxxx5 exactly at the boundary → HALF_EVEN
        raw = (15 * 10**20).to_bytes(16, "big", signed=True)  # 0.0000000015
        assert scalars.bytes_to_decimal(raw) == Decimal("0.000000002")
        raw = (25 * 10**20).to_bytes(16, "big", signed=True)  # 0.0000000025
        assert scalars.bytes_to_decimal(raw) == Decimal("0.000000002")

    def test_numeric_passthrough(self):
        assert scalars.bytes_to_decimal(3) == Decimal("3.000000000")
        assert scalars.bytes_to_decimal(2.5) == Decimal("2.500000000")

    def test_error_silent_zero(self):
        assert scalars.bytes_to_decimal("not a number") == Decimal("0.000000000")
        assert scalars.bytes_to_decimal("nan", strict=True) is None

    def test_none(self):
        assert scalars.bytes_to_decimal(None) is None


def test_bytes_to_float():
    raw = (25 * 10**29).to_bytes(16, "big", signed=True)
    assert scalars.bytes_to_float(raw) == 2.5
    assert scalars.bytes_to_float("7.5") == 7.5
    assert scalars.bytes_to_float("x") is None
    assert scalars.bytes_to_float(None) is None


@pytest.mark.parametrize("text,secs", [("30m", 1800), ("1h", 3600), ("2d", 172800), ("45s", 45)])
def test_duration(text, secs):
    assert scalars.parse_duration_to_seconds(text) == secs


def test_duration_invalid():
    with pytest.raises(ValueError):
        scalars.parse_duration_to_seconds("1x")


def test_coerce_source_metadata():
    out = scalars.coerce_source_metadata(
        {"schema": 1, "table": "t", "is_deleted": "yes", "change_type": None,
         "tx_id": "+7", "lsn": 9, "primary_keys": "pk"}
    )
    assert out == {
        "schema": "1", "table": "t", "is_deleted": True, "change_type": None,
        "tx_id": 7, "lsn": "9", "primary_keys": ["pk"],
    }
    assert scalars.coerce_source_metadata(None)["table"] is None


def test_lenient_exprs_match_python_scalars(spark):
    """The JVM Column expressions (casts.lenient_bool / lenient_int) must
    agree with the Python reference coercers on the tricky cases."""
    from muninn_avro_to_parquet_spark import casts
    from muninn_avro_to_parquet_spark.functions import scalars
    from pyspark.sql import functions as F

    values = ["true", "T", "YES", "y", "1", "false", "F", "no", "N", "0",
              "2", "-3", "+5", " 7 ", "3.9", "abc", "", None]
    df = spark.createDataFrame([(v,) for v in values], "v string")
    out = df.select(
        "v",
        casts.lenient_bool(F.col("v")).alias("b"),
        casts.lenient_int(F.col("v")).alias("i"),
    ).collect()
    for r in out:
        assert r["b"] == scalars.to_bool(r["v"]), ("bool", r["v"], r["b"])
        assert r["i"] == scalars.to_int(r["v"]), ("int", r["v"], r["i"])


def test_bytes_decimal_expr_matches_python_reference(spark):
    """r9: casts.bytes_decimal_expr (pure Catalyst limb division) must
    reproduce scalars.bytes_to_decimal EXACTLY — both signs, HALF_EVEN
    ties, lengths 0-30, non-minimal sign-fill padding, the 10^28
    coefficient zero-gate, and the 16-byte two's-complement extremes."""
    import random

    from pyspark.sql import functions as F

    from muninn_avro_to_parquet_spark import casts
    from muninn_avro_to_parquet_spark.functions import scalars

    rng = random.Random(7)
    vals = [b"", b"\x00", b"\xff", (10**29).to_bytes(16, "big", signed=True)]
    for n in range(1, 31):
        for _ in range(4):
            vals.append(bytes(rng.randrange(256) for _ in range(n)))
    for q in (2, 3, 7, 8):  # x.5 ties at the 9th place, both signs
        vals.append((q * 10**21 + 5 * 10**20).to_bytes(12, "big", signed=True))
        vals.append((-(q * 10**21 + 5 * 10**20)).to_bytes(12, "big", signed=True))
    vals += [
        ((10**28 - 1) * 10**21 + 5 * 10**20).to_bytes(21, "big", signed=True),
        (10**28 * 10**21).to_bytes(21, "big", signed=True),  # gate: -> 0
        (2**127 - 1).to_bytes(16, "big", signed=True),
        (-(2**127)).to_bytes(16, "big", signed=True),
        b"\x00" * 10 + (25 * 10**28).to_bytes(13, "big", signed=True),
        None,
    ]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "i long, b binary"
    )
    got = {
        r["i"]: r["d"]
        for r in df.select(
            "i", casts.bytes_decimal_expr(F.col("b")).alias("d")
        ).collect()
    }
    for i, v in enumerate(vals):
        want = scalars.bytes_to_decimal(v) if v is not None else None
        assert got[i] == want or (got[i] is None and want is None), (
            i,
            v.hex() if v else v,
            got[i],
            want,
        )
