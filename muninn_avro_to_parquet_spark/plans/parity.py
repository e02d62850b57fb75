"""Oracle-parity harness: run a registry query on Spark AND its DuckDB
oracle, canonicalize both results (columns sorted by name, rows sorted by
all columns), and diff values — a local replica of the driver's
correctness gate so mismatches surface before a round ends.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb
import pandas as pd

from muninn_avro_to_parquet_spark import tables


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in tables.TABLE_NAMES:
        con.sql(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df.reindex(sorted(df.columns), axis=1)
    for c in out.columns:
        if str(out[c].dtype).startswith("datetime"):
            out[c] = out[c].astype("datetime64[us]")
        elif out[c].dtype == object:
            out[c] = out[c].map(lambda v: str(v) if v is not None and not isinstance(v, float) else v)
    if len(out):
        out = out.sort_values(by=list(out.columns), na_position="last").reset_index(drop=True)
    return out


def _values_equal(a: Any, b: Any) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b


def _dtype_class(dtype) -> str:
    s = str(dtype).lower()
    if s.startswith(("int", "uint")):
        return "int"
    if s.startswith("float"):
        return "float"
    return s


def dtype_conflicts(s: pd.DataFrame, o: pd.DataFrame) -> list[tuple[str, str, str]]:
    """Columns where one side is integer and the other float.

    The driver's hash stringifies values, so an int 101005 vs a float
    101005.0 hash-differ even though ``==`` holds — DuckDB's HUGEINT (from
    integer SUM) rendered as float64 by pandas is the classic cause. The
    local gate must be as strict as the driver or this class of failure
    stays invisible until the round ends."""
    out = []
    for c in s.columns:
        if c in o.columns:
            a, b = _dtype_class(s[c].dtype), _dtype_class(o[c].dtype)
            if {a, b} == {"int", "float"}:
                out.append((c, str(s[c].dtype), str(o[c].dtype)))
    return out


def compare(spark_df, oracle_df: pd.DataFrame) -> dict:
    s = canonicalize(spark_df.toPandas())
    o = canonicalize(oracle_df)
    report: dict[str, Any] = {
        "rows": (len(s), len(o)),
        "rows_match": len(s) == len(o),
        "cols": (list(s.columns), list(o.columns)),
        "cols_match": list(s.columns) == list(o.columns),
        "dtype_conflicts": dtype_conflicts(s, o),
        "value_mismatches": [],
    }
    if not (report["rows_match"] and report["cols_match"] and not report["dtype_conflicts"]):
        report["ok"] = False
        return report
    for c in s.columns:
        sv, ov = list(s[c]), list(o[c])
        for i, (x, y) in enumerate(zip(sv, ov)):
            if not _values_equal(x, y):
                report["value_mismatches"].append((c, i, x, y))
                if len(report["value_mismatches"]) > 5:
                    report["ok"] = False
                    return report
    report["ok"] = not report["value_mismatches"]
    return report


def run_all(spark, sf_dir: str, names: list[str] | None = None) -> dict[str, dict]:
    from muninn_avro_to_parquet_spark.queries import QUERIES

    con = duckdb_connection(sf_dir)
    results = {}
    for name, entry in QUERIES.items():
        if names and name not in names:
            continue
        sdf = entry.spark(spark, sf_dir)
        if entry.oracle is None:
            results[name] = {"ok": None, "rows": (sdf.count(), None), "note": "rows-only"}
            continue
        odf = con.sql(entry.oracle).df()
        results[name] = compare(sdf, odf)
    return results
