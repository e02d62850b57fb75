"""Custom vectorized aggregates via Arrow grouped-map (applyInPandas).

This is the engine's escape hatch for aggregation logic Catalyst can't
express: each group arrives as ONE pandas DataFrame over Arrow (no
row-at-a-time Python), the callable returns the aggregated frame, and
Spark shuffles only the grouping key — the same physical shape as a
built-in hash aggregate with a Python map-side.

Scale note: a group must fit in one executor's memory (Spark materializes
each group for the UDF). Keys here are low-cardinality event types; for
high-cardinality keys prefer built-in aggregates or pre-chunk the group.

Determinism: stats bottom out in integer micro-units (floor(value * 1e6))
and explicit middle-element selection, so the DuckDB oracle reproduces
them bit-for-bit — no round-half-mode or interpolation-formula drift
between engines (median as a+(b-a)/2 vs (a+b)/2 differs in the last ulp).
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

MICRO = 1_000_000


def grouped_value_stats(df: DataFrame, key_col: str, val_col: str) -> DataFrame:
    """Per-key exact order statistics over floor-quantized micro-units:
    count, doubled median (sum of the two middle elements — stays
    integral for even groups), min, max."""

    out_schema = (
        f"{key_col} string, n long, median_micros_x2 long, "
        "min_micros long, max_micros long"
    )

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(
            np.floor(pdf[val_col].to_numpy(dtype=np.float64) * MICRO).astype(np.int64)
        )
        n = len(v)
        # 0-based lower/upper middle; equal when n is odd
        lo, hi = (n - 1) // 2, n // 2
        return pd.DataFrame(
            {
                key_col: [pdf[key_col].iloc[0]],
                "n": [n],
                "median_micros_x2": [int(v[lo]) + int(v[hi])],
                "min_micros": [int(v[0])],
                "max_micros": [int(v[-1])],
            }
        )

    return df.groupBy(key_col).applyInPandas(stats, schema=out_schema)
