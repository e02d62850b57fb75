"""Z-order (Morton) layout keys: multi-dimensional clustering for
parquet min/max data skipping.

A single-column sort clusters one predicate dimension; queries filtering
on a *different* column scan everything. Interleaving the bits of two
(or more) scaled dimensions into one Morton key and range-partitioning /
sorting on it bounds EVERY dimension's spread inside each file and row
group, so parquet footer min/max statistics prune scans for predicates
on any participating column — the technique behind Delta/Iceberg
``OPTIMIZE ZORDER BY``. At 100 TB this turns "filter on customer AND
date" from a full scan into a few-percent scan without maintaining two
copies of the data.

Everything here is integer arithmetic on native expressions (no UDFs):
the bit-interleave builds a static ``shiftright``/``bitwiseAND``/
``shiftleft``/OR expression tree that whole-stage codegen compiles to a
handful of JVM long ops per row. ``zorder_sql_expr`` emits the
*identical* arithmetic as ANSI SQL so an external engine (the DuckDB
oracle) reproduces the key bit-for-bit.

Reference scope note: the reference pipeline (main.py) writes
date-partitioned parquet only; multi-dimensional clustering is part of
this repo's beyond-reference scale surface (SURVEY §2.3).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def scale_to_bits(col: Column, mn: Column, mx: Column, bits: int = 16) -> Column:
    """Affine-scale a numeric column into ``[0, 2**bits)`` using the
    relation's global min/max (pass them as 1-row-aggregate columns via
    a broadcast cross join — metadata-sized, never a collect).

    ``floor((x - mn) * (2^bits - 1) / (mx - mn))`` in DOUBLE: IEEE-exact
    and engine-portable for the integer inputs z-ordering uses. A
    degenerate dimension (``mx == mn``) maps to 0.
    """
    top = float((1 << bits) - 1)
    x = col.cast("double")
    lo = mn.cast("double")
    hi = mx.cast("double")
    return F.when(
        hi > lo, F.floor((x - lo) * F.lit(top) / (hi - lo))
    ).otherwise(F.lit(0)).cast("long")


def zorder_key(cols: list[Column], bits: int = 16) -> Column:
    """Morton key: interleave ``bits`` low bits of each (already scaled,
    non-negative) column. Bit ``i`` of column ``j`` lands at position
    ``i * len(cols) + j``, so the key's high bits cut space into
    quadrants/octants — rows close in the key are close in EVERY
    dimension. ``len(cols) * bits`` must fit a signed long (≤ 63).
    """
    d = len(cols)
    if d * bits > 63:
        raise ValueError(f"{d} dims x {bits} bits exceeds a signed long")
    terms = [
        F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), i * d + j)
        for j, c in enumerate(cols)
        for i in range(bits)
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def zorder_sql_expr(col_exprs: list[str], bits: int = 16) -> str:
    """The same interleave as ``zorder_key`` rendered as ANSI SQL over
    pre-scaled BIGINT expressions — used verbatim by the DuckDB oracle so
    the parity check covers the bit arithmetic itself."""
    d = len(col_exprs)
    terms = [
        f"((({e} >> {i}) & 1) << {i * d + j})"
        for j, e in enumerate(col_exprs)
        for i in range(bits)
    ]
    return " | ".join(terms)


def zorder_layout(
    df: DataFrame,
    dims: list[str],
    bits: int = 16,
    key_col: str = "zkey",
) -> DataFrame:
    """Attach a Morton key over ``dims`` (numeric columns), scaling each
    by its global min/max. One tiny 1-row aggregate (broadcast cross
    join) + pure expression work; no shuffle until the caller
    range-partitions on the key.
    """
    aggs = []
    for c in dims:
        aggs.append(F.min(c).alias(f"_mn_{c}"))
        aggs.append(F.max(c).alias(f"_mx_{c}"))
    stats = df.agg(*aggs)
    out = df.crossJoin(F.broadcast(stats))
    scaled = [
        scale_to_bits(F.col(c), F.col(f"_mn_{c}"), F.col(f"_mx_{c}"), bits)
        for c in dims
    ]
    out = out.withColumn(key_col, zorder_key(scaled, bits))
    return out.drop(*[f"_mn_{c}" for c in dims], *[f"_mx_{c}" for c in dims])


def write_zordered(
    df: DataFrame,
    path: str,
    dims: list[str],
    num_files: int = 64,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Cluster-and-write: range-partition on the Morton key (sampled
    range exchange — balanced output files), sort within partitions so
    row groups inside each file are clustered too, drop the key, write
    parquet. Footer min/max on the ORIGINAL dim columns then prunes on
    any dimension."""
    keyed = zorder_layout(df, dims, bits)
    (
        keyed.repartitionByRange(num_files, "zkey")
        .sortWithinPartitions("zkey")
        .drop("zkey")
        .write.mode(mode)
        .parquet(path)
    )
