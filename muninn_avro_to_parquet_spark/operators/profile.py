"""Data profiling: the per-column audit relation every ingest runs
before trusting a new table (null rates, cardinality, range, mode).

The reference logs schemas (main.py diagnostic logging); this is the
VALUE-level counterpart — one narrow relation summarizing each column,
cheap enough to run per batch and diff across loads (a null-rate jump
or a cardinality collapse is how upstream breakage actually shows up).

Scale shape: per profiled column, ONE (value → count) aggregate —
map-side combined, moving value/count partials, never rows — feeds
both the stats aggregate and the mode (orderBy+limit 1 =
TakeOrderedAndProject, a per-partition heap, never a global sort).
Mode ties break by (count DESC, value ASC), so the report is
deterministic and the DuckDB oracle replays it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Per-column profile: (column, n_rows, n_nulls, n_distinct,
    min_value, max_value, top_value, top_count) — min/max/top rendered
    as strings so one relation covers heterogeneous column types
    (prefer profiling integer/string columns when the report must
    hash-match across engines; float→string rendering is
    engine-specific). ``n_distinct`` and the mode are EXACT — use
    ``q_approx_distinct``'s HLL sketch when the cardinality itself is
    the scale problem. NULLs are excluded from distinct/min/max/mode
    and reported in ``n_nulls``."""
    cols = list(cols) if cols is not None else list(df.columns)
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"profile: no such columns {missing}")
    if not cols:
        raise ValueError("profile needs at least one column")
    total = df.agg(F.count("*").cast("long").alias("n_rows"))
    out = None
    for c in cols:
        # group on the NATIVE value (min/max must use the column's own
        # order — a string min over integers would be lexicographic);
        # only the rendered REPORT columns are strings
        per_value = (
            df.select(F.col(c).alias("_v"))
            .filter(F.col("_v").isNotNull())
            .groupBy("_v")
            .agg(F.count("*").alias("_n"))
        )
        stats = per_value.agg(
            F.lit(c).alias("column"),
            F.coalesce(F.sum("_n"), F.lit(0)).cast("long").alias("_present"),
            F.count("*").cast("long").alias("n_distinct"),
            F.min("_v").cast("string").alias("min_value"),
            F.max("_v").cast("string").alias("max_value"),
        )
        top = (
            per_value.orderBy(
                F.col("_n").desc(), F.col("_v").cast("string").asc()
            )
            .limit(1)
            .select(
                F.col("_v").cast("string").alias("top_value"),
                F.col("_n").cast("long").alias("top_count"),
            )
        )
        row = (
            stats.crossJoin(F.broadcast(total))
            # left-ish: an all-NULL column has an empty top relation;
            # keep its profile row with NULL mode
            .join(F.broadcast(top), F.lit(True), "left")
            .select(
                "column",
                "n_rows",
                (F.col("n_rows") - F.col("_present")).cast("long").alias("n_nulls"),
                "n_distinct",
                "min_value",
                "max_value",
                "top_value",
                F.coalesce(F.col("top_count"), F.lit(0))
                .cast("long")
                .alias("top_count"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


def robust_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    k: float = 5.0,
) -> DataFrame:
    """Robust (median/MAD) outlier report per group — the numeric
    data-quality gate that mean/stddev z-scores can't be (one fat
    outlier inflates the stddev that is supposed to catch it; the
    median absolute deviation has a 50% breakdown point). A row is an
    outlier when ``|x − median| > k · MAD`` (k≈5 ≈ 3.4σ under
    normality).

    Exact interpolated percentiles on both sides (the q_exact_quantiles
    discipline — Spark ``percentile`` ≡ DuckDB ``quantile_cont``
    bit-for-bit), two aggregate passes (median, then MAD of deviations),
    then one flagging aggregate: per GROUP the report is
    (group, n_rows, median, mad, n_outliers). Exact percentiles buffer
    each group's values — the documented trade vs a sketch; groups are
    the unit of parallelism.

    ``mad = 0`` (over half the group identical) degenerates honestly:
    any row different from the median flags."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    groups = list(group_cols or [])
    v = F.col(value_col).cast("double")
    base = df.select(*groups, v.alias("_x")).filter(F.col("_x").isNotNull())

    def _agg(rel, exprs):
        return rel.groupBy(*groups).agg(*exprs) if groups else rel.agg(*exprs)

    med = _agg(base, [F.expr("percentile(_x, 0.5D)").alias("_med")])
    withmed = base.join(F.broadcast(med), groups) if groups else base.crossJoin(
        F.broadcast(med)
    )
    mad = _agg(
        withmed.select(*groups, F.abs(F.col("_x") - F.col("_med")).alias("_x")),
        [F.expr("percentile(_x, 0.5D)").alias("_mad")],
    )
    scored = (
        withmed.join(F.broadcast(mad), groups)
        if groups
        else withmed.crossJoin(F.broadcast(mad))
    )
    return _agg(
        scored,
        [
            F.count("*").cast("long").alias("n_rows"),
            F.first("_med").alias("median"),
            F.first("_mad").alias("mad"),
            F.sum(
                (
                    F.abs(F.col("_x") - F.col("_med"))
                    > F.lit(float(k)) * F.col("_mad")
                ).cast("long")
            )
            .cast("long")
            .alias("n_outliers"),
        ],
    )


def profile_quantiles(
    df: DataFrame,
    cols: list[str],
    id_col: str,
    k: int = 256,
    quantiles_pct: tuple[int, ...] = (25, 50, 75, 95),
    n_salts: int = 32,
) -> DataFrame:
    """Approximate per-COLUMN percentiles from ONE pass — the sketch
    answer to ``profile()``'s exact interpolated percentiles, which
    need a full value exchange per column (the r14 verdict's stated
    motivation for a mergeable quantile relation). The columns unpivot
    into (column, value) rows and each column keeps its bottom-``k``
    md5-rank sample (``sketches.quantile_sketch_build_grouped`` with
    the few-groups salt dial, since "groups" here are a handful of
    column names); estimates come off the ≤ k·|cols| sample. Output:
    (column, q_pct int, est double, n_sample long).

    Values cast to DOUBLE so heterogeneous numeric columns share one
    relation (exact for ints below 2^53 and for float/double sources;
    rank estimates tolerate the cast by construction). NULLs drop per
    column — a sparser column simply samples its non-null rows.
    ``id_col`` must be row-unique; every column samples the SAME md5
    row draw, so cross-column estimates come from one coherent sample."""
    from muninn_avro_to_parquet_spark.operators import sketches

    if not cols:
        raise ValueError("profile_quantiles needs at least one column")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"profile_quantiles: no such columns {missing}")
    # one md5 draw per SOURCE row, computed BELOW the unpivot: every
    # column shares the row's draw anyway (the cross-column coherence
    # property below), so hashing after the stack re-ran md5+conv once
    # per (row, column) — 4 columns = 4× the sketch's dominant CPU line
    # (r15 optimization round; equality pinned in tests/test_sketches.py
    # via the rank_col path). The hash MUST live in its own select: a
    # generator expression in the same select plants the sibling
    # expressions in the Project ABOVE the Generate (verified in the
    # executed plan), silently restoring the per-(row, column) cost.
    hashed = df.select(
        F.col(id_col).alias("_rid"),
        sketches._qs_rank(F.col(id_col)).alias("_h"),
        *[F.col(c) for c in cols],
    )
    stacked = hashed.select(
        "_rid",
        "_h",
        F.expr(
            "stack({n}, {pairs}) as (column, v)".format(
                n=len(cols),
                pairs=", ".join(
                    f"'{c}', cast({c} as double)" for c in cols
                ),
            )
        ),
    )
    sk = sketches.quantile_sketch_build_grouped(
        stacked, "v", "_rid", "column", k=k, n_salts=n_salts, rank_col="_h"
    )
    return sketches.quantile_sketch_query_grouped(
        sk, list(quantiles_pct)
    ).select(
        F.col("g").alias("column"),
        "q_pct",
        "est",
        "n_sample",
    )


def key_skew(df: DataFrame, key_col: str) -> DataFrame:
    """Key-frequency skew histogram — the relation that answers "can I
    shuffle on this key?" before a 100 TB join or aggregation commits
    to it. Per-key counts are bucketed by integer log2 (bucket b holds
    keys occurring in [2^b, 2^(b+1))); output one row per occupied
    bucket: (freq_bucket int, n_keys long, n_rows long, max_count
    long). A hot key shows up as a lonely high bucket; a clean uniform
    key collapses into one or two buckets. Complementary to
    ``operators/skew.key_skew_report`` (the top-k hottest keys by
    name): the report names the head, this histogram shapes the whole
    distribution.

    The log2 is INTEGER-exact in both engines — length(bin(count)) − 1,
    never floating log2 (which rounds 2^53-adjacent values
    differently) — so the histogram hash-matches. NULL keys carry no
    identity and are excluded (profile() reports null rates).

    Scale shape: one map-side-combined exchange on the key (the same
    aggregate the candidate join would need anyway), then a tiny
    aggregate over the per-key counts — the histogram relation is
    ≤64 rows regardless of input size."""
    counts = (
        df.filter(F.col(key_col).isNotNull())
        .groupBy(key_col)
        .agg(F.count("*").alias("_cnt"))
    )
    return (
        counts.select(
            (F.length(F.bin(F.col("_cnt"))) - 1)
            .cast("int")
            .alias("freq_bucket"),
            F.col("_cnt"),
        )
        .groupBy("freq_bucket")
        .agg(
            F.count("*").cast("long").alias("n_keys"),
            F.sum("_cnt").cast("long").alias("n_rows"),
            F.max("_cnt").cast("long").alias("max_count"),
        )
    )
