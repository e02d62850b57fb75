"""As-of and range joins — temporal operators Spark has no builtin for.

``asof_join`` matches each left row to the single most recent right row
with ``right.ts <= left.ts`` within the same key group (the canonical
"latest quote for each trade" join).

Spark-first design: the naive formulation (inequality join + row_number)
plans as a per-key explosion — every left row meets every earlier right
row before the window prunes. Instead we use the union-and-carry pattern:

    1. tag left rows (is_left=1) and right rows (is_left=0), union them —
       ONE relation, one schema, right columns nulled on left rows;
    2. one window per key ordered by (ts, is_left): ``last_value(right
       col, ignorenulls)`` carries the latest right values forward onto
       each left row;
    3. keep left rows.

Cost: a single hash shuffle on the key + one sort — identical asymptotics
to a sort-merge join, no intermediate blow-up, no skew amplification
(a key's cost is |left|+|right|, never |left|×|right|). This is how
streaming systems implement temporal joins and scales to 100 TB the same
way any windowed aggregation does.

``range_join`` (left.ts in [right.start, right.end)) uses Spark's
inequality join directly but equi-binds the key columns so the planner
picks sort-merge/broadcast on the key, applying the range as a post-join
predicate — the shape AQE and DuckDB's IEJoin both optimize.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: list[str] | None = None,
    right_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the most recent right row (right.on <=
    left.on), matching on the ``by`` key columns. Right's carried columns
    are renamed with ``suffix`` (the ``on`` column keeps its name too).

    Ties (equal timestamps) match — right rows sort before left rows at
    the same instant, like DuckDB's ASOF JOIN (>= semantics).
    """
    by = by or []
    right_cols = right_cols or [c for c in right.columns if c != on and c not in by]

    # the right row travels as ONE struct: carrying each column separately
    # with last(ignorenulls) would back-fill a legitimately-NULL right
    # value from an OLDER right row, stitching together fields of rows
    # that never coexisted
    rstruct_type = T.StructType(
        [T.StructField(c, right.schema[c].dataType, True) for c in right_cols]
        + [T.StructField(on, right.schema[on].dataType, True)]
    )
    lhs = left.select(
        *left.columns,
        F.lit(1).alias("_is_left"),
        F.lit(None).cast(rstruct_type).alias("_rrow"),
    )
    rhs = (
        # a NULL right timestamp would sort before everything (NULLS
        # FIRST) and fabricate matches for early left rows — it can never
        # be "the most recent row", so drop it up front
        right.filter(F.col(on).isNotNull())
        .select(
            *[
                F.lit(None).cast(left.schema[c].dataType).alias(c)
                for c in left.columns
                if c not in by and c != on
            ],
            *[F.col(c) for c in by],
            F.col(on),
            F.lit(0).alias("_is_left"),
            F.struct(
                *[F.col(c) for c in right_cols], F.col(on).alias(on)
            ).alias("_rrow"),
        )
        .select(*lhs.columns)
    )  # align column order for the union

    w = (
        Window.partitionBy(*by)
        # final _rrow tiebreak: several right rows at the same instant
        # must carry ONE deterministic winner (the greatest struct), not
        # whichever the shuffle placed last
        .orderBy(F.col(on).asc(), F.col("_is_left").asc(), F.col("_rrow").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = lhs.unionByName(rhs).select(
        *[c for c in left.columns],
        F.col("_is_left"),
        F.last(F.col("_rrow"), ignorenulls=True).over(w).alias("_rrow"),
    )
    return (
        carried.filter(F.col("_is_left") == 1)
        .select(
            *[c for c in left.columns],
            *[F.col(f"_rrow.{c}").alias(c + suffix) for c in right_cols],
            F.col(f"_rrow.{on}").alias(on + suffix),
        )
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_start: str,
    right_end: str,
    by: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """left rows matched to right intervals: by-keys equal AND
    ``right_start <= left_ts < right_end``."""
    by = by or []
    # explicit aliases: both sides may share lineage (self-joins), where
    # bare left[k]/right[k] references turn ambiguous after the join
    lhs = left.alias("_rj_l")
    rhs = right.alias("_rj_r")
    cond = (F.col(f"_rj_l.{left_ts}") >= F.col(f"_rj_r.{right_start}")) & (
        F.col(f"_rj_l.{left_ts}") < F.col(f"_rj_r.{right_end}")
    )
    for k in by:
        cond = cond & (F.col(f"_rj_l.{k}") == F.col(f"_rj_r.{k}"))
    joined = lhs.join(rhs, cond, how)
    # collapse the duplicate key columns into one — coalesce, because on
    # an outer side the unmatched row carries its key only in ITS copy
    # (dropping the right copy under how='right' would null the key)
    for k in by:
        joined = (
            joined.withColumn(
                f"_{k}_merged", F.coalesce(F.col(f"_rj_l.{k}"), F.col(f"_rj_r.{k}"))
            )
            .drop(F.col(f"_rj_l.{k}"))
            .drop(F.col(f"_rj_r.{k}"))
            .withColumnRenamed(f"_{k}_merged", k)
        )
    return joined
