"""Test-table catalog: load the driver-materialized parquet tables and
register them as temp views (the engine's SQL surface).

At 100 TB these would be external-catalog tables; the loader keeps the same
names so every query in ``queries.py`` runs unchanged against either.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from muninn_avro_to_parquet_spark import session

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


# tables small enough that one partition beats a repartition shuffle
_TINY = {"region", "nation"}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # the caller's session may be a vanilla one (the driver harness builds
    # its own); pin the correctness-relevant confs before any read —
    # events.parquet carries TIMESTAMP(NANOS) columns Spark rejects without
    # nanosAsLong, and timestamp formatting assumes UTC
    session.ensure_runtime_confs(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    if name == "events":
        from pyspark.sql import functions as F

        ts_type = dict(df.dtypes)["ts"]
        if ts_type == "bigint":
            # ts as raw nanos (nanosAsLong): truncate to micro precision —
            # the same truncation DuckDB applies casting TIMESTAMP_NS → TIMESTAMP
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type != "timestamp":
            # e.g. TIMESTAMP_NTZ when a caller read the file before confs
            # were pinned; session tz is UTC so the cast is shift-free
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    # the test fixtures are single-row-group files, which pin every scan to
    # one task; a real 100 TB table arrives as thousands of files and
    # parallelizes naturally. Spread rows across the cluster once at load
    # so downstream operators see realistic parallelism, and cache — the
    # registry reuses these views across the whole query set.
    if name not in _TINY:
        df = df.repartition(spark.sparkContext.defaultParallelism)
    return df.cache()


def invalidate_views(spark: SparkSession) -> None:
    """Force the next ``register_views`` call to re-point every temp view.

    The public invalidation hook for code that re-points one of
    ``TABLE_NAMES`` to a different relation behind this module's back
    (tests perturbing a table, ad-hoc ``createOrReplaceTempView``
    overrides): call this afterwards so the skip-marker fast path below
    cannot serve the overridden catalog as if it still matched sf_dir."""
    spark.__dict__.pop("_muninn_views_point_at", None)


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every test table as a temp view; DataFrames cached per
    (session, dir).

    The cache hangs off the session object itself (an ``id(spark)``-keyed
    module dict would collide when CPython reuses a stopped session's
    address, handing out DataFrames bound to a dead JVM). Temp views are
    re-pointed whenever this session's views may not already point at
    ``sf_dir`` — a different sf_dir may have claimed the view names since
    the cached registration, and serving stale views would silently run
    queries against the wrong dataset. When the ``_muninn_views_point_at``
    marker proves the views already match, the per-view catalog writes are
    skipped; any caller that re-points a registered view name itself must
    call ``invalidate_views`` (the marker contract) or it will be served
    the stale catalog. Switching dirs unpersists the previous dir's tables
    so alternating smoke/correctness/bench dirs in one session doesn't pin
    every dataset in memory."""
    # re-pin confs even on the cached path: the caller may have reset the
    # session timezone (or any other runtime conf) since the first load
    session.ensure_runtime_confs(spark)
    cache: dict[str, dict[str, DataFrame]] = spark.__dict__.setdefault(
        "_muninn_registered_views", {}
    )
    for other_dir in [d for d in cache if d != sf_dir]:
        for df in cache[other_dir].values():
            df.unpersist()
        del cache[other_dir]
    if sf_dir in cache:
        # Skip the per-view catalog writes when this session's views
        # already point at sf_dir: ``createOrReplaceTempView`` costs
        # ~5 ms of plan re-analysis per view, and every registry entry
        # invocation routes through here — at 10 views that was ~50 ms
        # of pure catalog churn inside every timed bench region (~48 ms
        # measured warm; ~30 s across a 218-entry × 3-repeat sweep).
        # The ``_muninn_views_point_at`` marker is the invalidation
        # contract: any code that re-points one of TABLE_NAMES to a
        # different relation (tests perturbing a table, ad-hoc
        # overrides) must clear it so the next call repairs the
        # catalog; switching sf_dir clears it below automatically.
        if spark.__dict__.get("_muninn_views_point_at") == sf_dir:
            return cache[sf_dir]
        for name, df in cache[sf_dir].items():
            df.createOrReplaceTempView(name)
        spark.__dict__["_muninn_views_point_at"] = sf_dir
        return cache[sf_dir]
    spark.__dict__["_muninn_views_point_at"] = None
    out = {}
    for name in TABLE_NAMES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    cache[sf_dir] = out
    spark.__dict__["_muninn_views_point_at"] = sf_dir
    return out
