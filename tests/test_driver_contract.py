"""Guards on the driver contract (__spark_entry__.py): the first thing
the per-round verify exercises, so breakage here fails every gate at
once. Checks are structural — fast enough for every CI run."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry_mod
from muninn_avro_to_parquet_spark.plans import parity
from tests.conftest import SF_SMOKE


def test_queries_and_oracles_consistent():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert qs, "queries() must not be empty"
    # every oracle key must name a query; missing oracles are the
    # explicit rows-only exceptions, not typos
    assert set(oracles) <= set(qs)
    rows_only = set(qs) - set(oracles)
    # every registry query is oracle-checked: the ANN family got real
    # DuckDB oracles in round 3 (deterministic md5 hyperplanes/centroids +
    # integer-exact cosine), q_approx_distinct emits exact values plus
    # within-5% booleans
    assert rows_only == set(), f"unexpected rows-only entries: {sorted(rows_only)}"


@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql()))
def test_every_oracle_parses_in_duckdb(name):
    """EXPLAIN each oracle against the registered views — a syntax error
    or schema drift in an oracle string fails here, not in the driver."""
    con = parity.duckdb_connection(SF_SMOKE)
    con.sql("EXPLAIN " + entry_mod.oracle_sql()[name])


def test_rotation_puts_unverified_queries_first():
    """Round-8 verdict #1: the driver's correctness sweep caps at 50
    entries in dict order, and the hand-kept ``_R{N}_NEW`` head tuples
    went stale. The rotation is now derived from the CORRECTNESS_r*.json
    artifacts themselves — any query never driver-green MUST lead the
    dict so the next sweep verifies it."""
    green = entry_mod._last_green_round()
    names = list(entry_mod.queries())
    never = [n for n in names if n not in green]
    assert names[: len(never)] == never, (
        "never-driver-green queries must occupy the head of the rotation"
    )
    # r10 verdict #2: entries the judge named in VERDICT.md whose green
    # is stale jump the queue (q_date_spine_gapfill sat below the
    # 50-entry cap for six rounds); within each band stalest-first.
    latest = max(green.values(), default=0)
    watch = {
        n for n in entry_mod._verdict_watchlist() if green.get(n, 0) < latest
    }
    changed = {
        n
        for n in entry_mod._CHANGED_THIS_ROUND
        if green.get(n, 0) < entry_mod._CHANGED_ROUND
    }
    tail = names[len(never) :]
    # r13 verdict #4: watchlist is a tiebreak WITHIN a green-round band,
    # not a global jump — a promotion may no longer displace an entry
    # staler than itself
    bands = [(n not in changed, green[n], n not in watch) for n in tail]
    assert bands == sorted(bands), (
        "ever-green tail must be changed-first, then stalest-first with"
        " watchlist breaking ties inside a band"
    )


def test_rotation_sweep_covers_the_stale_tail():
    """r13 verdict #4 (additions pay a re-green tax): the 50-cap sweep
    must contain EVERY entry ≥4 rounds stale — so a round may only add
    as many new (never-green) entries as the head has room for after
    the changed band and the oldest tail. At 210 entries this is what
    keeps the full re-verification cycle from stretching past the
    rotation period."""
    green = entry_mod._last_green_round()
    latest = max(green.values(), default=0)
    if not latest:
        pytest.skip("no CORRECTNESS artifacts yet")
    head = set(list(entry_mod.queries())[:50])
    oldest = {n: latest - r for n, r in green.items() if latest - r >= 4}
    missed = {n: s for n, s in oldest.items() if n not in head}
    assert not missed, (
        "entries >=4 rounds stale crowded out of the 50-entry sweep"
        f" (too many new entries this round?): {missed}"
    )


def test_rotation_bounds_max_staleness():
    """r11 verdict #7 (the literal assertion the watchlist design
    implies): with a 50-entry sweep cap and stalest-first rotation, no
    ever-green entry's last green may trail the latest round by more
    than ceil(len(registry)/50) + 1 rounds — the rotation period plus
    one round of slack for cap-displacing new entries."""
    import math

    green = entry_mod._last_green_round()
    latest = max(green.values(), default=0)
    if not latest:
        pytest.skip("no CORRECTNESS artifacts yet")
    bound = math.ceil(len(entry_mod.queries()) / 50) + 1
    stale = {n: latest - r for n, r in green.items() if latest - r > bound}
    assert not stale, (
        f"entries staler than {bound} rounds (rotation must re-sweep them): "
        f"{stale}"
    )


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0


_BARE_SESSION_SCRIPT = r"""
import sys

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

# exactly what the driver harness does: NO engine configs, default TZ from
# the environment (set to America/Sao_Paulo by the test — 3h off UTC)
spark = SparkSession.builder.master("local[4]").appName("bare").getOrCreate()

from muninn_avro_to_parquet_spark.plans import parity

# representative sample: nanos-timestamp table read + timestamp formatting
# (q_sessionize), plain agg (q1), dedup operator path (dedup_exact)
results = parity.run_all(spark, "/root/testdata/sf0.001",
                         names=["q1_pricing_summary", "q_sessionize", "dedup_exact"])
bad = {k: v for k, v in results.items() if v.get("ok") is False}
if bad:
    print("PARITY_FAIL", bad)
    sys.exit(1)
print("PARITY_OK", sorted(results))
"""


def test_bare_driver_session_non_utc_tz():
    """Round-1 regression: the driver builds its own vanilla SparkSession
    (no nanosAsLong, no UTC pin) — all 48 CORRECTNESS rows erred on
    PARQUET_TYPE_ILLEGAL because the configs lived only in get_spark().
    register_views must now pin them at runtime on ANY session. Run in a
    subprocess so the test gets a genuinely fresh JVM + a hostile TZ."""
    import subprocess
    import os

    env = dict(os.environ, TZ="America/Sao_Paulo")
    # a pytest-session Spark JVM may already be up; the subprocess builds
    # its own driver so the two don't share confs
    proc = subprocess.run(
        [os.sys.executable, "-c", _BARE_SESSION_SCRIPT],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, f"stdout={proc.stdout[-3000:]}\nstderr={proc.stderr[-3000:]}"
    assert "PARITY_OK" in proc.stdout


def test_register_views_skip_marker_repairs_overridden_view(spark):
    """register_views skips the per-view catalog writes when the session's
    views already point at sf_dir (r15 optimization: ~50 ms of catalog
    churn per timed entry invocation). The skip must be governed by the
    _muninn_views_point_at marker: clearing it (the documented contract
    for any code that re-points a registered table name) forces the next
    call to repair the catalog."""
    from pyspark.sql import functions as F

    from muninn_avro_to_parquet_spark import tables

    tables.register_views(spark, SF_SMOKE)
    n_true = spark.table("region").count()
    # warm path: marker set, second call skips but views still serve
    assert spark.__dict__.get("_muninn_views_point_at") == SF_SMOKE
    tables.register_views(spark, SF_SMOKE)
    assert spark.table("region").count() == n_true

    # poison one registered view WITHOUT clearing the marker: the skip
    # serves the stale view (the documented trade), then clearing the
    # marker repairs it on the next call
    spark.range(1).select(F.lit("x").alias("r_name")).createOrReplaceTempView(
        "region"
    )
    tables.register_views(spark, SF_SMOKE)
    assert spark.table("region").count() == 1  # stale: skip honored marker
    tables.invalidate_views(spark)  # the public invalidation hook
    tables.register_views(spark, SF_SMOKE)
    assert spark.table("region").count() == n_true  # repaired
