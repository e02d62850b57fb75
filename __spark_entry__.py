"""Driver contract: bridges the driver's verify harness to the engine's
query registry (``muninn_avro_to_parquet_spark.queries.QUERIES``).

``entry(spark)`` runs the flagship shipping-priority query (join-heavy,
agg + top-k) at sf0.001. ``queries()`` / ``oracle_sql()`` expose every
registry entry; entries whose oracle is ``None`` (approximate /
non-SQL-expressible ops) are omitted from ``oracle_sql()`` so the driver
records the weaker rows-only check for them.

Rotation is SELF-MAINTAINING (round-8 verdict task #1): the driver's
correctness sweep caps at 50 entries taken in dict order, so the dict is
ordered by reading the ``CORRECTNESS_r*.json`` artifacts the driver
itself writes next to this file:

1. queries never driver-green in ANY round come first (new additions
   land at the head automatically — no hand-kept ``_R{N}_NEW`` tuple to
   go stale);
2. ever-green queries follow, stalest verification first, so the capped
   sweep continuously re-freshens the oldest signal.
"""

from __future__ import annotations

import json
import re
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from muninn_avro_to_parquet_spark.queries import QUERIES

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q3_shipping_priority"].spark(spark, SMOKE_SF_DIR)


def _last_green_round() -> dict[str, int]:
    """name -> latest round whose CORRECTNESS_r{N}.json marked it green.

    Green = no error, row counts matched, and the value hash matched
    (or the entry was a rows-only check with no hash recorded). Files
    are best-effort: a missing or malformed artifact contributes
    nothing rather than breaking the driver's import of this module.
    """
    green: dict[str, int] = {}
    for path in Path(__file__).resolve().parent.glob("CORRECTNESS_r*.json"):
        m = re.search(r"r(\d+)", path.stem)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            records = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(records, dict):
            continue
        for name, rec in records.items():
            if not isinstance(rec, dict) or rec.get("err") is not None:
                continue
            if not rec.get("rows_match"):
                continue
            if rec.get("hash_match") is False:
                continue
            green[name] = max(green.get(name, 0), rnd)
    return green


def _verdict_watchlist() -> set[str]:
    """Registry names mentioned verbatim in VERDICT.md — entries the
    judge called out. Only STALE mentions matter (not green in the most
    recent sweep): the verdict's coverage tables cite dozens of freshly
    green names, and promoting those would burn the 50-entry cap
    re-verifying what just passed. This closes the r10 gap where
    q_date_spine_gapfill's fix sat below the cap for six rounds."""
    path = Path(__file__).resolve().parent / "VERDICT.md"
    try:
        text = path.read_text()
    except OSError:
        return set()
    return {n for n in QUERIES if n in text}


# Entries whose QUERY OR ORACLE semantics changed this round while their
# last green predates the change: the artifact-derived bands can't see a
# semantic edit (they were green last sweep, so neither the never-green
# head nor the verdict watchlist promotes them), so they are forced into
# the head band until the next sweep re-greens them. Reset when bumped.
_CHANGED_THIS_ROUND: tuple[str, ...] = (
    # r15 plan rewrites (outputs proven sf0.01-parity-identical locally,
    # but the driver's green is the gate): array-form PQ distances +
    # min-struct argmin + cached model relations (the whole catalyst PQ
    # family transits _pq_distances/_pq_argmin)
    "ann_topk_pq",
    "ann_topk_pq_refined",
    "ann_topk_pq_rerank",
    "ann_topk_pq_rerank_exact",
    # pagerank preamble: n_seeds folded into the n_nodes aggregate
    "graph_pagerank",
    "graph_pagerank_weighted",
    "graph_pagerank_personalized",
    "crawl_rank_pipeline",
    # select_token_budget validation folded into the offset collect
    "pipeline_token_budget",
    "pipeline_token_budget_mix",
)
_CHANGED_ROUND = 15


def _rotation() -> list[str]:
    """Sweep order. r13 verdict #4 tightened the band arithmetic: at
    210 entries / 50-cap the full re-verification cycle is >4 rounds,
    so a watchlist or changed promotion that displaces a STALER entry
    pushes the staleness tail out further every round. Bands now:

    1. never-green (new entries MUST green the round they land);
    2. changed-this-round (a semantic edit invalidates the old green —
       correctness, so it still jumps globally);
    3. everything else stalest-first, with watchlist membership only a
       TIEBREAK inside the same green-round band — a judge-called-out
       entry re-verifies before its same-staleness peers but can no
       longer leapfrog the genuinely older tail (the entry it used to
       displace is exactly the one the staleness bound is about).

    ``tests/test_driver_contract.py`` enforces the additions-pay-tax
    side: every entry ≥4 rounds stale must fit in the 50-cap head, so
    a round can't add more new entries than the tail has room for."""
    green = _last_green_round()
    order = {name: i for i, name in enumerate(QUERIES)}
    latest = max(green.values(), default=0)
    watch = {n for n in _verdict_watchlist() if green.get(n, 0) < latest}
    changed = {
        n for n in _CHANGED_THIS_ROUND if green.get(n, 0) < _CHANGED_ROUND
    }
    never = [n for n in QUERIES if n not in green]
    ever = sorted(
        (n for n in QUERIES if n in green),
        key=lambda n: (n not in changed, green[n], n not in watch, order[n]),
    )
    return never + ever


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: QUERIES[name].spark for name in _rotation()}


def oracle_sql() -> dict[str, str]:
    # same rotation as queries() so the driver's capped sweep pairs each
    # query with its oracle regardless of which dict it iterates
    return {
        name: QUERIES[name].oracle
        for name in _rotation()
        if QUERIES[name].oracle is not None
    }
