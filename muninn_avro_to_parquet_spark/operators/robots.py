"""robots.txt (RFC 9309, the Robots Exclusion Protocol): the crawl-
politeness filter between URL discovery (``operators/html.py`` outlinks,
``operators/urls.py`` canonicalization) and fetch scheduling — at corpus
scale it is also the compliance gate a training-data pipeline applies
before ingesting a crawl it did not fetch itself.

Parsing is driver-side (a robots.txt is a few KB of text per host; the
rule table for even a billion-host crawl is host-count-sized, not
corpus-sized); matching is executor-side: the rule relation broadcasts,
candidate URLs equi-join on host, the RFC's longest-match-wins /
tie-goes-to-allow decision is one window over the matched rules, and
the winner rows rejoin the URL relation — broadcast when their exact
count fits the budget (the gate in ``apply_robots``), a skew-free
sort-merge on the unique row id otherwise. URLs under no rule default
to allowed, per the RFC.

Wildcards: ``*`` matches any character run, a trailing ``$`` anchors at
path end — both from RFC 9309 §2.2.3. Rule paths compile to anchored
Java regexes ONCE at parse time (driver), so the executor-side test is
a plain ``rlike``.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from muninn_avro_to_parquet_spark.operators import urls as _urls


def parse_robots(content: str, agent: str = "*") -> list[tuple[bool, str]]:
    """The rule list (allow, path) the RFC tells ``agent`` to obey:
    groups are runs of ``User-agent`` lines followed by rules; the group
    selection follows common-practice LONGEST-MATCH semantics (ADVICE
    r11 — what the reference parsers and Googlebot do): a group token
    matches when it is a case-insensitive substring of the crawler's
    user-agent string (so ``muninn`` matches ``Muninn-Bot/1.0``), the
    most specific (longest) matching token wins, else the ``*`` group;
    multiple groups for the winning token merge. Rules appearing BEFORE
    any ``User-agent`` line are invalid per RFC 9309 and are DROPPED
    (not defaulted into the ``*`` group — a malformed file must not
    disallow URLs for every crawler). Empty Disallow values and unknown
    fields are ignored per the RFC; comments strip at ``#``."""
    groups: dict[str, list[tuple[bool, str]]] = {}
    current: list[str] = []
    in_rules = False
    for raw in content.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if in_rules:
                current = []
                in_rules = False
            current.append(value.lower())
            for a in current:
                groups.setdefault(a, [])
        elif field in ("allow", "disallow"):
            in_rules = True
            if not current:
                continue  # rule outside any group: invalid, ignored
            if not value:
                continue  # empty Disallow = allow everything (no rule)
            for a in current:
                groups.setdefault(a, []).append((field == "allow", value))
        # crawl-delay / sitemap / unknown fields: not access rules,
        # and they neither split nor extend a group — fully ignored
    key = agent.lower()
    matches = [t for t in groups if t != "*" and t and t in key]
    if key in groups:
        return groups[key]
    if matches:
        best = max(matches, key=lambda t: (len(t), t))
        return groups[best]
    return groups.get("*", [])


def _rule_regex(path: str) -> str:
    """RFC 9309 §2.2.3 pattern → anchored Java regex: ``*`` is any run,
    trailing ``$`` anchors, everything else is literal."""
    anchored = path.endswith("$")
    if anchored:
        path = path[:-1]
    body = ".*".join(re.escape(part) for part in path.split("*"))
    return "^" + body + ("$" if anchored else "")


def rules_df(
    spark: SparkSession,
    robots_by_host: list[tuple[str, str]],
    agent: str = "*",
) -> DataFrame:
    """(host, allow, path, pattern, spec_len) rule relation for one
    crawler identity — host-count-sized, meant to broadcast. ``spec_len``
    is the rule path's octet length, the RFC's specificity measure."""
    rows = []
    for host, content in robots_by_host:
        for allow, path in parse_robots(content, agent):
            rows.append((host.lower(), allow, path, _rule_regex(path), len(path)))
    return spark.createDataFrame(
        rows, "host string, allow boolean, path string, pattern string, spec_len int"
    )


def apply_robots(
    df: DataFrame,
    rules: DataFrame,
    id_col: str = "doc_id",
    url_col: str = "url",
    gate_broadcast: bool = True,
) -> DataFrame:
    """Adds ``is_allowed``: for each URL, the longest-matching rule of
    its host decides (ties go to allow, RFC 9309 §2.2.2); no matching
    rule — or no rules for the host at all — defaults to allowed.

    Shape: one broadcast equi-join on host, one window over the matched
    rules partitioned by the caller's row id (only matched-rule rows —
    ≤ rules per host per URL — enter the window), then the winner rows
    join back onto the URL relation. That last join decides whether the
    corpus-sized URL relation shuffles (r11 verdict #2 — the old
    docstring claimed it never does, which was only true under the
    broadcast threshold): with ``gate_broadcast`` the winner relation is
    eagerly materialized and its EXACT row count checked against the
    session's broadcast budget — under it, the join is hinted broadcast
    and the URL relation stays put; past it (a Disallow-heavy crawl can
    make winner corpus-sized, which must never ride a broadcast) the
    join is a skew-free sort-merge on the unique row id, exactly as at
    100 TB. Pass ``gate_broadcast=False`` to skip the materialization
    (plan stays fully lazy; Spark's stats decide the join strategy)."""
    from pyspark.sql import Window

    u = F.col(url_col)
    # path?query (fragment never reaches the server), '' → '/'
    path_q = F.regexp_extract(F.trim(u), _urls._REST_RE, 1)
    path_q = F.when(path_q == "", F.lit("/")).otherwise(path_q)
    t = df.select("*", _urls.url_host(u).alias("_host"), path_q.alias("_path_q"))
    matched = (
        t.select(id_col, "_host", "_path_q")
        .join(F.broadcast(rules), F.col("_host") == rules["host"])
        .filter(F.expr("_path_q rlike pattern"))
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("spec_len").desc(), F.col("allow").desc()
    )
    winner = (
        matched.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select(id_col, F.col("allow").alias("_rule_allow"))
    )
    if gate_broadcast:
        from muninn_avro_to_parquet_spark.operators.dedup import (
            _broadcast_threshold_bytes,
        )

        winner = winner.localCheckpoint(eager=True)
        # ~48 B/row (id + boolean + HashedRelation overhead), same
        # deliberately-fat accounting as the CC label gate. ZERO matched
        # rows must also broadcast (r12 review): an empty checkpointed
        # relation has unknown stats, and without the hint the common
        # no-rule-matches batch would sort-merge the whole corpus
        # against 0 rows.
        threshold = _broadcast_threshold_bytes(df.sparkSession)
        if (winner.count() * 48) < max(threshold, 0):
            winner = F.broadcast(winner)
    return (
        t.join(winner, id_col, "left")
        .withColumn("is_allowed", F.coalesce(F.col("_rule_allow"), F.lit(True)))
        .drop("_rule_allow", "_host", "_path_q")
    )
