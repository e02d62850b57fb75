"""operators/robots: RFC 9309 parsing + the broadcast-join/window
matching semantics (longest match, tie-to-allow, default allow,
group selection)."""

from __future__ import annotations

from muninn_avro_to_parquet_spark.operators import robots


def test_parse_groups_and_agent_selection():
    txt = (
        "# policy\n"
        "User-agent: alpha\n"
        "User-agent: beta\n"
        "Disallow: /a/\n"
        "Allow: /a/b/\n"
        "\n"
        "User-agent: *\n"
        "Disallow: /x/\n"
        "Crawl-delay: 10\n"
        "Sitemap: http://h/s.xml\n"
    )
    # both agents of the multi-agent group get its rules
    for agent in ("alpha", "BETA"):
        assert robots.parse_robots(txt, agent) == [
            (False, "/a/"), (True, "/a/b/")
        ]
    # non-matching agent falls back to the * group; non-rule fields ignored
    assert robots.parse_robots(txt, "other") == [(False, "/x/")]
    # empty Disallow = no rule
    assert robots.parse_robots("User-agent: *\nDisallow:\n") == []
    # no * group and no match: no rules (everything allowed downstream)
    assert robots.parse_robots("User-agent: a\nDisallow: /\n", "b") == []


def test_rule_regex_wildcards():
    assert robots._rule_regex("/a/") == "^/a/"
    assert robots._rule_regex("/*.zip$") == "^/.*\\.zip$"
    assert robots._rule_regex("/p*q") == "^/p.*q"


def test_apply_robots_decisions(spark):
    rules = robots.rules_df(
        spark,
        [
            ("h.example",
             "User-agent: *\n"
             "Disallow: /private/\n"
             "Allow: /private/public/\n"
             "Disallow: /*.pdf$\n"),
        ],
    )
    df = spark.createDataFrame(
        [
            (0, "http://h.example/open"),              # no match -> allow
            (1, "http://h.example/private/x"),          # disallow
            (2, "http://h.example/private/public/y"),   # longer allow wins
            (3, "http://h.example/a/b.pdf"),            # wildcard+anchor
            (4, "http://h.example/a/b.pdf.html"),       # anchor must NOT match
            (5, "http://OTHER.example/private/x"),      # no rules for host
        ],
        "doc_id long, url string",
    )
    got = {
        r["doc_id"]: r["is_allowed"]
        for r in robots.apply_robots(df, rules).collect()
    }
    assert got == {0: True, 1: False, 2: True, 3: False, 4: True, 5: True}


def test_apply_robots_tie_goes_to_allow(spark):
    rules = robots.rules_df(
        spark,
        [("h.example", "User-agent: *\nDisallow: /p/\nAllow: /q/\n")],
    )
    # craft a same-length pair on one path: /p/ disallow (3) vs an added
    # allow of equal length — RFC 9309 §2.2.2: least restrictive wins
    rules2 = rules.unionByName(
        robots.rules_df(spark, [("h.example", "User-agent: *\nAllow: /p/\n")])
    )
    df = spark.createDataFrame([(1, "http://h.example/p/x")], "doc_id long, url string")
    got = robots.apply_robots(df, rules2).collect()[0]["is_allowed"]
    assert got is True


def test_apply_robots_plan_is_broadcast(spark):
    """The corpus-sized URL relation must not shuffle when the winner
    relation fits the broadcast budget: rule join AND winner join are
    broadcast (the exact-count gate, r11 verdict #2) — no sort-merge
    join anywhere in the plan."""
    rules = robots.rules_df(
        spark, [("h.example", "User-agent: *\nDisallow: /p/\n")]
    )
    df = spark.createDataFrame([(1, "http://h.example/p/x")], "doc_id long, url string")
    plan = (
        robots.apply_robots(df, rules)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_apply_robots_zero_matches_still_broadcasts(spark):
    """The common no-rule-matches batch (r12 review): an EMPTY winner
    relation trivially fits any broadcast budget, and without the hint
    its unknown checkpoint stats would sort-merge the whole corpus
    against 0 rows. Every URL must come back allowed, via broadcast."""
    rules = robots.rules_df(
        spark, [("other.example", "User-agent: *\nDisallow: /p/\n")]
    )
    df = spark.createDataFrame(
        [(1, "http://h.example/p/x"), (2, "http://h.example/q")],
        "doc_id long, url string",
    )
    out = robots.apply_robots(df, rules)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert all(r["is_allowed"] for r in out.collect())


def test_apply_robots_gate_off_matches_gated(spark):
    """gate_broadcast=False (fully lazy plan) must return the same
    verdicts as the gated default — the gate is a join-strategy hint,
    never a semantic switch."""
    rules = robots.rules_df(
        spark,
        [("h.example", "User-agent: *\nDisallow: /p/\nAllow: /p/ok/\n")],
    )
    df = spark.createDataFrame(
        [(i, f"http://h.example/{p}") for i, p in
         enumerate(["p/x", "p/ok/y", "open/z", "p/ok", "q"])],
        "doc_id long, url string",
    )
    gated = {
        (r["doc_id"], r["is_allowed"])
        for r in robots.apply_robots(df, rules).collect()
    }
    lazy = {
        (r["doc_id"], r["is_allowed"])
        for r in robots.apply_robots(df, rules, gate_broadcast=False).collect()
    }
    assert gated == lazy


def test_agent_longest_substring_match():
    """ADVICE r11: real robots.txt files write suffixed tokens
    ('Muninn-Bot', 'muninn/1.0'); exact-equality-only selection dropped
    those groups to '*', which can mark URLs allowed that the site
    specifically disallowed for this crawler. Common-practice semantics:
    a token matches when it is a case-insensitive substring of the
    crawler's agent string, most specific (longest) token wins; an
    exact-token group still beats substring matches."""
    content = (
        "User-agent: bot\nDisallow: /a/\n\n"
        "User-agent: muninn-bot\nDisallow: /b/\n\n"
        "User-agent: *\nDisallow: /c/\n"
    )
    # suffixed product token: the most specific matching group wins
    assert robots.parse_robots(content, agent="Muninn-Bot/1.0") == [
        (False, "/b/")
    ]
    # a shorter token still matches when it's the only substring hit
    assert robots.parse_robots(content, agent="SomeBot/2") == [(False, "/a/")]
    # exact token match keeps absolute priority
    assert robots.parse_robots(content, agent="bot") == [(False, "/a/")]
    # nothing matches: the * group
    assert robots.parse_robots(content, agent="crawler") == [(False, "/c/")]


def test_rules_before_any_group_are_invalid():
    """RFC 9309: rules outside a group are invalid and ignored — they
    must NOT default into the '*' group (a malformed file would disallow
    URLs for every crawler the RFC says remain allowed)."""
    content = "Disallow: /\nUser-agent: *\nDisallow: /tmp/\n"
    assert robots.parse_robots(content, agent="anything") == [(False, "/tmp/")]
