"""operators/urls: canonicalization edge cases the registry archetypes
don't reach, plus the codegen/narrowness guarantee."""

from __future__ import annotations

from pyspark.sql import functions as F

from muninn_avro_to_parquet_spark.operators import urls


def _canon(spark, raw: list[str]) -> list[str]:
    df = spark.createDataFrame([(u,) for u in raw], "url string")
    return [
        r["c"] for r in df.select(urls.canonical_url(F.col("url")).alias("c")).collect()
    ]


def test_canonical_url_cases(spark):
    got = _canon(
        spark,
        [
            "HTTP://Example.COM:80/a/b?x=1#frag",   # all normalizations at once
            "https://example.com:443",               # default port + empty path
            "https://example.com:8080/a",            # non-default port kept
            "http://example.com/CaseSensitive/Path", # path case untouched
            "  http://example.com/a  ",              # trimmed
            "ftp://Example.com:21/file",             # unknown scheme: port kept
            "relative/path",                         # passthrough
            "#fragment-only",                        # passthrough
            "http://user@Example.com/a",             # host lowercased, userinfo kept
            "http://UsEr:Pw@Example.com/a",          # RFC 3986: userinfo VERBATIM
            "http://example.com/a?",                 # lone ? stripped
            "http://example.com/a?x=1&y=2",          # real query kept
        ],
    )
    assert got == [
        "http://example.com/a/b?x=1",
        "https://example.com/",
        "https://example.com:8080/a",
        "http://example.com/CaseSensitive/Path",
        "http://example.com/a",
        "ftp://example.com:21/file",
        "relative/path",
        "#fragment-only",
        "http://user@example.com/a",
        "http://UsEr:Pw@example.com/a",
        "http://example.com/a",
        "http://example.com/a?x=1&y=2",
    ]


def test_url_host_and_scheme(spark):
    df = spark.createDataFrame(
        [("HTTPS://User:pw@Sub.Example.COM:8443/x?y#z",), ("nope",)], "url string"
    )
    rows = df.select(
        urls.url_scheme(F.col("url")).alias("s"),
        urls.url_host(F.col("url")).alias("h"),
    ).collect()
    assert (rows[0]["s"], rows[0]["h"]) == ("https", "sub.example.com")
    assert (rows[1]["s"], rows[1]["h"]) == ("", "")


def test_dedup_by_canonical_url(spark):
    df = spark.createDataFrame(
        [
            (1, "http://A.com/x"),
            (2, "HTTP://a.com:80/x#top"),   # dup of 1
            (3, "http://a.com/y"),
            (4, "https://a.com/x"),          # different scheme: NOT a dup
        ],
        "doc_id long, url string",
    )
    got = {r["doc_id"]: r["is_dup"] for r in urls.dedup_by_canonical_url(df, "doc_id").collect()}
    assert got == {1: False, 2: True, 3: False, 4: False}


def test_urls_stay_jvm_side(spark):
    """Pure Catalyst: no Python eval node anywhere in the plan."""
    df = spark.createDataFrame([(1, "http://a.com/x")], "doc_id long, url string")
    plan = (
        urls.dedup_by_canonical_url(df, "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "ArrowEval" not in plan


def test_pathless_query_gets_the_slash(spark):
    got = _canon(spark, ["http://Host.com?x=1", "http://host.com/?x=1"])
    assert got == ["http://host.com/?x=1", "http://host.com/?x=1"]


def test_canonical_url_is_idempotent(spark):
    """canonical(canonical(u)) == canonical(u) over the full cross
    product of URL shapes — a canonicalizer that keeps moving on its own
    output would split the dedup key space between passes."""
    import itertools

    from pyspark.sql import functions as F

    parts = itertools.product(
        ["http", "HTTP", "https", "ftp", ""],          # scheme (empty = relative)
        ["Example.com", "sub.EX.org", "user@Host.net"],
        ["", ":80", ":443", ":8080"],
        ["", "/", "/A/b", "/x%20y"],
        ["", "?", "?q=1", "?A=B&c=d"],
        ["", "#frag"],
    )
    raws = []
    for scheme, host, port, path, query, frag in parts:
        base = f"{scheme}://{host}" if scheme else host
        raws.append(f"{base}{port}{path}{query}{frag}")
    df = spark.createDataFrame([(u,) for u in raws], "url string")
    out = df.select(
        "url",
        urls.canonical_url(F.col("url")).alias("c1"),
        urls.canonical_url(urls.canonical_url(F.col("url"))).alias("c2"),
    ).collect()
    bad = [(r["url"], r["c1"], r["c2"]) for r in out if r["c1"] != r["c2"]]
    assert bad == [], bad[:5]


def test_sitemap_locs(spark):
    """sitemaps.org <loc> extraction: document order, trimming, nested
    index files, and empty input (r11)."""
    xml = (
        '<?xml version="1.0"?><urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<url><loc>http://a.example/x</loc><lastmod>2026-01-01</lastmod></url>"
        "<url><loc>  http://a.example/y </loc><priority>0.5</priority></url>"
        "</urlset>"
    )
    index = (
        "<sitemapindex><sitemap><loc>http://a.example/s1.xml</loc></sitemap>"
        "<sitemap><loc>http://a.example/s2.xml</loc></sitemap></sitemapindex>"
    )
    df = spark.createDataFrame(
        [(1, xml), (2, index), (3, "<urlset></urlset>")], "doc_id long, xml string"
    )
    got = {
        r["doc_id"]: r["locs"]
        for r in df.select(
            "doc_id", urls.sitemap_locs(F.col("xml")).alias("locs")
        ).collect()
    }
    assert got[1] == ["http://a.example/x", "http://a.example/y"]
    assert got[2] == ["http://a.example/s1.xml", "http://a.example/s2.xml"]
    assert got[3] == []


def test_sitemap_locs_entities_and_cdata(spark):
    """ADVICE r11: the sitemaps.org protocol REQUIRES entity escaping in
    loc text — '&' is written '&amp;' — so extraction must decode the
    five XML entities or a multi-parameter URL never joins the same URL
    discovered via outlinks; CDATA-wrapped locs carry their content
    verbatim. '&amp;lt;' must decode to the literal '&lt;' (single-pass
    semantics), not to '<'."""
    xml = (
        "<urlset>"
        "<url><loc>http://h/q?a=1&amp;b=2</loc></url>"
        "<url><loc><![CDATA[http://h/raw?x=1&y=2]]></loc></url>"
        "<url><loc>http://h/odd?s=&amp;lt;&apos;&quot;&gt;</loc></url>"
        "</urlset>"
    )
    df = spark.createDataFrame([(xml,)], "xml string")
    locs = df.select(urls.sitemap_locs(F.col("xml")).alias("l")).first()["l"]
    assert locs == [
        "http://h/q?a=1&b=2",
        "http://h/raw?x=1&y=2",
        "http://h/odd?s=&lt;'\">",
    ]
