"""URL canonicalization: the crawl-pipeline stage between outlink
extraction (``operators/html.py``) and URL-level dedup / the link graph
(``operators/graph.py``). Two crawls of ``HTTP://Example.COM:80/a`` and
``http://example.com/a#top`` are the same page; canonicalizing before
the dedup groupBy is what makes the key space collapse.

Everything here is PURE Catalyst column expressions — no UDF, no Python
worker, whole-stage-codegen throughout — and every regex is restricted
to plain character classes (no backreferences, no lookarounds) so the
exact same pattern runs identically on Java regex and RE2-class
engines (the DuckDB oracle uses the same patterns verbatim).

Normalization applied (the conservative, semantics-preserving subset of
RFC 3986 §6):

- strip the fragment (``#...`` never reaches the server);
- lowercase the scheme and the host[:port] (RFC 3986 §6.2.2.1 makes
  only scheme and host case-insensitive — userinfo before ``@`` is
  kept verbatim, and paths are NOT touched);
- drop the default port (``:80`` for http, ``:443`` for https);
- empty path → ``/`` (``http://h`` ≡ ``http://h/``);
- drop a trailing lone ``?`` (empty query).

Inputs without a ``scheme://`` prefix (relative hrefs, fragments,
mailto-less junk) pass through trimmed but otherwise untouched — the
caller decides how to resolve or drop them; silently guessing a base
URL would corrupt the graph.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
_AUTHORITY_RE = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_REST_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)"


def url_scheme(url: Column) -> Column:
    """Lowercased scheme, '' when the value is not an absolute URL."""
    return F.lower(F.regexp_extract(F.trim(url), _SCHEME_RE, 1))


def url_host(url: Column) -> Column:
    """Lowercased host (authority minus port/userinfo), '' if absent."""
    auth = F.lower(F.regexp_extract(F.trim(url), _AUTHORITY_RE, 1))
    # userinfo@ off the front, :port off the back — plain classes only
    return F.regexp_replace(
        F.regexp_replace(auth, "^[^@]*@", ""), ":[0-9]*$", ""
    )


def canonical_url(url: Column) -> Column:
    """The canonical form described in the module docstring; non-absolute
    inputs pass through trimmed."""
    u = F.trim(url)
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    # RFC 3986 §6.2.2.1: only scheme and host are case-insensitive —
    # userinfo (anything before '@', which cannot appear raw inside
    # userinfo) is kept VERBATIM; lowercasing it would both conflate
    # distinct credentials and mutate them in the canonical output.
    rawauth = F.regexp_extract(u, _AUTHORITY_RE, 1)
    userinfo = F.regexp_extract(rawauth, "^([^@]*@)", 1)
    hostport = F.lower(F.regexp_replace(rawauth, "^[^@]*@", ""))
    hostport = F.when(
        scheme == "http", F.regexp_replace(hostport, ":80$", "")
    ).when(
        scheme == "https", F.regexp_replace(hostport, ":443$", "")
    ).otherwise(hostport)
    auth = F.concat(userinfo, hostport)
    rest = F.regexp_extract(u, _REST_RE, 1)
    rest = F.regexp_replace(rest, "\\?$", "")
    # empty path → '/', and a query with no path gets the '/' too so
    # 'http://h?x=1' and 'http://h/?x=1' collide (they are the same
    # resource)
    rest = F.when(rest == "", F.lit("/")).when(
        rest.startswith("?"), F.concat(F.lit("/"), rest)
    ).otherwise(rest)
    return F.when(
        scheme == "", u
    ).otherwise(F.concat(scheme, F.lit("://"), auth, rest))


def sitemap_locs(xml: Column) -> Column:
    """``<loc>`` URL list from a sitemap/sitemap-index XML document
    (sitemaps.org protocol) — the third crawl-discovery channel next to
    outlinks (``operators/html.py``) and robots rules
    (``operators/robots.py``; robots.txt's ``Sitemap:`` lines point
    here). Pure Catalyst: one ``regexp_extract_all`` with a plain
    character-class pattern (Java regex and RE2 agree), trimmed — a
    sitemap is flat enough that tag extraction IS the parse; namespace
    prefixes and attribute noise never reach the captured group.

    The protocol REQUIRES entity-escaping in loc text (ADVICE r11: a
    multi-parameter URL is written ``a=1&amp;b=2`` — extracting the
    literal ``&amp;`` would never join the same URL seen via outlinks),
    so the five XML entities decode after extraction, ``&amp;`` LAST
    (single-pass semantics: ``&amp;lt;`` means a literal ``&lt;``).
    ``<![CDATA[...]]>`` wrappers strip before extraction — the markers
    are literal tokens, so two literal replaces keep any ``]`` inside
    the URL intact."""
    flat = F.regexp_replace(
        F.regexp_replace(xml, F.lit("<!\\[CDATA\\["), F.lit("")),
        F.lit("\\]\\]>"),
        F.lit(""),
    )

    def unescape(u: Column) -> Column:
        for ent, ch in (
            ("&lt;", "<"),
            ("&gt;", ">"),
            ("&quot;", '"'),
            ("&apos;", "'"),
            ("&amp;", "&"),  # last: &amp;lt; decodes to the literal &lt;
        ):
            u = F.regexp_replace(u, F.lit(ent), F.lit(ch))
        return u

    return F.transform(
        F.regexp_extract_all(flat, F.lit("<loc>([^<]*)</loc>"), F.lit(1)),
        lambda u: unescape(F.trim(u)),
    )


def dedup_by_canonical_url(
    df: DataFrame, id_col: str, url_col: str = "url"
) -> DataFrame:
    """Adds ``canonical_url``, ``host``, and ``is_dup`` (true for every
    row whose canonical form was already claimed by a lower id) — the
    ``normalized_dedup`` discipline applied to the URL key space: one
    window over the canonical key, riding a single shuffle."""
    from pyspark.sql.window import Window

    canon = df.select(
        "*",
        canonical_url(F.col(url_col)).alias("canonical_url"),
        url_host(F.col(url_col)).alias("host"),
    )
    w = Window.partitionBy("canonical_url")
    return canon.select(
        "*",
        (F.col(id_col) != F.min(id_col).over(w)).alias("is_dup"),
    )
