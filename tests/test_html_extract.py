"""HTML → main-content extraction (operators/html).

The differential test hand-labels every block of a realistic page as
content or boilerplate and asserts the extractor's keep/drop decisions
match the labels exactly — not just "some text came out". Edge cases
cover the tag-soup realities of a crawl corpus: unclosed tags, nested
strip tags, entities, void elements, binary input, and the link-density
boundary itself."""

from __future__ import annotations

import pytest

from muninn_avro_to_parquet_spark.operators.html import (
    extract_blocks,
    extract_main_text,
    html_extract,
    keep_block,
)

# ---- hand-labeled differential page ---------------------------------------
# Every (text-fragment, label) pair below was labeled BY HAND; the test
# asserts the extractor keeps exactly the content-labeled blocks.
_LABELED_PAGE = """<!DOCTYPE html><html>
<head><title>City Council Roundup</title>
<style>.ad { display:none }</style>
<script>analytics.boot();</script></head>
<body>
<nav><a href="/">Home</a> <a href="/news">News</a> <a href="/events">Events</a></nav>
<header><p>The Riverton Gazette — local news daily</p></header>
<main>
<h1>Council approves the riverfront path extension</h1>
<p>After two hours of public comment the council voted five to two on
Thursday to extend the riverfront path north to the old mill district,
with construction slated to begin next spring.</p>
<p>Funding combines a state trail grant with money left over from the
bridge repaving project, which came in under budget last fall.</p>
<h2>What happens next</h2>
<p>Survey crews start next month. <a href="/docs/plan.pdf">The full
plan</a> runs forty pages and includes two new pedestrian crossings.</p>
<p>Read more</p>
<div class="related"><a href="/a/77">Path phase one, two years on</a>
<a href="/a/81">Mill district rezoning explained</a></div>
</main>
<aside><h3>Newsletter</h3><p>Sign up</p></aside>
<footer><a href="/contact">Contact</a> <a href="/archive">Archive</a>
© Riverton Gazette</footer>
</body></html>"""

# hand labels, in document order of the blocks the parser should emit
# (nav/header/aside/footer are chrome subtrees — they never become blocks)
_EXPECTED_BLOCKS = [
    ("Council approves the riverfront path extension", True),  # heading
    ("After two hours of public comment", True),
    ("Funding combines a state trail grant", True),
    ("What happens next", True),  # heading
    ("Survey crews start next month.", True),  # inline link is minority
    ("Read more", False),  # 2 words < min_words
    ("Path phase one, two years on", False),  # link farm, density 1.0
]


def test_hand_labeled_blocks_classified_exactly():
    blocks = extract_blocks(_LABELED_PAGE)
    assert len(blocks) == len(_EXPECTED_BLOCKS), [b.text[:40] for b in blocks]
    for b, (prefix, want_keep) in zip(blocks, _EXPECTED_BLOCKS):
        assert b.text.startswith(prefix), (b.text[:60], prefix)
        assert keep_block(b) is want_keep, (b.text[:60], b.words, b.link_density)


def test_main_text_joins_kept_blocks_in_order():
    text, n_blocks, n_kept = extract_main_text(_LABELED_PAGE)
    assert n_blocks == 7 and n_kept == 5
    paras = text.split("\n\n")
    assert paras[0] == "Council approves the riverfront path extension"
    assert paras[3] == "What happens next"
    assert "Read more" not in paras
    assert "Sign up" not in text  # aside chrome
    assert "Riverton Gazette" not in text  # header + footer chrome
    assert "analytics.boot" not in text  # script stripped


# ---- edge cases ------------------------------------------------------------

def test_entities_and_charrefs_decode():
    text, _, _ = extract_main_text(
        "<p>Fish &amp; chips cost &pound;9 &mdash; a fair price&#33;</p>"
    )
    assert text == "Fish & chips cost \xa39 — a fair price!"


def test_unclosed_paragraphs_split_blocks():
    text, n_blocks, _ = extract_main_text(
        "<p>First block of prose right here<p>Second block of prose right here"
    )
    assert n_blocks == 2
    assert text.count("\n\n") == 1


def test_nested_and_unclosed_strip_tags():
    # nested <style> inside <script> plus an unclosed <script> at the end:
    # nothing inside may leak, already-parsed content must survive
    text, _, _ = extract_main_text(
        "<p>Real content sentence stays here</p>"
        "<script>var a = '<style>'; doc.write('x');</script>"
        "<p>Another real content sentence stays</p><script>trailing unclosed"
    )
    assert "Real content sentence stays here" in text
    assert "Another real content sentence stays" in text
    assert "doc.write" not in text and "trailing" not in text


def test_br_is_soft_whitespace_not_a_block_boundary():
    text, n_blocks, _ = extract_main_text(
        "<p>line one of the note<br>line two of the note</p>"
    )
    assert n_blocks == 1
    assert text == "line one of the note line two of the note"


def test_link_density_boundary():
    # the rule is strict >: exactly AT the threshold is kept
    blocks = extract_blocks('<p>aaaa bbbb <a href="x">cccc</a></p>')
    assert len(blocks) == 1 and blocks[0].link_density == pytest.approx(1 / 3)
    assert keep_block(blocks[0], max_link_density=1 / 3)
    assert not keep_block(blocks[0], max_link_density=0.33)  # just past it
    # minority-link prose: kept under the default; majority-link: dropped
    assert keep_block(extract_blocks('<p>aaaa bbbb cccc <a href="x">dd</a></p>')[0])
    assert not keep_block(extract_blocks('<p>aa <a href="x">bbbb cccc dddd</a></p>')[0])


def test_heading_kept_at_any_length_unless_linky():
    assert extract_main_text("<h2>Update</h2>")[0] == "Update"
    assert extract_main_text('<h2><a href="x">Update</a></h2>')[0] == ""


def test_empty_and_textless_documents():
    assert extract_main_text("")[0] == ""
    assert extract_main_text("<html><head><title>t</title></head></html>") == ("", 0, 0)
    assert extract_main_text("plain text with no markup at all")[0] == (
        "plain text with no markup at all"
    )


def test_comments_and_doctype_ignored():
    text, _, _ = extract_main_text(
        "<!DOCTYPE html><!-- hidden comment words --><p>Visible prose body text</p>"
    )
    assert text == "Visible prose body text"


# ---- Spark surface ---------------------------------------------------------

def test_html_extract_dataframe_string_and_binary(spark):
    page = (
        '<body><nav><a href="/">x</a></nav>'
        "<p>The quick brown fox jumps over the lazy dog</p></body>"
    )
    df = spark.createDataFrame(
        [(1, page), (2, None), (3, "<p>hi</p>")], "doc_id long, html string"
    )
    rows = {r["doc_id"]: r for r in html_extract(df).collect()}
    assert rows[1]["main_text"] == "The quick brown fox jumps over the lazy dog"
    assert rows[1]["n_blocks"] == 1 and rows[1]["n_kept"] == 1
    assert rows[2]["main_text"] is None and rows[2]["n_blocks"] == 0
    assert rows[3]["n_kept"] == 0  # too short

    bdf = spark.createDataFrame(
        [(1, bytearray(page.encode())), (2, bytearray(b"\xff\xfe<p>junk bytes but three words survive here</p>"))],
        "doc_id long, html binary",
    )
    rows = {r["doc_id"]: r for r in html_extract(bdf).collect()}
    assert rows[1]["main_text"] == "The quick brown fox jumps over the lazy dog"
    assert "survive here" in rows[2]["main_text"]  # replacement decode, no raise


def test_html_extract_plan_is_narrow(spark):
    """No shuffle: one mapInPandas over the scan, nothing else."""
    df = spark.createDataFrame([(1, "<p>a b c d</p>")], "doc_id long, html string")
    plan = html_extract(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "MapInPandas" in plan


# ---- outlink extraction ----------------------------------------------------

def test_extract_links_tag_soup():
    from muninn_avro_to_parquet_spark.operators.html import extract_links

    links = extract_links(
        '<nav><a href="/kept">Nav link</a></nav>'
        '<a href="/a">first<a href="/b">unclosed ends first</a>'
        "<a>no href ignored</a>"
        '<a href="/c">spans <b>inline</b> tags</a>'
        '<script>var s = \'<a href="/fake">not a link</a>\';</script>'
    )
    assert links == [
        ("/kept", "Nav link"),
        ("/a", "first"),
        ("/b", "unclosed ends first"),
        ("/c", "spans inline tags"),
    ]


def test_html_links_dataframe(spark):
    from muninn_avro_to_parquet_spark.operators.html import html_links

    df = spark.createDataFrame(
        [(1, '<a href="/x">one</a><a href="/y">two</a>'), (2, None), (3, "<p>none</p>")],
        "doc_id long, html string",
    )
    rows = sorted(
        (r["doc_id"], r["seq"], r["href"], r["anchor"])
        for r in html_links(df).collect()
    )
    assert rows == [(1, 0, "/x", "one"), (1, 1, "/y", "two")]


def test_unclosed_nav_does_not_swallow_the_article():
    """Tag-soup recovery: <main>/<article> cannot legally sit inside
    chrome, so reaching one force-closes the dangling chrome subtree —
    without this an unclosed <nav> dropped the whole page."""
    text, _, _ = extract_main_text(
        '<body><nav><a href="/">Home</a> <a href="/b">Blog</a>'  # never closed
        "<main><p>The article body is still extracted despite the bad nav</p>"
        "</main></body>"
    )
    assert text == "The article body is still extracted despite the bad nav"
    # STRIP tags are NOT rescued the same way: <article> inside an
    # unclosed <script> is raw data, not markup
    text2, _, _ = extract_main_text(
        "<script>var x = 1; <article><p>not real markup</p>"
    )
    assert text2 == ""


# ---- property-based hardening ----------------------------------------------
# A crawl corpus is arbitrary byte soup; the extractor's contract is
# "never raise, always deterministic". Hypothesis hunts the corners the
# hand-written soup tests missed.

from hypothesis import given, settings
from hypothesis import strategies as st

_tagish = st.sampled_from(
    ["<p>", "</p>", "<a href='x'>", "</a>", "<nav>", "</nav>", "<script>",
     "</script>", "<br>", "<div>", "</div>", "<main>", "<h2>", "</h2>",
     "<!--", "-->", "&amp;", "&#200;", "<", ">", "&", "<p", "='"]
)
_soup = st.lists(
    _tagish | st.text(max_size=12), min_size=0, max_size=40
).map("".join)


@given(_soup)
@settings(max_examples=300, deadline=None)
def test_extractor_total_on_tag_soup(doc):
    """Never raises; deterministic; counts consistent; kept text is a
    subset relation of block text."""
    from muninn_avro_to_parquet_spark.operators.html import (
        extract_blocks,
        extract_main_text,
        extract_links,
    )

    text1, n_blocks, n_kept = extract_main_text(doc)
    text2, n_blocks2, n_kept2 = extract_main_text(doc)
    assert (text1, n_blocks, n_kept) == (text2, n_blocks2, n_kept2)
    assert 0 <= n_kept <= n_blocks
    blocks = extract_blocks(doc)
    assert len(blocks) == n_blocks
    for para in text1.split("\n\n") if text1 else []:
        assert any(b.text == para for b in blocks)
    links1 = extract_links(doc)
    assert links1 == extract_links(doc)
    assert all(isinstance(h, str) and isinstance(a, str) for h, a in links1)


@given(st.binary(max_size=120))
@settings(max_examples=200, deadline=None)
def test_extractor_total_on_raw_bytes(raw):
    """The binaryFile path decodes with replacement and must survive any
    byte string (invalid UTF-8, NULs, truncated multibyte runs)."""
    from muninn_avro_to_parquet_spark.operators.html import extract_main_text

    text, n_blocks, n_kept = extract_main_text(
        raw.decode("utf-8", errors="replace")
    )
    assert isinstance(text, str) and 0 <= n_kept <= n_blocks


def test_inline_tags_do_not_split_words():
    """'<b>B</b>old' is one word 'Bold' — data pieces separated only by
    an inline tag concatenate with NO injected whitespace (jusText /
    Boilerpipe behavior on real crawl HTML); block tags still split."""
    text, _, _ = extract_main_text(
        "<p><b>B</b>old and <em>ita</em>lic words make real prose here</p>"
    )
    assert text.startswith("Bold and italic words")
    blocks = extract_blocks("<p>an <a href='/x'>inline</a> link mid-sentence</p>")
    assert blocks[0].text == "an inline link mid-sentence"
    assert blocks[0].words == 4
    # word counts feed the keep rule: the merged word counts once
    blocks = extract_blocks("<p>pre<b>fix</b></p><p>next block</p>")
    assert [b.text for b in blocks] == ["prefix", "next block"]
