"""HTML → main-content text extraction (boilerplate removal).

The one curation stage every real crawl corpus hits before any other
text operator can run: strip markup, drop chrome (nav/header/footer/
sidebar/forms), classify remaining text blocks by link density and
length, and emit the merged main content. The classification rule is
the published jusText/Boilerpipe insight — boilerplate blocks are short
and/or link-dense, content blocks are long runs of plain prose — reduced
to a deterministic, tunable form with no model and no randomness, so the
same bytes always extract to the same text on every executor.

Spark shape: HTML parsing is irreducibly per-document Python (there is
no Catalyst expression for tag soup), so this rides the same Arrow-
batched ``mapInPandas`` discipline as the codec family
(``operators/multimodal.py``): narrow map, no shuffle, batch transfer
amortized by Arrow; at 100 TB the stage scales linearly with input
splits and adds zero exchanges. Everything downstream (quality gate,
dedup, decontamination) consumes the extracted column with its usual
plan.

Only the stdlib is used (``html.parser``); entity decoding is the
parser's own ``convert_charrefs``. Malformed markup never raises: the
parser is tolerant by design and every counter is guarded, so worst
case a bad document extracts to ''.
"""

from __future__ import annotations

from dataclasses import dataclass
from html.parser import HTMLParser
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

# content inside these never reaches the text stream (code, styling,
# metadata, vector markup, embedded docs)
STRIP_TAGS = frozenset(
    "script style noscript template svg head iframe object embed applet".split()
)
# page chrome: the element and its whole subtree are boilerplate by
# construction, independent of link density
CHROME_TAGS = frozenset(
    "nav header footer aside form button select option datalist".split()
)
# block-level boundaries: entering or leaving one finishes the current
# text block
BLOCK_TAGS = frozenset(
    (
        "p div li ul ol dl dt dd h1 h2 h3 h4 h5 h6 td th tr table thead "
        "tbody tfoot section article main blockquote pre figure figcaption "
        "details summary hr fieldset legend address center body html title"
    ).split()
)
HEADING_TAGS = frozenset(("h1", "h2", "h3", "h4", "h5", "h6"))
# void elements fire only a starttag even unclosed — they must never
# push strip/chrome depth
_VOID_TAGS = frozenset(
    "br img hr input meta link area base col source track wbr".split()
)

DEFAULT_MIN_WORDS = 3
DEFAULT_MAX_LINK_DENSITY = 0.33


@dataclass
class Block:
    """One finished text block with the counts the keep-rule needs."""

    text: str  # whitespace-normalized
    words: int
    chars: int  # non-whitespace chars
    link_chars: int  # non-whitespace chars under an <a>
    heading: bool

    @property
    def link_density(self) -> float:
        return self.link_chars / self.chars if self.chars else 0.0


class _BlockParser(HTMLParser):
    """Streams tag soup into a list of ``Block``s in document order."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._drop: dict[str, int] = {}  # open STRIP/CHROME tags by name
        self._drop_depth = 0
        self._a_depth = 0
        self._heading_depth = 0
        self._pieces: list[tuple[str, bool]] = []
        self._block_heading = False
        self.blocks: list[Block] = []

    # -- block lifecycle ------------------------------------------------
    def _flush(self) -> None:
        if not self._pieces:
            return
        # concatenate WITHOUT an injected separator: data pieces split
        # only by an inline tag are one word ('<b>B</b>old' is 'Bold',
        # not 'B old'). Whitespace comes exclusively from the document
        # itself plus the explicit ' ' pieces appended for void tags
        # (<br> et al.); block boundaries flush, so blocks never merge.
        raw = "".join(p for p, _ in self._pieces)
        normalized = " ".join(raw.split())
        if normalized:
            chars = sum(len("".join(p.split())) for p, _ in self._pieces)
            link_chars = sum(
                len("".join(p.split())) for p, in_a in self._pieces if in_a
            )
            self.blocks.append(
                Block(
                    text=normalized,
                    words=len(normalized.split()),
                    chars=chars,
                    link_chars=link_chars,
                    heading=self._block_heading,
                )
            )
        self._pieces = []
        self._block_heading = False

    # -- parser events --------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _VOID_TAGS:
            # soft whitespace inside the current block (br et al.)
            if not self._drop_depth:
                self._pieces.append((" ", self._a_depth > 0))
            return
        if tag in STRIP_TAGS or tag in CHROME_TAGS:
            self._flush()
            self._drop[tag] = self._drop.get(tag, 0) + 1
            self._drop_depth += 1
            return
        if self._drop_depth and tag in ("main", "article"):
            # tag-soup recovery: <main>/<article> are not valid
            # descendants of nav/header/footer/aside/form in HTML's
            # content model, so reaching one means an earlier chrome tag
            # was never closed (a real crawl hazard — without this an
            # unclosed <nav> swallows the whole page). End the CHROME
            # subtrees; STRIP tags (script/style) keep dropping — raw
            # text inside those is data, not markup.
            for t in list(self._drop):
                if t in CHROME_TAGS and self._drop[t]:
                    self._drop_depth -= self._drop[t]
                    self._drop[t] = 0
        if self._drop_depth:
            return
        if tag in BLOCK_TAGS:
            self._flush()
            if tag in HEADING_TAGS:
                self._heading_depth += 1
                self._block_heading = True
        elif tag == "a":
            self._a_depth += 1

    def handle_endtag(self, tag: str) -> None:
        if tag in STRIP_TAGS or tag in CHROME_TAGS:
            if self._drop.get(tag, 0) > 0:
                self._drop[tag] -= 1
                self._drop_depth -= 1
            return
        if self._drop_depth:
            return
        if tag in BLOCK_TAGS:
            self._flush()
            if tag in HEADING_TAGS and self._heading_depth > 0:
                self._heading_depth -= 1
        elif tag == "a" and self._a_depth > 0:
            self._a_depth -= 1

    def handle_data(self, data: str) -> None:
        if self._drop_depth or not data:
            return
        self._pieces.append((data, self._a_depth > 0))
        if self._heading_depth:
            self._block_heading = True

    def close(self) -> None:  # finish the trailing block
        super().close()
        self._flush()


def extract_blocks(html: str) -> list[Block]:
    """Parse ``html`` into classified text blocks (document order)."""
    p = _BlockParser()
    try:
        p.feed(html)
        p.close()
    except Exception:
        # tolerant by contract: a document the parser chokes on yields
        # whatever blocks were completed before the failure
        p._flush()
    return p.blocks


def keep_block(
    b: Block,
    min_words: int = DEFAULT_MIN_WORDS,
    max_link_density: float = DEFAULT_MAX_LINK_DENSITY,
) -> bool:
    """The deterministic jusText-style keep rule: a block survives when
    it is link-sparse AND either long enough to be prose or a heading
    (headings carry structure at any length)."""
    if b.link_density > max_link_density:
        return False
    if b.heading:
        return b.words >= 1
    return b.words >= min_words


def extract_main_text(
    html: str,
    min_words: int = DEFAULT_MIN_WORDS,
    max_link_density: float = DEFAULT_MAX_LINK_DENSITY,
) -> tuple[str, int, int]:
    """(main_text, n_blocks, n_kept) for one document."""
    blocks = extract_blocks(html)
    kept = [b for b in blocks if keep_block(b, min_words, max_link_density)]
    return "\n\n".join(b.text for b in kept), len(blocks), len(kept)


class _LinkParser(HTMLParser):
    """Collects (href, anchor-text) pairs in document order — including
    links inside chrome (nav/footer), since the link GRAPH wants every
    outedge even where the text extractor drops the block. Links inside
    script/style/etc. never appear (there are no real <a> tags there;
    textual lookalikes are data, not tags, and HTMLParser won't fire
    handle_starttag for them inside <script> CDATA)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.links: list[tuple[str, str]] = []
        self._href: str | None = None
        self._anchor: list[str] = []

    def _finish(self) -> None:
        if self._href is not None:
            self.links.append((self._href, " ".join(" ".join(self._anchor).split())))
        self._href, self._anchor = None, []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "a":
            self._finish()  # tag soup: unclosed <a> ends at the next <a>
            href = next((v for k, v in attrs if k == "href"), None)
            if href is not None:
                self._href = href

    def handle_endtag(self, tag: str) -> None:
        if tag == "a":
            self._finish()

    def handle_data(self, data: str) -> None:
        if self._href is not None and data:
            self._anchor.append(data)

    def close(self) -> None:
        super().close()
        self._finish()


def extract_links(html: str) -> list[tuple[str, str]]:
    """All (href, anchor_text) pairs of ``html`` in document order."""
    p = _LinkParser()
    try:
        p.feed(html)
        p.close()
    except Exception:
        p._finish()
    return p.links


def html_links(
    df: DataFrame, id_col: str = "doc_id", html_col: str = "html"
) -> DataFrame:
    """One row per outlink: (id, seq, href, anchor). The exploded edge
    relation feeds the link graph (``operators/graph.pagerank``) and
    URL-level dedup; same Arrow-batched narrow-map shape as
    ``html_extract``."""
    import pandas as pd

    is_binary = isinstance(df.schema[html_col].dataType, T.BinaryType)

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = []
            for i, h in zip(pdf[id_col], pdf[html_col]):
                if h is None:
                    continue
                s = (
                    bytes(h).decode("utf-8", errors="replace")
                    if is_binary
                    else str(h)
                )
                for seq, (href, anchor) in enumerate(extract_links(s)):
                    out.append((i, seq, href, anchor))
            yield pd.DataFrame(out, columns=[id_col, "seq", "href", "anchor"])

    id_type = df.schema[id_col].dataType
    schema = T.StructType(
        [
            T.StructField(id_col, id_type, True),
            T.StructField("seq", T.IntegerType(), True),
            T.StructField("href", T.StringType(), True),
            T.StructField("anchor", T.StringType(), True),
        ]
    )
    return df.select(id_col, html_col).mapInPandas(run, schema=schema)


def html_features_type(
    id_col: str = "doc_id", id_type: T.DataType | None = None
) -> T.StructType:
    return T.StructType(
        [
            T.StructField(id_col, id_type or T.LongType(), True),
            T.StructField("main_text", T.StringType(), True),
            T.StructField("n_blocks", T.IntegerType(), True),
            T.StructField("n_kept", T.IntegerType(), True),
            T.StructField("n_chars", T.IntegerType(), True),
        ]
    )


def html_extract(
    df: DataFrame,
    id_col: str = "doc_id",
    html_col: str = "html",
    min_words: int = DEFAULT_MIN_WORDS,
    max_link_density: float = DEFAULT_MAX_LINK_DENSITY,
) -> DataFrame:
    """Main-content extraction over Arrow batches: one output row per
    input row with (main_text, n_blocks, n_kept, n_chars).

    ``html_col`` may be string or binary (binaryFile ingest) — bytes are
    decoded as UTF-8 with replacement, never raising. Narrow map, no
    shuffle; compose the result straight into ``quality_features`` /
    ``normalized_dedup`` — the curation pipeline's first stage on a raw
    crawl."""
    import pandas as pd

    is_binary = isinstance(df.schema[html_col].dataType, T.BinaryType)

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = []
            for i, h in zip(pdf[id_col], pdf[html_col]):
                if h is None:
                    out.append((i, None, 0, 0, 0))
                    continue
                s = (
                    bytes(h).decode("utf-8", errors="replace")
                    if is_binary
                    else str(h)
                )
                text, n_blocks, n_kept = extract_main_text(
                    s, min_words, max_link_density
                )
                out.append((i, text, n_blocks, n_kept, len(text)))
            yield pd.DataFrame(
                out,
                columns=[id_col, "main_text", "n_blocks", "n_kept", "n_chars"],
            )

    schema = html_features_type(id_col, df.schema[id_col].dataType)
    return df.select(id_col, html_col).mapInPandas(run, schema=schema)
