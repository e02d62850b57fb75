"""Python user-defined TABLE functions (Spark 4 ``udtf``) — the
table-valued corner of the UDF surface (scalar pandas UDFs live in
``functions/register.py``, the grouped-map UDAF in ``operators/udaf.py``).

A UDTF is the right API when one input row expands into a VARIABLE number
of output rows through imperative per-row logic — the lateral-join shape
``FROM t, LATERAL fn(t.x)``. It is also row-at-a-time Python, i.e. the
SLOW path: everything here exists as a declarative hot-path operator too
(run-length via gaps-and-islands windows — ``q_user_streaks``; chunking —
``operators/pipeline.chunk_documents``); the UDTF form is for logic that
genuinely cannot be a Column expression. ``useArrow=True`` keeps the
transfer Arrow-batched even though eval itself is per-row.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

# must match operators/text.tokens (WORD_RE) and the DuckDB _SQL_TOKENS
# tokenizer bit-for-bit, or UDTF results can't be oracle-checked
_WORD_RE = re.compile("[^a-z0-9一-鿿 ]")


def _tokens(text: str) -> list[str]:
    return [t for t in _WORD_RE.sub(" ", text.lower()).split(" ") if t]


@udtf(returnType="start_pos int, token string, run_len int", useArrow=True)
class TokenRuns:
    """Run-length encoding of a document's token stream: one output row
    per maximal run of a repeated token, with its 1-based start position.
    ``eval`` yields a data-dependent number of rows per input row — the
    canonical UDTF shape."""

    def eval(self, text: str):  # noqa: D102 — contract documented above
        if text is None:
            return
        prev: str | None = None
        start = 0
        run = 0
        for idx, tok in enumerate(_tokens(text), 1):
            if tok == prev:
                run += 1
            else:
                if prev is not None:
                    yield (start, prev, run)
                prev, start, run = tok, idx, 1
        if prev is not None:
            yield (start, prev, run)


def register_udtfs(spark) -> list[str]:
    """Register every UDTF for SQL use; returns the registered names."""
    spark.udtf.register("token_runs", TokenRuns)
    return ["token_runs"]
