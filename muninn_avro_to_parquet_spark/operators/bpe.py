"""Distributed BPE (byte-pair-encoding) merge learning.

The classic tokenizer-training loop: split every word into symbols, count
adjacent symbol pairs weighted by word frequency, merge the most frequent
pair, repeat. The reference pipeline ships no tokenizer training; this is
one of the training-data operators a corpus engine owes its users
(Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
Subword Units" — public algorithm).

Scale design — the loop never touches the corpus:

- ONE corpus-wide aggregate builds the (word, freq) vocabulary; at 100 TB
  the vocabulary is millions of rows where the corpus is billions, so
  every subsequent iteration runs on a relation ~10^4x smaller than the
  input.
- Each merge iteration is two shuffles on the vocabulary: a window pass
  partitioned by word (words are short — no skew) and a pair-count hash
  aggregate. The argmax pair is ONE row collected to the driver (the same
  driver-side-metadata scale as the connected-components loop).
- The greedy left-to-right merge apply is expressed relationally (lead /
  row_number / lag windows), NOT as a per-row Python fold — no UDF in the
  loop, and the identical window algebra runs on any SQL engine, which is
  what the oracle uses to verify the whole iteration unrolled.

Greedy-apply correctness: overlapping matches only exist when the two
merged symbols are equal (runs like ``a a a``); greedy left-to-right then
merges at even offsets within each run. For unequal pairs every match is
disjoint (a second match at the next position would need left == right).
The ``offset % 2 == 0`` island rule below encodes exactly that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from muninn_avro_to_parquet_spark.operators import text as TX

MERGES_TYPE = T.StructType(
    [
        T.StructField("merge_rank", T.IntegerType(), False),
        T.StructField("left_sym", T.StringType(), False),
        T.StructField("right_sym", T.StringType(), False),
        T.StructField("pair_count", T.LongType(), False),
    ]
)


def word_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) vocabulary — the one corpus-sized aggregate; shares
    the corpus tokenizer (``text.tokens``) so BPE learns over exactly the
    tokens every other operator sees."""
    return (
        df.select(F.explode(TX.tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
    )


def initial_symbols(words: DataFrame) -> DataFrame:
    """(word, freq, pos, sym): every word split into single-character
    symbols, pos dense 1..len — the iteration's working relation."""
    return words.select(
        "word",
        "freq",
        F.explode(F.sequence(F.lit(1), F.length("word"))).alias("pos"),
    ).withColumn("sym", F.expr("substring(word, pos, 1)"))


def _pair_counts(seq: DataFrame) -> DataFrame:
    w = Window.partitionBy("word").orderBy("pos")
    return (
        seq.withColumn("nxt", F.lead("sym").over(w))
        .filter(F.col("nxt").isNotNull())
        .groupBy(F.col("sym").alias("left_sym"), F.col("nxt").alias("right_sym"))
        .agg(F.sum("freq").alias("pair_count"))
    )


def apply_merge(seq: DataFrame, left: str, right: str) -> DataFrame:
    """One greedy left-to-right merge of (left, right) over every word's
    symbol sequence, as pure window algebra (no UDF):

    - ``nxt``: the following symbol (lead);
    - ``grp``: gaps-and-islands id — consecutive equal symbols share it;
    - ``off``: 0-based offset inside the island; a run of equal merged
      symbols starts merges only at even offsets (greedy non-overlap);
    - a merge START becomes ``left || right``; the row AFTER a start is
      consumed; positions renumber densely for the next iteration."""
    w = Window.partitionBy("word").orderBy("pos")
    annotated = seq.withColumn("nxt", F.lead("sym").over(w))
    if left != right:
        # unequal pair: matches can never overlap (a second start at the
        # next position would need left == right), so the island/offset
        # windows — two extra sorts per iteration — are skipped entirely
        flagged = annotated.withColumn(
            "strt", (F.col("sym") == F.lit(left)) & (F.col("nxt") == F.lit(right))
        )
    else:
        island = Window.partitionBy("word", "sym").orderBy("pos")
        annotated = annotated.withColumn(
            "grp", F.col("pos") - F.row_number().over(island)
        )
        offw = Window.partitionBy("word", "sym", "grp").orderBy("pos")
        flagged = annotated.withColumn(
            "off", F.row_number().over(offw) - 1
        ).withColumn(
            "strt",
            (F.col("sym") == F.lit(left))
            & (F.col("nxt") == F.lit(right))
            & (F.col("off") % 2 == 0),
        )
    consumed = flagged.withColumn(
        "consumed", F.coalesce(F.lag("strt").over(w), F.lit(False))
    )
    return (
        consumed.filter(~F.col("consumed"))
        .select(
            "word",
            "freq",
            F.row_number().over(w).alias("pos"),
            F.when(F.col("strt"), F.concat(F.col("sym"), F.lit(right)))
            .otherwise(F.col("sym"))
            .alias("sym"),
        )
    )


def learn_bpe(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 10,
    checkpoint_every: int = 4,
    return_final_seq: bool = False,
):
    """Learn the first ``num_merges`` BPE merges over a corpus; returns
    (merge_rank, left_sym, right_sym, pair_count) in merge order with the
    deterministic tie-break (count DESC, left ASC, right ASC) so every
    engine picks the same merge sequence.

    Each iteration's working relation is persisted before the pair-count
    job materializes it, so iteration k reads iteration k-1's cached rows
    instead of replaying every prior window stack (without this the loop
    is quadratic in plan replays); the previous iteration's cache is
    dropped once superseded, and ``checkpoint_every`` additionally
    truncates the logical plan so analysis cost stays bounded for large
    merge counts.

    ``return_final_seq=True`` returns ``(merges_df, final_seq)`` — the
    post-merge (word, freq, pos, sym) relation, cached under the
    session-scoped ``bpe_seq`` key (``cache_scoped``), so callers needing
    the segmentation don't re-run the loop and repeated calls replace
    rather than accumulate cached relations."""
    from muninn_avro_to_parquet_spark.operators.cacheutil import cache_scoped

    spark = df.sparkSession
    base = initial_symbols(word_frequencies(df, text_col)).persist()
    n_syms = base.count()
    # size the loop's working-relation width from the materialized symbol
    # count (the same discipline as connected_components): the vocabulary
    # relation is orders of magnitude below the corpus. The sizing is
    # expressed IN the plan (repartition on the window key — every window
    # in the loop then reuses that partitioning with no further exchange)
    # rather than via a session-global spark.sql.shuffle.partitions
    # override, so concurrent queries on the shared session are untouched.
    n_part = max(1, min(spark.sparkContext.defaultParallelism, n_syms // 50_000 + 1))
    seq = base.repartition(n_part, "word")
    merges: list[tuple[int, str, str, int]] = []
    prev: DataFrame | None = base
    for k in range(1, num_merges + 1):
        seq = seq.persist()
        top = (
            _pair_counts(seq)
            .orderBy(F.desc("pair_count"), F.asc("left_sym"), F.asc("right_sym"))
            .limit(1)
            .collect()
        )
        if prev is not None:
            prev.unpersist()
        prev = seq
        if not top:
            break
        left, right, cnt = (
            top[0]["left_sym"],
            top[0]["right_sym"],
            top[0]["pair_count"],
        )
        merges.append((k, left, right, int(cnt)))
        seq = apply_merge(seq, left, right)
        if k % checkpoint_every == 0:
            # localCheckpoint drops partitioning info; re-establish the
            # word hash partitioning so the next rounds' windows stay
            # exchange-free (one n_part-wide exchange per checkpoint)
            seq = seq.localCheckpoint(eager=False).repartition(n_part, "word")
    merges_df = spark.createDataFrame(merges, MERGES_TYPE)
    if return_final_seq:
        final = cache_scoped(seq, "bpe_seq")
        final.count()  # materialize before dropping the loop cache it reads
        if prev is not None:
            prev.unpersist()
        return merges_df, final
    if prev is not None:
        prev.unpersist()
    return merges_df


def _pieces(seq: DataFrame) -> DataFrame:
    """(word, freq, pieces array<string>) from a symbol-sequence relation."""
    return (
        seq.groupBy("word", "freq")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "sym"))).alias("_ps"))
        .select(
            "word",
            "freq",
            F.transform(F.col("_ps"), lambda s: s["sym"]).alias("pieces"),
        )
    )


def learn_and_segment(
    df: DataFrame, text_col: str = "text", num_merges: int = 10
) -> tuple[DataFrame, DataFrame]:
    """One pass over the merge loop returning BOTH the learned merges and
    the final per-word segmentation (word, freq, pieces)."""
    merges_df, seq = learn_bpe(
        df, text_col, num_merges=num_merges, return_final_seq=True
    )
    return merges_df, _pieces(seq)


def segment_words(
    df: DataFrame, merges: list[tuple[str, str]], text_col: str = "text"
) -> DataFrame:
    """Apply an ordered list of learned merges to the corpus vocabulary:
    (word, freq, pieces array<string>) — the subword segmentation a
    tokenizer would emit per distinct word (apply once per VOCAB entry,
    never per corpus row)."""
    seq = initial_symbols(word_frequencies(df, text_col))
    for i, (left, right) in enumerate(merges, start=1):
        seq = apply_merge(seq, left, right)
        if i % 4 == 0:
            seq = seq.localCheckpoint(eager=False)
    return _pieces(seq)
