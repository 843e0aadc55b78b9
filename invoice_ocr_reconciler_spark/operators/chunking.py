"""Training-sequence preparation: token-window chunking and shard-wise
sequence packing.

Pretraining pipelines do two things to curated documents before batching:
split long documents into overlapping token windows (chunking), and
concatenate short ones into fixed-capacity sequences (packing, the
concat-and-cut layout). Both here are pure DataFrame ops:

- chunking is per-row codegen (split -> windowed slices -> explode): no
  shuffle, embarrassingly parallel at any corpus size;
- packing needs a running token offset, which is inherently sequential —
  the scale answer is to pack WITHIN a shard (hash of doc id), one window
  cumsum per shard: shards are independent, so parallelism = #shards and
  the only state is a per-shard running sum. Global packing order is a
  non-goal (training shuffles sequences anyway); determinism per shard is
  the contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def chunk_documents(
    docs: DataFrame,
    window: int = 64,
    stride: int = 48,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per token window: (doc_id, chunk_id, chunk_text,
    chunk_tokens). Windows start every `stride` tokens; the final window is
    truncated, and a doc shorter than `window` yields exactly one chunk.
    Empty docs yield none."""
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")
    if stride > window:
        # a stride beyond the window drops tokens AND the n_chunks formula
        # would emit phantom empty chunks past the end of short docs
        raise ValueError("stride must be <= window (gaps drop tokens)")
    from invoice_ocr_reconciler_spark.functions.text import tokens_col

    # the shared tokenization contract: chunk boundaries and chunk_tokens
    # must agree with token_count_col-based n_tokens (pack_sequences input)
    base = docs.select(F.col(id_col), tokens_col(F.col(text_col)).alias("_toks"))
    n = F.size("_toks")
    # number of windows: 1 + ceil(max(n - window, 0) / stride)
    n_chunks = F.when(n <= 0, F.lit(0)).otherwise(
        F.lit(1) + F.ceil(F.greatest(n - window, F.lit(0)) / stride).cast("int")
    )
    starts = F.when(
        n_chunks > 0, F.sequence(F.lit(0), (n_chunks - 1) * stride, F.lit(stride))
    ).otherwise(F.array())
    return (
        base.select(
            F.col(id_col),
            F.col("_toks"),
            F.posexplode(starts).alias("chunk_id", "_start"),
        )
        .select(
            F.col(id_col),
            F.col("chunk_id"),
            F.array_join(
                F.slice(F.col("_toks"), F.col("_start") + 1, window), " "
            ).alias("chunk_text"),
            F.least(F.lit(window), F.size("_toks") - F.col("_start")).alias(
                "chunk_tokens"
            ),
        )
    )


def shuffle_shards(
    docs: DataFrame,
    n_shards: int = 64,
    id_col: str = "doc_id",
    salt: str = "shuffle",
) -> DataFrame:
    """Deterministic global shuffle into balanced output shards — the
    export layout step before packing/batching.

    Training exports need documents in an order uncorrelated with crawl
    order (domain runs, temporal runs), but `orderBy(rand())` is
    nondeterministic across retries and a full global sort besides. Here
    each document gets a pseudo-random rank = md5(salt ':' id) — a pure
    function of the row key, so reruns, retries, and different
    partitionings produce the SAME permutation — then:

      shard = first-8-hex(rank) as int mod n_shards   (balanced i.i.d.)
      pos   = row_number within shard, ordered by (rank, id)

    One exchange (the shard window); no global sort — shards are
    independent, so parallelism = n_shards and a writer can stream each
    shard ordered by pos. Changing `salt` draws a fresh permutation
    (epoch reshuffles). -> (id, shard, pos).
    """
    rank = F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    shard = (
        F.conv(F.substring(rank, 1, 8), 16, 10).cast("long") % n_shards
    ).cast("int")
    w = Window.partitionBy("shard").orderBy("shuffle_rank", id_col)
    return (
        docs.select(
            F.col(id_col),
            rank.alias("shuffle_rank"),
            shard.alias("shard"),
        )
        .withColumn("pos", F.row_number().over(w))
        .select(id_col, "shard", "pos")
    )


def pack_sequences(
    docs: DataFrame,
    capacity: int = 2048,
    n_shards: int = 64,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    shard_col: str | Column | None = None,
) -> DataFrame:
    """Concat-and-cut packing plan: assign each doc its byte-offset layout
    inside fixed-capacity token sequences, independently per shard.

    -> (doc_id, shard, seq_in_shard, start_offset, n_tokens,
    spans_boundary): the doc's tokens occupy positions [start_offset,
    start_offset + n_tokens) of the shard's concatenated token stream;
    seq_in_shard = which capacity-window its FIRST token lands in;
    spans_boundary marks docs cut across two sequences. One exchange on
    shard; per-shard order (doc id asc) makes reruns byte-identical.
    """
    # shard_col follows the module's *_col convention (a column NAME);
    # a Column object is accepted too for derived shard expressions
    if shard_col is None:
        shard_expr = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards)).cast("int")
    elif isinstance(shard_col, str):
        shard_expr = F.col(shard_col)
    else:
        shard_expr = shard_col
    w = Window.partitionBy("shard").orderBy(id_col)
    cum = F.sum(token_col).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        docs.select(F.col(id_col), F.col(token_col), shard_expr.alias("shard"))
        .withColumn("start_offset", cum - F.col(token_col))
        .withColumn(
            "seq_in_shard", F.floor(F.col("start_offset") / capacity).cast("int")
        )
        .withColumn(
            "spans_boundary",
            F.floor((F.col("start_offset") + F.col(token_col) - 1) / capacity)
            > F.col("seq_in_shard"),
        )
    )


def texttile_boundaries(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_tokens: int = 10,
    depth_threshold: int = 4,
) -> DataFrame:
    """TextTiling-style topic segmentation (Hearst 1997, the
    bounded-lookback variant): split each document into fixed
    `block_tokens` pseudosentences, score every gap by the DISTINCT-token
    overlap of its two adjacent blocks, and flag gaps whose valley depth
    (how far cohesion drops vs both neighbors) reaches the threshold —
    topic boundaries for topic-aware chunking, complementing the
    heading-scoped section_chunks and the token-window chunk_documents.

    Deliberately RELATIONAL, not an in-row array pipeline: per-gap
    slice-intersections inside a transform() would make Catalyst
    re-inline the tokenization per gap (the O(len^2) pitfall documented
    at functions/text.py:_word_ngrams). Instead: ONE posexplode ->
    (doc, block, token) distinct -> self-join on (doc, token) with
    block+1 = adjacent-gap overlap counts (map-side partial agg) ->
    lag/lead depth on the per-doc gap window. All integers; trailing
    partial blocks are dropped (both engines agree on floor(n/w)).

    Output: (doc_id, gap, pos_tokens, sim, depth, is_boundary), gap g
    sits between blocks g-1 and g (1-based), pos_tokens = g*block_tokens.
    """
    from invoice_ocr_reconciler_spark.functions.text import tokens_col

    w = int(block_tokens)
    base = docs.select(
        F.col(id_col).alias("doc_id"), tokens_col(F.col(text_col)).alias("toks")
    ).select(
        "doc_id",
        (F.size("toks") / w).cast("int").alias("nb"),
        F.posexplode("toks").alias("pos", "tok"),
    )
    bt = (
        base.select(
            "doc_id",
            "nb",
            (F.col("pos") / w).cast("int").alias("blk"),
            "tok",
        )
        .where(F.col("blk") < F.col("nb"))
        .distinct()
    )
    sims = (
        bt.alias("l")
        .join(
            bt.alias("r"),
            (F.col("l.doc_id") == F.col("r.doc_id"))
            & (F.col("l.tok") == F.col("r.tok"))
            & (F.col("r.blk") == F.col("l.blk") + 1),
        )
        .groupBy(
            F.col("l.doc_id").alias("doc_id"),
            F.col("r.blk").alias("gap"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("sim"))
    )
    gaps = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            (F.size(tokens_col(F.col(text_col))) / w).cast("int").alias("nb"),
        )
        .where(F.col("nb") >= 2)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(1), F.col("nb") - 1)).alias("gap"),
        )
    )
    filled = gaps.join(sims, ["doc_id", "gap"], "left").select(
        "doc_id",
        "gap",
        F.coalesce("sim", F.lit(0).cast("long")).alias("sim"),
    )
    wg = Window.partitionBy("doc_id").orderBy("gap")
    left_n = F.coalesce(F.lag("sim").over(wg), F.col("sim"))
    right_n = F.coalesce(F.lead("sim").over(wg), F.col("sim"))
    depth = F.greatest(left_n - F.col("sim"), F.lit(0).cast("long")) + \
        F.greatest(right_n - F.col("sim"), F.lit(0).cast("long"))
    return filled.select(
        "doc_id",
        "gap",
        (F.col("gap") * w).cast("int").alias("pos_tokens"),
        "sim",
        depth.alias("depth"),
        (depth >= int(depth_threshold)).alias("is_boundary"),
    ).orderBy("doc_id", "gap")
