"""Corpus TF-IDF and per-document top-k salient terms.

The classic two-aggregation shape: explode tokens -> per-(doc, term) counts
(one shuffle, map-side partial aggs) -> per-term document frequency (second
shuffle, vocabulary-sized output) -> join tf x idf -> per-doc top-k window.

Scale notes:
- The document-frequency table is vocabulary-sized — tiny next to the
  corpus — so `broadcast_vocab=True` (default) broadcasts it into the tf
  join: no shuffle of the big side on the skewed `term` key, which is the
  classic stopword hot-spot. Set it False for an unbounded vocabulary and
  let AQE pick (its skew-join split handles the hot terms).
- Scores are rounded (idf to 6 places, score to 4, tie-free floor rounding)
  BEFORE the top-k ordering so ranking is bit-identical across engines —
  ln() differs by <=1 ulp between libm implementations.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from invoice_ocr_reconciler_spark.functions.text import roundn as _roundn
from invoice_ocr_reconciler_spark.functions.text import tokens_col


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
    broadcast_vocab: bool = True,
) -> DataFrame:
    """-> (doc_id, term, tf, df, score, term_rank): the k highest tf*idf
    terms per document; idf = ln(n_docs / df); ties broken by term asc."""
    toks = F.filter(
        F.split(F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+"),
        lambda t: t != "",
    )
    terms = docs.select(F.col(id_col), F.explode(toks).alias("term"))
    tf = terms.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    # tf already has one row per (doc, term): df = plain count per term
    n_docs = docs.count()
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    if min_df > 1:
        dfreq = dfreq.filter(F.col("df") >= min_df)
    if broadcast_vocab:
        dfreq = F.broadcast(dfreq)
    idf = _roundn(F.log(F.lit(float(n_docs)) / F.col("df")), 6)
    scored = tf.join(dfreq, "term").withColumn(
        "score", _roundn(F.col("tf") * idf, 4)
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= k)
        .select(id_col, "term", "tf", "df", "score", "term_rank")
    )


def bm25_search(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents for a bag-of-terms query under BM25 (Robertson/
    Sparck Jones; the Lucene idf variant ln(1 + (N - df + .5)/(df + .5)),
    which never goes negative on stopword-frequent terms).

    -> (doc_id, n_matched, score, rank): rank 1..k by (score desc, id asc).

    Scale shape: the token array is filtered to the query vocabulary in
    codegen BEFORE the explode, so the (doc, term) stream entering the tf
    aggregation is query-sized, not corpus-token-sized — a 3-term query
    over 10^12 documents explodes only the matching occurrences. Doc
    length rides that same projection (one scan). Corpus scalars (N,
    avgdl over ALL documents, matched or not) come from one tiny agg
    broadcast back; per-term df is an agg over the matched pairs only.
    The final top-k is orderBy+limit — TakeOrderedAndProject, k rows to
    one reducer.

    Determinism contract: avgdl, idf, each term's contribution AND the
    summed score all ride the 1e-6 grid BEFORE ranking, so ordering is
    bit-identical across engines (ln differs by <= 1 ulp between libms).
    The score grid deliberately matches the contribution grid: a sum of
    1e-6 multiples re-rounded on a COARSER grid (say 1e-4) sits exactly
    on half-steps, where cross-engine fp noise flips the digit. Ties
    break by id.
    """
    q = sorted({t.lower() for t in query_terms})
    if not q:
        return docs.sparkSession.createDataFrame(
            [], f"{id_col} long, n_matched int, score double, rank int"
        )
    toks = F.filter(
        F.split(F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+"),
        lambda t: t != "",
    )
    qlit = F.array(*[F.lit(t) for t in q])
    base = docs.select(
        F.col(id_col),
        F.size(toks).alias("_dl"),
        F.filter(toks, lambda t: F.array_contains(qlit, t)).alias("_qtoks"),
    )
    scalars = F.broadcast(
        base.agg(
            F.count("*").alias("_n_docs"),
            _roundn(F.avg("_dl"), 6).alias("_avgdl"),
        )
    )
    matches = base.filter(F.size("_qtoks") > 0).select(
        F.col(id_col), "_dl", F.explode("_qtoks").alias("term")
    )
    tf = matches.groupBy(F.col(id_col), F.col("term")).agg(
        F.count("*").alias("_tf"), F.first("_dl").alias("_dl")
    )
    dfreq = F.broadcast(tf.groupBy("term").agg(F.count("*").alias("_df")))
    joined = tf.join(dfreq, "term").crossJoin(scalars)
    idf = _roundn(
        F.log(
            F.lit(1.0)
            + (F.col("_n_docs") - F.col("_df") + 0.5) / (F.col("_df") + 0.5)
        ),
        6,
    )
    denom = F.col("_tf") + k1 * (
        1.0 - b + b * F.col("_dl") / F.col("_avgdl")
    )
    contrib = _roundn(idf * F.col("_tf") * (k1 + 1.0) / denom, 6)
    scored = (
        joined.withColumn("_c", contrib)
        .groupBy(id_col)
        .agg(
            F.count("*").cast("int").alias("n_matched"),
            _roundn(F.sum("_c"), 6).alias("score"),
        )
    )
    w_top = scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(int(k))
    return w_top.select(
        id_col,
        "n_matched",
        "score",
        F.row_number()
        .over(
            Window.orderBy(F.col("score").desc(), F.col(id_col))
        )
        .alias("rank"),
    )


def inverted_index(
    docs: DataFrame,
    max_postings: int = 1000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Term -> (df, capped ascending posting list) — the batch build of a
    search index.

    Shape: explode -> per-(term, doc) distinct (map-side combine on the
    pair key) -> rank-cap WINDOW -> one grouped collect per term. The cap
    is applied BEFORE collect_list (row_number <= max_postings per term),
    so a stop-word never materializes its full posting array just to be
    sliced — the same bounded-degenerate-group discipline as the LSH pair
    generators. The true document frequency is carried through the same
    window partitioning (count over term), so df stays exact while the
    posting row is bounded. Window + groupBy share the term partitioning:
    one exchange for the whole cap+collect stage. Serialized comma-joined
    so the row is engine-portable and safely hashable.
    """
    from pyspark.sql import Window

    toks = F.filter(
        F.split(F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+"),
        lambda t: t != "",
    )
    pairs = (
        docs.select(F.col(id_col), F.explode(toks).alias("term")).distinct()
    )
    w = Window.partitionBy("term")
    ranked = pairs.select(
        "term",
        F.col(id_col),
        F.count("*").over(w).alias("df"),
        F.row_number().over(w.orderBy(id_col)).alias("_rn"),
    ).filter(F.col("_rn") <= max_postings)
    return ranked.groupBy("term").agg(
        F.first("df").alias("df"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.col(id_col))),
                lambda d: d.cast("string"),
            ),
            ",",
        ).alias("postings"),
    )


def collocations(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 3,
    k: int = 100,
) -> DataFrame:
    """Top-k adjacent-bigram collocations by PMI lift — the phrase-mining
    pass that seeds tokenizer vocabularies and multi-word expressions.

    lift(a,b) = P(ab) / (P(a)·P(b)) computed as the all-integer rational
    ``(c_ab · N_uni²) / (N_bi · c_a · c_b)`` — NO log() anywhere, because
    libm ln() differs across engines by a ulp while 64-bit integer
    products below 2^53 convert to double exactly; at true corpus scale
    (counts beyond 2^53) switch to log-space and accept grid rounding.

    Plan: one explode+groupBy for unigram counts, one for adjacent-bigram
    counts (both with map-side partials); the two corpus totals ride a
    broadcast crossJoin of 1-row aggregates; unigram counts join back to
    bigrams twice (vocabulary-sized side — broadcastable). Final global
    top-k is ONE sort of the ``c_ab >= min_count`` survivors on the
    deterministic (lift desc, bigram asc) total order.
    """
    from invoice_ocr_reconciler_spark.functions.text import tokens_col

    toks = docs.select(tokens_col(F.col(text_col)).alias("toks"))
    uni = toks.select(F.explode("toks").alias("tok"))
    uc = uni.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("c"))
    n_uni = uni.groupBy().agg(F.count(F.lit(1)).cast("long").alias("n_uni"))

    # two aligned slices zipped — not per-element element_at, which would
    # make Catalyst re-inline the whole tokenization per element
    m = F.greatest(F.size("toks") - 1, F.lit(0))
    head = F.slice(F.col("toks"), 1, m)
    nxt = F.slice(F.col("toks"), 2, m)
    bg = toks.select(
        F.explode(
            F.zip_with(
                head,
                nxt,
                lambda a, b: F.struct(a.alias("t1"), b.alias("t2")),
            )
        ).alias("b")
    ).select("b.t1", "b.t2")
    bc = bg.groupBy("t1", "t2").agg(
        F.count(F.lit(1)).cast("long").alias("c_ab")
    )
    n_bi = bg.groupBy().agg(F.count(F.lit(1)).cast("long").alias("n_bi"))

    ua = uc.select(F.col("tok").alias("t1"), F.col("c").alias("c_a"))
    ub = uc.select(F.col("tok").alias("t2"), F.col("c").alias("c_b"))
    out = (
        bc.where(F.col("c_ab") >= min_count)
        .join(F.broadcast(ua), "t1")
        .join(F.broadcast(ub), "t2")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_bi))
        .select(
            F.concat_ws(" ", "t1", "t2").alias("bigram"),
            "c_ab",
            "c_a",
            "c_b",
            _roundn(
                (F.col("c_ab") * F.col("n_uni") * F.col("n_uni"))
                / (F.col("n_bi") * F.col("c_a") * F.col("c_b")),
                6,
            ).alias("lift"),
        )
    )
    return out.orderBy(F.col("lift").desc(), F.col("bigram")).limit(k)


def rrf_fuse(
    rankings: dict[str, DataFrame],
    *,
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 20,
    c: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of named rankings —
    the standard hybrid-retrieval combiner (e.g. BM25 lexical + embedding
    ANN): score(d) = sum over rankings of 1/(c + rank_d), documents
    absent from a ranking contribute 0.

    Determinism contract: the per-ranking terms are combined in a FIXED
    left-to-right projection chain over full-outer-joined rank columns —
    NOT a groupBy sum, whose float addition order would depend on
    partitioning. The fused order is total ((score desc, id)) and the
    score rides the 1e-6 grid, so the cut is cross-engine stable.

    Scale: inputs are already top-k' rankings, so the fusion frame is
    bounded by sum of ranking sizes — the full-outer joins and the single
    global window are deliberate small-data operations at the END of two
    big retrieval pipelines, never over the corpus.
    """
    if not rankings:
        raise ValueError("rrf_fuse requires at least one ranking")
    names = list(rankings)
    out = None
    for name in names:
        # collapse duplicate ids to their BEST rank (a per-query top-k fed
        # in unfiltered would otherwise fan out the join and emit several
        # fused_rank rows for one document); min over ints is exact
        r = rankings[name].groupBy(id_col).agg(
            F.min(rank_col).alias(f"rank_{name}")
        )
        out = r if out is None else out.join(r, id_col, "full_outer")
    score = None
    for name in names:
        t = F.coalesce(
            F.lit(1.0) / (F.lit(c) + F.col(f"rank_{name}")), F.lit(0.0)
        )
        score = t if score is None else score + t
    w = Window.orderBy(F.col("rrf_score").desc(), F.col(id_col))
    return (
        out.select(
            id_col,
            *[f"rank_{n}" for n in names],
            _roundn(score, 6).alias("rrf_score"),
        )
        .withColumn("fused_rank", F.row_number().over(w))
        .where(F.col("fused_rank") <= k)
    )


def kwic_snippets(
    docs: DataFrame,
    query_terms: list[str],
    *,
    window_chars: int = 40,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keyword-in-context snippets — the search-result highlighter that
    pairs with bm25_search/rrf_fuse: for every document containing at
    least one query term, the FIRST matching term (in the caller's term
    order), its 1-based character position, and a +-window_chars context
    slice around the hit.

    Pure codegen: one ``locate`` per term + a coalesce chain picks the
    first present term, one ``substring`` cuts the window — a
    zero-exchange scan stage you append to a retrieval join, never a
    tokenization pass. Char-position semantics (both engines count
    codepoints; byte-offset highlighting belongs to the renderer).

    Case handling: positions come from the LOWERCASED text; the snippet
    is cut from the original text only when lowercasing is
    length-preserving (it almost always is), and from the lowercased
    text otherwise (e.g. U+0130 'İ' lowercases to TWO codepoints, which
    would shift every position) — so pos and snippet always align.
    """
    raw = F.coalesce(F.col(text_col), F.lit(""))
    low = F.lower(raw)
    pos_cols = [
        (t.lower(), F.locate(t.lower(), low)) for t in query_terms
    ]
    term = F.coalesce(
        *[F.when(p > 0, F.lit(t)) for t, p in pos_cols],
        F.lit(None).cast("string"),
    )
    pos = F.coalesce(
        *[F.when(p > 0, p) for _, p in pos_cols], F.lit(0)
    )
    start = F.greatest(pos - F.lit(window_chars), F.lit(1))
    length = (
        pos
        - start
        + F.length(term)
        + F.lit(window_chars)
    ).cast("int")
    snippet_src = F.when(F.length(low) == F.length(raw), raw).otherwise(low)
    return (
        docs.select(
            F.col(id_col),
            term.alias("term"),
            pos.cast("int").alias("pos"),
            snippet_src.substr(start.cast("int"), length).alias("snippet"),
        )
        .where(F.col("term").isNotNull())
    )


def percolate(
    docs: DataFrame,
    queries_df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    terms_col: str = "terms",
) -> DataFrame:
    """Percolation / standing-query matching: route each document to
    every registered boolean AND-query whose terms all appear in it —
    topic targeting, alert routing, corpus slicing by keyword recipes.

    -> (doc_id, query_id, n_terms) for each match.

    Plan (the inverted shape, NOT doc x query): distinct doc tokens are
    restricted in codegen to the union of all query vocabularies BEFORE
    exploding (query vocab broadcast as an array literal-sized set), the
    surviving (doc, term) stream joins the exploded query terms, and a
    (doc, query) count equal to the query's term count is the AND. Work
    scales with matching occurrences, not docs x queries — the crossJoin
    variant dies at 10^6 standing queries; this one shuffles only hits.
    """
    from invoice_ocr_reconciler_spark.functions.text import tokens_col

    qterms = queries_df.select(
        F.col(query_id_col),
        F.size(F.array_distinct(F.col(terms_col))).alias("_qn"),
        F.explode(F.array_distinct(F.col(terms_col))).alias("term"),
    )
    vocab = F.broadcast(qterms.select("term").distinct())
    toks = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(tokens_col(F.col(text_col)))).alias(
            "term"
        ),
    ).join(vocab, "term")
    return (
        toks.join(qterms, "term")
        .groupBy(id_col, query_id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("_hits"),
            F.first("_qn").alias("_qn"),
        )
        .where(F.col("_hits") == F.col("_qn"))
        .select(
            id_col, query_id_col, F.col("_qn").cast("int").alias("n_terms")
        )
    )


def bm25f_search(
    docs: DataFrame,
    query_terms: list[str],
    fields: dict[str, tuple[float, float]],
    k: int = 10,
    k1: float = 1.2,
    id_col: str = "doc_id",
) -> DataFrame:
    """Field-weighted BM25F (Robertson/Zaragoza's simple variant): per
    field f, a length-normalized weighted term frequency
    ``w_f * tf_f / ((1-b_f) + b_f * len_f/avglen_f)`` sums across fields
    into one pseudo-frequency, saturated ONCE by k1 — the principled way
    to boost title/anchor hits without the score-addition pathologies of
    running per-field BM25 and summing.

    ``fields`` maps a text COLUMN on ``docs`` to its (weight, b); idf is
    document-level (a doc matched in any field counts once toward df).

    Same scale shape and determinism contract as bm25_search: query-vocab
    filter before any explode (per field), per-field avgdl from one tiny
    agg broadcast back, every intermediate on the 1e-6 grid before
    ranking, ties by id.

    -> (doc_id, n_matched, score, rank), rank 1..k.
    """
    q = sorted({t.lower() for t in query_terms})
    if not q:
        return docs.sparkSession.createDataFrame(
            [], f"{id_col} long, n_matched int, score double, rank int"
        )
    from invoice_ocr_reconciler_spark.functions.text import tokens_col

    qlit = F.array(*[F.lit(t) for t in q])
    base = None
    for fname in fields:
        toks = tokens_col(F.col(fname))
        part = docs.select(
            F.col(id_col),
            F.lit(fname).alias("field"),
            F.size(toks).alias("dl"),
            F.filter(toks, lambda t: F.array_contains(qlit, t)).alias("qt"),
        )
        base = part if base is None else base.unionByName(part)
    avgdl = F.broadcast(
        base.groupBy("field").agg(_roundn(F.avg("dl"), 6).alias("avgdl"))
    )
    scalars = F.broadcast(docs.groupBy().agg(F.count("*").alias("n_docs")))

    m = base.filter(F.size("qt") > 0).select(
        F.col(id_col), "field", "dl", F.explode("qt").alias("term")
    )
    tf = m.groupBy(F.col(id_col), F.col("field"), F.col("term")).agg(
        F.count("*").alias("tf"), F.first("dl").alias("dl")
    )
    wcol = bcol = None
    for fname, (w, b) in fields.items():
        cond = F.col("field") == fname
        wcol = (
            F.when(cond, F.lit(w))
            if wcol is None
            else wcol.when(cond, F.lit(w))
        )
        bcol = (
            F.when(cond, F.lit(b))
            if bcol is None
            else bcol.when(cond, F.lit(b))
        )
    part = _roundn(
        wcol
        * F.col("tf")
        / ((F.lit(1.0) - bcol) + bcol * F.col("dl") / F.col("avgdl")),
        6,
    )
    tfw = (
        tf.join(avgdl, "field")
        .select(F.col(id_col), F.col("term"), part.alias("p"))
        .groupBy(id_col, "term")
        .agg(_roundn(F.sum("p"), 6).alias("tfw"))
    )
    dfq = F.broadcast(tfw.groupBy("term").agg(F.count("*").alias("df")))
    joined = tfw.join(dfq, "term").crossJoin(scalars)
    idf = _roundn(
        F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        ),
        6,
    )
    contrib = _roundn(idf * F.col("tfw") / (F.lit(k1) + F.col("tfw")), 6)
    scored = (
        joined.withColumn("_c", contrib)
        .groupBy(id_col)
        .agg(
            F.count("*").cast("int").alias("n_matched"),
            _roundn(F.sum("_c"), 6).alias("score"),
        )
    )
    top = scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(int(k))
    return top.select(
        id_col,
        "n_matched",
        "score",
        F.row_number()
        .over(Window.orderBy(F.col("score").desc(), F.col(id_col)))
        .alias("rank"),
    )


def phrase_search(
    docs: DataFrame,
    phrase_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact phrase match via positional postings -> (doc_id, n_matches,
    first_pos): documents containing the terms CONSECUTIVELY in order
    (token positions p, p+1, ..., p+n-1 under the shared tokens_col
    contract), with occurrence count and the first match position.

    This is the positional-index half of the IR stack bm25_search's
    bag-of-terms scoring cannot express ("merge stream" as a unit, not
    two independent terms) — the classic inverted-index-with-positions
    plan (Manning/IR ch.2), shaped for Spark:

      - positions are attached in ONE codegen projection
        (transform(tokens, (t, i) -> struct)) and the array is filtered
        to the PHRASE VOCABULARY before the explode — the (doc, term,
        pos) stream entering any shuffle is phrase-hit-sized, not
        corpus-token-sized (the bm25_search contract);
      - consecutiveness is n-1 EQUI-joins on the composite key (doc,
        normalized position): occurrence of term_k at pos q joins as
        (doc, q - k), so every join key is (id, p) — no theta join, no
        window; AQE broadcasts once the rarest term cuts the stream;
      - duplicate terms in the phrase are handled by construction (each
        offset joins its own filtered postings leg).

    Determinism: counts and integer positions only — nothing float.
    """
    terms = [t.lower() for t in phrase_terms]
    if not terms:
        raise ValueError("phrase_search needs at least one term")
    from invoice_ocr_reconciler_spark.functions.text import tokens_col

    qlit = F.array(*[F.lit(t) for t in sorted(set(terms))])
    tagged = F.filter(
        F.transform(
            tokens_col(F.col(text_col)),
            lambda t, i: F.struct(t.alias("term"), i.alias("pos")),
        ),
        lambda s: F.array_contains(qlit, s["term"]),
    )
    postings = (
        docs.select(F.col(id_col), F.explode(tagged).alias("s"))
        .select(F.col(id_col), F.col("s.term").alias("term"), F.col("s.pos").alias("pos"))
    )
    cur = postings.filter(F.col("term") == terms[0]).select(
        id_col, F.col("pos").alias("p")
    )
    for off, t in enumerate(terms[1:], start=1):
        leg = postings.filter(F.col("term") == t).select(
            id_col, (F.col("pos") - off).alias("p")
        )
        cur = cur.join(leg, [id_col, "p"])
    return cur.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_matches"),
        F.min("p").cast("int").alias("first_pos"),
    )


def prf_expand(
    docs: DataFrame,
    query_terms: list[str],
    fb_k: int = 10,
    n_expansion: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Pseudo-relevance-feedback query expansion (Rocchio/RM3 family) ->
    (term, fb_tf, fb_docs, df, score_ppm, exp_rank): the ``n_expansion``
    terms most characteristic of the bm25 top-``fb_k`` feedback set,
    excluding the original query terms. Feeding them back is just
    ``bm25_search(docs, query + expansion)`` — this operator produces
    the expansion table (and its oracle composes the bm25 oracle as a
    CTE, the rrf_fuse contract).

    Term weight stays integer-exact: score_ppm = floor(fb_tf * 1e6 /
    df) — feedback-set term frequency discounted by corpus document
    frequency (the tf-idf shape without ln(), so no libm crosses an
    engine boundary). Ties break (score_ppm desc, fb_tf desc, term).

    Plan: the feedback id set is fb_k rows — broadcast semi-join onto
    the corpus, explode ONLY those fb_k documents' tokens (feedback-
    sized, not corpus-sized), one partial-agg groupBy(term). Corpus df
    comes from the distinct (doc, term) agg — the tfidf_top_terms
    vocabulary pass — joined vocabulary-sized onto feedback terms.
    Final ranking is a window over <= |feedback vocabulary| rows.
    """
    q = sorted({t.lower() for t in query_terms})
    fb = bm25_search(
        docs, q, k=fb_k, text_col=text_col, id_col=id_col
    ).select(id_col)
    from invoice_ocr_reconciler_spark.functions.text import tokens_col

    fb_terms = (
        docs.join(F.broadcast(fb), id_col, "semi")
        .select(F.col(id_col), F.explode(tokens_col(F.col(text_col))).alias("term"))
    )
    fb_agg = fb_terms.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("fb_tf"),
        F.countDistinct(id_col).cast("bigint").alias("fb_docs"),
    )
    corpus_df = (
        docs.select(F.col(id_col), F.explode(tokens_col(F.col(text_col))).alias("term"))
        .distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    )
    qlit = F.array(*[F.lit(t) for t in q])
    scored = (
        fb_agg.filter(~F.array_contains(qlit, F.col("term")))
        .join(corpus_df, "term")
        .withColumn(
            "score_ppm",
            F.floor(F.col("fb_tf") * F.lit(1_000_000) / F.col("df")).cast(
                "bigint"
            ),
        )
    )
    w = Window.orderBy(
        F.col("score_ppm").desc(), F.col("fb_tf").desc(), F.col("term")
    )
    return (
        scored.withColumn("exp_rank", F.row_number().over(w))
        .filter(F.col("exp_rank") <= int(n_expansion))
        .select("term", "fb_tf", "fb_docs", "df", "score_ppm", "exp_rank")
    )


def cooccurrence(
    docs: DataFrame,
    window: int = 4,
    k: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 100_000,
) -> DataFrame:
    """Windowed token co-occurrence counts with harmonic distance
    weighting — the GloVe corpus statistic (Pennington, Socher & Manning,
    EMNLP 2014): every unordered token pair within ``window`` words
    accumulates weight 1/d for positional distance d. The embedding-
    training prep pass: this table IS GloVe's X matrix (and the PPMI
    matrix's numerator for SVD-style embeddings).

    Integer-exact cross-engine contract (the collocations precedent — no
    float accumulation): weights are scaled by lcm(1..window), so 1/d
    becomes the exact integer ``scale//d`` (window 4 -> 12/d in
    {12,6,4,3}); `weight_lcm` sums those. Callers wanting the real
    harmonic weight divide by `scale` at the end.

    Plan shape at corpus scale: pair generation is PURE CODEGEN — for
    each d the token array is zipped with its own d-shifted slice
    (zip_with of two slices, the functions/text.py n-gram trick: O(n)
    per doc, no per-element re-evaluation, no positional self-join and
    its doc_id-skewed shuffle). The only exchange carries one row per
    distinct pair per map partition (map-side partial aggs); hot
    stopword pairs are absorbed by the combiners, not a skewed join.
    Top-k ordering is (weight_lcm DESC, w1, w2) — a strict total order,
    deterministic under any partitioning.

    ``max_tokens`` caps the per-document token count BEFORE pair
    generation: the flattened pair array materializes window*n structs
    per row, so one pathological 10^7-token page would otherwise build
    a multi-GB single-row array inside the scan task. Gopher-length
    docs sit far below the default cap; set it above the corpus
    maximum when exact full-document counts matter.
    """
    scale = math.lcm(*range(1, int(window) + 1))
    toks_df = docs.select(
        F.col(id_col),
        F.slice(
            tokens_col(F.col(text_col)), 1, int(max_tokens)
        ).alias("toks"),
    )
    n = F.size("toks")
    pair_t = "array<struct<w1:string,w2:string,wt:int>>"

    def _pair_fn(wt: int):
        # closure (not a default arg — pyspark binds lambda arity by
        # signature, so a `_w=wt` third parameter breaks zip_with)
        return lambda a, b: F.struct(
            F.least(a, b).alias("w1"),
            F.greatest(a, b).alias("w2"),
            F.lit(wt).alias("wt"),
        )

    arrs = []
    for d in range(1, int(window) + 1):
        arrs.append(
            F.when(
                n > d,
                F.zip_with(
                    F.slice("toks", 1, n - F.lit(d)),
                    F.slice("toks", F.lit(d + 1), n - F.lit(d)),
                    _pair_fn(scale // d),
                ),
            ).otherwise(F.expr(f"CAST(array() AS {pair_t})"))
        )
    pairs = toks_df.select(
        F.explode(F.flatten(F.array(*arrs))).alias("p")
    ).select("p.w1", "p.w2", "p.wt")
    out = pairs.groupBy("w1", "w2").agg(
        F.sum("wt").cast("bigint").alias("weight_lcm"),
        F.count("*").cast("bigint").alias("n_pairs"),
    )
    return out.orderBy(F.col("weight_lcm").desc(), "w1", "w2").limit(int(k))


def class_tfidf_topics(
    docs: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 5,
    min_class_tf: int = 3,
) -> DataFrame:
    """Class-based TF-IDF topic labels (the BERTopic c-TF-IDF idea:
    treat each class/cluster as one meta-document, surface the terms
    frequent IN the class but rare ACROSS the corpus). Used to label
    k-means / community clusters and per-language slices with
    human-readable topic terms.

    Scoring is the repo's integer-exact lift variant (the collocations
    no-log contract): ``score_scaled = floor(tf_class * 1e6 / df_docs)``
    with tf_class the term's count inside the class and df_docs its
    corpus-wide document frequency — monotone in tf for fixed df and in
    1/df for fixed tf, i.e. the same ordering family as c-TF-IDF's
    tf * log-damped idf, but bigint-exact in both engines (no log, no
    rounding grid). BERTopic's exact log damping is a one-line swap
    where cross-engine hashing is not needed.

    Output: (group, term, tf_class, df_docs, score_scaled, rnk) — the
    top_k terms per group by (score desc, tf desc, term asc);
    `min_class_tf` cuts one-off noise terms before ranking.

    Shape at scale: ONE explode of the tokenized corpus feeding two
    partial-agg trees — (group, term) counts and distinct-(doc, term)
    document frequency — then a vocabulary-sized join (broadcast the df
    side) and a per-group top-k window over the (group, term) table,
    which is already collapsed far below corpus size.
    """
    from invoice_ocr_reconciler_spark.functions.text import tokens_col

    g = F.coalesce(F.col(group_col).cast("string"), F.lit("und"))
    toked = docs.select(
        F.col(id_col).alias("_doc"),
        g.alias("grp"),
        tokens_col(F.col(text_col)).alias("toks"),
    )
    terms = toked.select(
        "_doc", "grp", F.explode("toks").alias("term")
    )
    tf_class = terms.groupBy("grp", "term").agg(
        F.count("*").alias("tf_class")
    )
    df_docs = (
        terms.select("_doc", "term")
        .distinct()
        .groupBy("term")
        .agg(F.count("*").alias("df_docs"))
    )
    scored = (
        tf_class.where(F.col("tf_class") >= int(min_class_tf))
        .join(F.broadcast(df_docs), "term")
        .withColumn(
            "score_scaled",
            # integral `div` keeps the claimed bigint exactness — a double
            # product tf*1e6 would lose low bits past 2^53 at corpus scale
            F.expr("(tf_class * 1000000L) div df_docs"),
        )
    )
    w = Window.partitionBy("grp").orderBy(
        F.col("score_scaled").desc(), F.col("tf_class").desc(), F.col("term")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= int(top_k))
        .select(
            F.col("grp").alias("group"),
            "term",
            "tf_class",
            "df_docs",
            "score_scaled",
            "rnk",
        )
        .orderBy("group", "rnk")
    )
