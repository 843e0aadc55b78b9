"""RAKE keyphrase extraction (Rose et al. 2010) — corpus-statistical
keyphrases without a model.

RAKE (Rapid Automatic Keyword Extraction) splits each document into
candidate phrases at stopwords and punctuation, scores every corpus
word by degree/frequency — deg(w) = total words of all phrases w occurs
in (co-occurrence evidence), freq(w) = occurrence count — and scores a
phrase as the sum of its words' scores. Long multi-word technical terms
win because their words co-occur in long candidates; scattered common
words lose. The natural companion to cluster_topics (c-TF-IDF labels
classes; RAKE labels individual documents) and the document-level
tagging stage of a training-data pipeline.

Exactness contract: word score = deg/freq is rational, so it is carried
as the exact BIGINT floor((deg * 1e9) / freq) — integer floor division,
identical in both engines (documented bound: deg * 1e9 < 2^63 holds to
~9.2e9 total word instances; shard the corpus or rescale past that).
Phrase scores are BIGINT sums of word scores (order-free); top-k ranks
break ties on the phrase string.

Distributed shape: one phrase explode, one word explode into a
vocabulary-bounded partial-agg groupBy, one vocabulary-sized join back,
one (doc, phrase) groupBy, one per-document rank window — the
tfidf_top_terms / cluster_topics plan family. No Python anywhere.

Reference scope: training-data extension (SURVEY.md §2.12); RAKE is
public knowledge (Rose, Engel, Cramer & Cowley 2010, "Automatic
keyword extraction from individual documents").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SCALE = 1_000_000_000

# a compact, fixed English stopword list (function words only — the
# oracle replays it literally, so it is part of the operator contract).
# Alternation is emitted longest-first so backtracking (Java regex) and
# leftmost-first (RE2) engines pick identical matches.
STOPWORDS: tuple[str, ...] = (
    "a", "about", "after", "all", "also", "an", "and", "any", "are",
    "as", "at", "be", "because", "been", "but", "by", "can", "could",
    "do", "for", "from", "had", "has", "have", "he", "her", "his",
    "how", "i", "if", "in", "into", "is", "it", "its", "may", "more",
    "most", "no", "not", "of", "on", "or", "our", "she", "should",
    "so", "some", "such", "than", "that", "the", "their", "then",
    "there", "these", "they", "this", "to", "was", "we", "were",
    "what", "when", "which", "who", "will", "with", "would", "you",
)

_SEP = "\x01"


def stopword_pattern(stopwords: tuple[str, ...] = STOPWORDS) -> str:
    """`\\b(...)\\b` alternation, longest-first then lexicographic —
    engine-order-independent matching (see module docstring)."""
    ordered = sorted(stopwords, key=lambda w: (-len(w), w))
    return r"\b(" + "|".join(ordered) + r")\b"


def candidate_phrases(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    stopwords: tuple[str, ...] = STOPWORDS,
    max_phrase_words: int = 4,
) -> DataFrame:
    """(id, phrase, n_words) — one row per candidate-phrase OCCURRENCE:
    lowercase, punctuation runs and stopwords become separators, the
    remaining maximal runs of content words are the candidates (RAKE's
    phrase delimiting), capped at max_phrase_words (the published
    practice: longer runs are delimiter artifacts, not terms)."""
    low = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    cut = F.regexp_replace(low, r"[^a-z0-9\s]+", _SEP)
    cut = F.regexp_replace(cut, stopword_pattern(stopwords), _SEP)
    segs = F.transform(
        F.split(cut, _SEP),
        lambda s: F.trim(F.regexp_replace(s, r"\s+", " ")),
    )
    phrases = F.filter(segs, lambda s: s != "")
    out = docs.select(
        F.col(id_col), F.explode(phrases).alias("phrase")
    ).select(
        id_col,
        "phrase",
        F.size(F.split(F.col("phrase"), " ")).cast("long").alias("n_words"),
    )
    return out.where(F.col("n_words") <= max_phrase_words)


def rake_keyphrases(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    stopwords: tuple[str, ...] = STOPWORDS,
    top_k: int = 5,
    max_phrase_words: int = 4,
) -> DataFrame:
    """Top-k RAKE keyphrases per document -> (id, phrase, n_words,
    n_occ, score_nanos, rank). Word deg/freq statistics pool over the
    WHOLE input corpus (the published single-document algorithm applied
    corpus-wide — shared vocabulary statistics sharpen scores exactly
    like cluster_topics' shared df), each distinct (doc, phrase) is
    scored once with its occurrence count published, and ranks order by
    (score desc, phrase) within a document."""
    inst = candidate_phrases(
        docs, text_col, id_col, stopwords, max_phrase_words
    )
    inst = inst.persist()
    words = inst.select(
        F.explode(F.split(F.col("phrase"), " ")).alias("word"),
        "n_words",
    )
    stats = words.groupBy("word").agg(
        F.count(F.lit(1)).cast("long").alias("freq"),
        F.sum("n_words").cast("long").alias("deg"),
    )
    word_score = stats.select(
        "word",
        F.expr(f"(deg * CAST({_SCALE} AS BIGINT)) DIV freq").alias(
            "word_score_nanos"
        ),
    )
    distinct = inst.groupBy(id_col, "phrase").agg(
        F.count(F.lit(1)).cast("long").alias("n_occ"),
        F.first("n_words").alias("n_words"),
    )
    pw = distinct.select(
        id_col,
        "phrase",
        "n_occ",
        "n_words",
        F.explode(F.split(F.col("phrase"), " ")).alias("word"),
    )
    scored = (
        pw.join(word_score, "word")
        .groupBy(id_col, "phrase")
        .agg(
            F.first("n_words").alias("n_words"),
            F.first("n_occ").alias("n_occ"),
            F.sum("word_score_nanos").cast("long").alias("score_nanos"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score_nanos").desc(), F.col("phrase").asc()
    )
    out = (
        scored.select(
            id_col,
            "phrase",
            "n_words",
            "n_occ",
            "score_nanos",
            F.row_number().over(w).cast("int").alias("rank"),
        )
        .where(F.col("rank") <= top_k)
        .orderBy(id_col, "rank")
    )
    return out
