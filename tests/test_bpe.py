"""BPE vocabulary induction (operators/bpe.py) vs a pure-Python reference.

The distributed implementation must reproduce, exactly, the sequential
algorithm it distributes: same merge table (order, pairs, counts) as a
driver-side reference BPE over the same word frequencies, at any
parallelism.
"""

from __future__ import annotations

import pytest

from invoice_ocr_reconciler_spark.operators.bpe import (
    END_MARK,
    bpe_learn,
    word_frequencies,
)


def _ref_bpe(words: dict[str, int], n_merges: int, min_pair_count: int = 2):
    """Sequential reference: Sennrich-style merges over word frequencies;
    ties break by (left, right) ascending; leftmost-first application."""
    vocab = [(list(w) + [END_MARK], n) for w, n in words.items()]
    merges = []
    for rank in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for syms, n in vocab:
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + n
        if not counts:
            break
        (left, right), pc = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if pc < min_pair_count:
            break
        merges.append((rank, left, right, pc))
        new_vocab = []
        for syms, n in vocab:
            out: list[str] = []
            for t in syms:
                if out and out[-1] == left and t == right:
                    out[-1] = left + right
                else:
                    out.append(t)
            new_vocab.append((out, n))
        vocab = new_vocab
    return merges


CORPUS = [
    "low low low low low",
    "lower lower newer newer newer newer",
    "newest newest newest wider wider",
    "low lower newest",
]


def _words(corpus):
    out: dict[str, int] = {}
    for line in corpus:
        for w in line.lower().split():
            out[w] = out.get(w, 0) + 1
    return out


def test_bpe_matches_reference(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )
    got = [
        (r["merge_rank"], r["left"], r["right"], r["pair_count"])
        for r in bpe_learn(docs, n_merges=12, vocab_cap=100)
        .orderBy("merge_rank")
        .collect()
    ]
    assert got == _ref_bpe(_words(CORPUS), 12)
    assert len(got) > 3  # the corpus supports several merges


def test_bpe_parallelism_invariant(spark):
    rows = [(i, CORPUS[i % len(CORPUS)]) for i in range(40)]
    one = spark.createDataFrame(rows, "doc_id long, text string").coalesce(1)
    many = spark.createDataFrame(rows, "doc_id long, text string").repartition(8)
    a = bpe_learn(one, n_merges=6, vocab_cap=100).orderBy("merge_rank").collect()
    b = bpe_learn(many, n_merges=6, vocab_cap=100).orderBy("merge_rank").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_bpe_min_pair_count_stops_early(spark):
    # every word unique, every char pair appears once -> no merge at min 2
    docs = spark.createDataFrame(
        [(0, "ab cd ef")], "doc_id long, text string"
    )
    assert bpe_learn(docs, n_merges=5, min_pair_count=2).count() == 0
    # min 1 merges something
    assert bpe_learn(docs, n_merges=5, min_pair_count=1).count() > 0


def test_bpe_empty_and_null(spark):
    docs = spark.createDataFrame([], "doc_id long, text string")
    out = bpe_learn(docs, n_merges=3)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "merge_rank", "left", "right", "pair_count",
    ]
    docs2 = spark.createDataFrame([(0, None), (1, "  ")], "doc_id long, text string")
    assert bpe_learn(docs2, n_merges=3).count() == 0


def test_word_frequencies(spark):
    docs = spark.createDataFrame(
        [(0, "A a  b"), (1, "b C")], "doc_id long, text string"
    )
    got = {r["word"]: r["n"] for r in word_frequencies(docs).collect()}
    assert got == {"a": 2, "b": 2, "c": 1}


def test_bpe_vocab_cap_is_deterministic(spark):
    # cap keeps the most frequent types; merges then reflect only those
    rows = [(i, "aaaa bbbb") for i in range(10)] + [(100, "zzzz")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = bpe_learn(docs, n_merges=4, vocab_cap=2).collect()
    syms = {(r["left"], r["right"]) for r in got}
    assert all("z" not in a + b for a, b in syms)


# -------------------------------------------------------- vocab coverage


def test_vocab_coverage_counts_and_zero_token_docs(spark):
    from invoice_ocr_reconciler_spark.operators.bpe import vocab_coverage

    docs = spark.createDataFrame(
        [
            (0, "the cat sat on the mat"),
            (1, "ZEBRA the Quux"),
            (2, "   "),
            (3, None),
        ],
        "doc_id long, text string",
    )
    vocab = spark.createDataFrame(
        [("the",), ("cat",), ("sat",), ("on",), ("mat",), ("the",)],
        "token string",
    )
    rows = {r["doc_id"]: r for r in vocab_coverage(docs, vocab).collect()}
    assert (rows[0]["n_tokens"], rows[0]["n_oov"]) == (6, 0)
    assert rows[0]["oov_rate"] == 0.0
    # tokenization lowercases: 'ZEBRA'->zebra (oov), 'the' in-vocab,
    # 'Quux'->quux (oov)
    assert (rows[1]["n_tokens"], rows[1]["n_oov"]) == (3, 2)
    assert rows[1]["oov_rate"] == 0.666667
    # blank and NULL docs survive with zero counts, rate 0.0
    for d in (2, 3):
        assert (rows[d]["n_tokens"], rows[d]["n_oov"], rows[d]["oov_rate"]) == (
            0,
            0,
            0.0,
        )


def test_oov_top_terms_rank_and_ties(spark):
    from invoice_ocr_reconciler_spark.operators.bpe import oov_top_terms

    docs = spark.createDataFrame(
        [
            (0, "aa bb bb cc"),
            (1, "bb cc zz"),
            (2, "aa aa aa keep"),
        ],
        "doc_id long, text string",
    )
    vocab = spark.createDataFrame([("keep",)], "token string")
    rows = oov_top_terms(docs, vocab, k=2).orderBy("oov_rank").collect()
    # aa x4 (docs 0,2) beats bb x3 (docs 0,1); cc x2 cut by k=2
    assert [(r["token"], r["n_occurrences"], r["n_docs"], r["oov_rank"]) for r in rows] == [
        ("aa", 4, 2, 1),
        ("bb", 3, 2, 2),
    ]
