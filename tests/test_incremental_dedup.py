"""Tests for incremental MinHash dedup of a new batch against a stored
signature index (operators/dedup.py:minhash_incremental)."""

import pytest
from pyspark.sql import functions as F

BASE = ("the quick brown fox jumps over the lazy dog again and again "
        "while the crawler collects pages from the open web every day")
OTHER = ("completely different content about distributed query engines "
         "columnar storage partition pruning and adaptive execution plans")
THIRD = ("a third unrelated passage mentioning embeddings tokenizers "
         "sequence packing and deterministic sampling for corpus builds")


@pytest.fixture(scope="module")
def setup(spark):
    from invoice_ocr_reconciler_spark.operators.dedup import minhash_signatures

    corpus = spark.createDataFrame(
        [(0, BASE), (1, OTHER)], "doc_id long, text string"
    )
    index_sig = minhash_signatures(corpus).persist()
    index_sig.count()
    batch = spark.createDataFrame(
        [
            (100, BASE),    # duplicate of index doc 0
            (101, THIRD),   # new content, duplicated inside the batch...
            (102, THIRD),   # ...by this one
            (103, "entirely novel text with words appearing nowhere else "
                  "in any fixture of this test module whatsoever"),
            (104, OTHER),   # duplicate of index doc 1
            (105, OTHER),   # batch-internal dup of 104 AND index dup -> anchored
        ],
        "doc_id long, text string",
    )
    return index_sig, batch


def test_index_matches_found_without_corpus_text(setup):
    from invoice_ocr_reconciler_spark.operators.dedup import minhash_incremental

    index_sig, batch = setup
    out = minhash_incremental(batch, index_sig)
    pairs = {(r["doc_id"], r["index_id"]) for r in out["index_pairs"].collect()}
    assert (100, 0) in pairs
    assert (104, 1) in pairs and (105, 1) in pairs
    assert all(d != 101 and d != 102 and d != 103 for d, _ in pairs)


def test_verdicts(setup):
    from invoice_ocr_reconciler_spark.operators.dedup import minhash_incremental

    index_sig, batch = setup
    out = minhash_incremental(batch, index_sig)
    v = {r["doc_id"]: r.asDict() for r in out["verdicts"].collect()}
    assert len(v) == 6  # one verdict per batch doc
    # index duplicates dropped
    assert v[100]["dup_of_index"] and not v[100]["is_kept"]
    assert v[104]["dup_of_index"] and not v[104]["is_kept"]
    # batch-internal dup group with no index anchor: min id survives
    assert not v[101]["dup_of_index"] and v[101]["is_kept"]
    assert not v[102]["dup_of_index"] and not v[102]["is_kept"]
    # novel doc kept
    assert v[103]["is_kept"] and not v[103]["in_anchored_cluster"]
    # 105 is in 104's cluster and 104 matches the index -> anchored, dropped
    # (105 also matches the index directly here; the anchor flag is what
    # would drop an unmatched tail member of the same cluster)
    assert v[105]["in_anchored_cluster"] and not v[105]["is_kept"]


def test_signatures_appendable_kept_only(setup):
    from invoice_ocr_reconciler_spark.operators.dedup import minhash_incremental

    index_sig, batch = setup
    out = minhash_incremental(batch, index_sig)
    assert out["signatures"].schema == index_sig.schema
    # only KEPT docs' signatures append (101, 103): dropped duplicates must
    # not grow hot buckets toward the cap run over run
    assert {r["doc_id"] for r in out["signatures"].collect()} == {101, 103}
    grown = index_sig.unionByName(out["signatures"])
    assert grown.count() == 4


def test_two_run_equivalence_with_batch_recompute(setup, spark):
    """Appending run-1 signatures and deduping a later batch against the
    grown index flags a duplicate of run-1 content — the whole point of
    keeping the index."""
    from invoice_ocr_reconciler_spark.operators.dedup import minhash_incremental

    index_sig, batch = setup
    grown = index_sig.unionByName(
        minhash_incremental(batch, index_sig)["signatures"]
    )
    batch2 = spark.createDataFrame(
        [(200, THIRD)], "doc_id long, text string"
    )
    out2 = minhash_incremental(batch2, grown)
    pairs = {(r["doc_id"], r["index_id"]) for r in out2["index_pairs"].collect()}
    # 101 was kept (and indexed); 102 was dropped and must NOT be indexed
    assert (200, 101) in pairs and (200, 102) not in pairs
    v = {r["doc_id"]: r.asDict() for r in out2["verdicts"].collect()}
    assert not v[200]["is_kept"]


def test_empty_index_and_empty_batch(setup, spark):
    from invoice_ocr_reconciler_spark.operators.dedup import (
        minhash_incremental,
        minhash_signatures,
    )

    index_sig, batch = setup
    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    empty_sig = minhash_signatures(empty_docs)
    # empty index: batch-internal semantics only
    out = minhash_incremental(batch, empty_sig)
    assert out["index_pairs"].count() == 0
    v = {r["doc_id"]: r.asDict() for r in out["verdicts"].collect()}
    assert v[100]["is_kept"]  # nothing in the index to match now
    assert v[104]["is_kept"] and not v[105]["is_kept"]  # min-id rule
    # empty batch: no verdicts, no pairs
    out2 = minhash_incremental(empty_docs, index_sig)
    assert out2["verdicts"].count() == 0
    assert out2["new_pairs"].count() == 0
