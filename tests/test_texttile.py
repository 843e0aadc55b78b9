"""TextTiling topic boundaries (operators/chunking.py:texttile_boundaries)."""

from invoice_ocr_reconciler_spark.operators.chunking import (
    texttile_boundaries,
)


def _run(spark, texts, **kw):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return texttile_boundaries(docs, **kw).collect()


def test_topic_shift_is_deepest_gap(spark):
    # two clearly distinct topics, 20 tokens each with w=5 -> the gap at
    # the topic border scores 0 overlap while within-topic gaps overlap
    topic_a = "cat dog cow pig hen " * 4
    topic_b = "sql join scan sort agg " * 4
    out = _run(
        spark, [topic_a + topic_b], block_tokens=5, depth_threshold=4
    )
    by_gap = {r.gap: r for r in out}
    assert len(by_gap) == 7  # 40 tokens / 5 - 1
    border = by_gap[4]  # between blocks 3 and 4 = token 20
    assert border.sim == 0 and border.is_boundary
    assert by_gap[1].sim == 5  # identical repeated blocks
    assert not by_gap[1].is_boundary


def test_short_docs_emit_no_gaps(spark):
    out = _run(spark, ["one two three"], block_tokens=5)
    assert out == []


def test_partial_trailing_block_dropped(spark):
    # 12 tokens, w=5 -> 2 full blocks, 1 gap; trailing 2 tokens ignored
    text = "a b c d e a b c d e x y"
    out = _run(spark, [text], block_tokens=5, depth_threshold=1)
    assert len(out) == 1
    assert out[0].sim == 5 and out[0].pos_tokens == 5


def test_duplicate_tokens_count_once(spark):
    # block1 = 'z z z z z', block2 = 'z q q q q' -> distinct overlap 1
    out = _run(spark, ["z z z z z z q q q q"], block_tokens=5)
    assert out[0].sim == 1
