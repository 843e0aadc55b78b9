"""Gale-Church sentence alignment (operators/align.py).

The DP is not SQL-expressible, so these goldens are the correctness pin
(same contract as BPE/MinHash): hand-checked alignments on planted
structures — proportional 1-1 chains, insertions (0-1), deletions (1-0),
2-1 merges — plus the max_sents guard and partition invariance.
"""

import pytest
from pyspark.sql import functions as F

from invoice_ocr_reconciler_spark.operators.align import (
    align_sentences,
    gale_church_align,
)


def _beads(lens_a, lens_b):
    return [(a, b, c, d) for a, b, c, d, _ in gale_church_align(lens_a, lens_b)]


class TestDP:
    def test_proportional_chain_is_all_one_one(self):
        # equal-length sides: three clean 1-1 beads
        assert _beads([40, 60, 80], [41, 58, 83]) == [
            (0, 1, 0, 1),
            (1, 2, 1, 2),
            (2, 3, 2, 3),
        ]

    def test_unmatched_extra_absorbed_into_merge(self):
        # canonical GC: an orphan's own tail delta always exceeds the
        # delta of merging it into a neighbour, so the extra a-sentence
        # rides a 2-1 bead (never a 1-0 mid-sequence)
        assert _beads([50, 47, 52], [51, 53]) == [(0, 1, 0, 1), (1, 3, 1, 2)]
        # symmetric: extra b-sentence rides a 1-2 bead
        assert _beads([51, 53], [50, 47, 52]) == [(0, 1, 0, 1), (1, 2, 1, 3)]

    def test_deep_tail_ordering_not_flattened(self):
        # erfc keeps big mismatches ordered (no saturation plateau)
        c1 = gale_church_align([50], [2000])[0][4]
        c2 = gale_church_align([50], [6000])[0][4]
        assert c2 > c1

    def test_two_one_merge(self):
        # a[1]+a[2] together match b[1]; a 2-1 bead beats two bad 1-1s
        beads = _beads([60, 25, 30, 70], [61, 57, 69])
        assert (1, 3, 1, 2) in beads

    def test_empty_sides(self):
        assert gale_church_align([], []) == []
        assert _beads([30], []) == [(0, 1, 0, 0)]
        assert _beads([], [30]) == [(0, 0, 0, 1)]

    def test_costs_monotone_in_mismatch(self):
        # a wildly mismatched 1-1 costs more than a proportional one
        good = gale_church_align([50], [51])[0][4]
        bad = gale_church_align([50], [400])[0][4]
        assert bad > good


@pytest.fixture(scope="module")
def pair_frames(spark):
    # sentence splitter boundary: terminal punct + space + capital
    docs = spark.createDataFrame(
        [
            (
                "u/en",
                "Alpha alpha alpha alpha. Beta beta beta beta beta. Gamma gamma.",
            ),
            (
                "u/fr",
                "Alphe alphe alphe alphes. Bete bete bete bete betes. Gamme gamme.",
            ),
            ("v/en", "Solo solo solo."),
            ("v/de", "Einz einz einz einz."),
        ],
        "url string, text string",
    )
    pairs = spark.createDataFrame(
        [("u/en", "u/fr"), ("v/en", "v/de")], "url_a string, url_b string"
    )
    return pairs, docs


class TestOperator:
    def test_beads_and_texts(self, spark, pair_frames):
        pairs, docs = pair_frames
        out = align_sentences(pairs, docs).orderBy("url_a", "bead").collect()
        u = [r for r in out if r.url_a == "u/en"]
        assert len(u) == 3 and [r.bead for r in u] == [0, 1, 2]
        assert u[0].text_a == "Alpha alpha alpha alpha."
        assert u[0].text_b == "Alphe alphe alphe alphes."
        assert u[2].text_a == "Gamma gamma." and u[2].text_b == "Gamme gamme."
        v = [r for r in out if r.url_a == "v/en"]
        assert len(v) == 1 and v[0].a_hi - v[0].a_lo == 1
        assert all(not r.truncated for r in out)

    def test_max_sents_guard_truncates_and_flags(self, spark):
        long_text = " ".join(f"Sent number {i} here." for i in range(20))
        docs = spark.createDataFrame(
            [("a", long_text), ("b", long_text)], "url string, text string"
        )
        pairs = spark.createDataFrame([("a", "b")], "url_a string, url_b string")
        out = align_sentences(pairs, docs, max_sents=5).collect()
        assert all(r.truncated for r in out)
        assert max(r.a_hi for r in out) <= 5 and max(r.b_hi for r in out) <= 5

    def test_partition_invariance(self, spark, pair_frames):
        pairs, docs = pair_frames
        one = align_sentences(pairs.coalesce(1), docs.coalesce(1))
        many = align_sentences(pairs.repartition(7), docs.repartition(5))
        key = ["url_a", "bead"]
        assert [r.asDict() for r in one.orderBy(*key).collect()] == [
            r.asDict() for r in many.orderBy(*key).collect()
        ]
