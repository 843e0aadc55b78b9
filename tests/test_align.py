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


class TestMarginMine:
    @pytest.fixture(scope="class")
    def sides(self, spark):
        # planted translations: b-vectors are near-copies of their a
        # partner; one hub b-vector is mildly close to EVERYTHING
        import numpy as np

        rng = np.random.default_rng(11)
        base = rng.standard_normal((6, 8))
        base /= np.linalg.norm(base, axis=1, keepdims=True)
        a = spark.createDataFrame(
            [(i, [float(x) for x in base[i]]) for i in range(6)],
            "id_a int, embedding array<double>",
        )
        b_rows = []
        for i in range(6):
            v = base[i] + 0.05 * rng.standard_normal(8)
            b_rows.append((i + 100, [float(x) for x in v]))
        hub = base.mean(axis=0)  # cosine-close to everything
        b_rows.append((999, [float(x) for x in hub]))
        b = spark.createDataFrame(b_rows, "id_b int, embedding array<double>")
        return a, b

    def test_true_pairs_top_margin_and_mutual(self, spark, sides):
        from invoice_ocr_reconciler_spark.operators.bitext import margin_mine

        a, b = sides
        out = margin_mine(a, b, k=3).collect()
        best = {}
        for r in out:
            if r.id_a not in best or r.margin > best[r.id_a].margin:
                best[r.id_a] = r
        # every a-vector's best-margin partner is its planted translation
        assert all(best[i].id_b == i + 100 for i in range(6))
        assert all(best[i].mutual_nn for i in range(6))

    def test_hub_discounted(self, spark, sides):
        from invoice_ocr_reconciler_spark.operators.bitext import margin_mine

        a, b = sides
        out = margin_mine(a, b, k=3)
        hub = out.filter(F.col("id_b") == 999).collect()
        true = out.filter(F.col("id_b") != 999).filter(
            F.col("id_b") == F.col("id_a") + 100
        ).collect()
        if hub:  # hub may not even make top-k everywhere
            assert max(r.margin for r in hub) < min(r.margin for r in true)

    def test_from_scored_matches_cross_product(self, spark, sides):
        """Feeding the exact brute-force pair set reproduces margin_mine
        bit-for-bit — the LSH/IVF candidate path's correctness anchor."""
        from invoice_ocr_reconciler_spark.operators.bitext import (
            margin_from_scored,
            margin_mine,
        )
        from invoice_ocr_reconciler_spark.operators.similarity import cosine_sim

        a, b = sides
        scored = (
            a.select(F.col("id_a"), F.col("embedding").alias("_va"))
            .crossJoin(b.select(F.col("id_b"), F.col("embedding").alias("_vb")))
            .select(
                "id_a",
                "id_b",
                F.round(cosine_sim(F.col("_va"), F.col("_vb")), 6).alias("cosine"),
            )
        )
        key = ["id_a", "id_b"]
        assert [
            r.asDict()
            for r in margin_from_scored(scored, k=3).orderBy(*key).collect()
        ] == [r.asDict() for r in margin_mine(a, b, k=3).orderBy(*key).collect()]

    def test_from_scored_candidate_subset(self, spark, sides):
        """A retrieval-truncated candidate set still ranks each planted
        translation first within its neighborhood."""
        from invoice_ocr_reconciler_spark.operators.bitext import (
            margin_from_scored,
            margin_mine,
        )
        from invoice_ocr_reconciler_spark.operators.similarity import cosine_sim

        a, b = sides
        scored = (
            a.select(F.col("id_a"), F.col("embedding").alias("_va"))
            .crossJoin(b.select(F.col("id_b"), F.col("embedding").alias("_vb")))
            .select(
                "id_a",
                "id_b",
                F.round(cosine_sim(F.col("_va"), F.col("_vb")), 6).alias("cosine"),
            )
            .filter(F.col("cosine") > 0)  # retrieval keeps plausible pairs only
        )
        out = margin_from_scored(scored, k=3).collect()
        best = {}
        for r in out:
            if r.id_a not in best or r.margin > best[r.id_a].margin:
                best[r.id_a] = r
        assert all(best[i].id_b == i + 100 for i in best)

    def test_min_margin_cut_and_partition_invariance(self, spark, sides):
        from invoice_ocr_reconciler_spark.operators.bitext import margin_mine

        a, b = sides
        cut = margin_mine(a, b, k=3, min_margin=1.0)
        assert cut.filter(F.col("margin") < 1.0).count() == 0
        key = ["id_a", "id_b"]
        one = margin_mine(a.coalesce(1), b.coalesce(1), k=3).orderBy(*key).collect()
        many = (
            margin_mine(a.repartition(7), b.repartition(5), k=3)
            .orderBy(*key)
            .collect()
        )
        assert [r.asDict() for r in one] == [r.asDict() for r in many]


def test_align_oracle_generates_and_degrades_to_rows_only(monkeypatch):
    """_align_sentences_oracle embeds the finite (la, lb) -> cost table
    (computed by the operator's own _match_cost) and returns '' when the
    sf dir is unreadable -- the rows-only fallback, never a crash."""
    import __spark_entry__ as entry

    sql = entry._align_sentences_oracle()
    assert "mcost(mla, mlb, mc)" in sql
    # the (0, 0) -> 0 row must exist: 1-0/0-1 beads probe empty spans
    assert "(0,0,0)" in sql.replace(" ", "")
    # backtrace depth covers the longest possible bead chain (3 + 3 sides)
    assert "info5" in sql and "bt6" in sql
    monkeypatch.setenv("SPARK_GRAFT_ORACLE_SF_DIR", "/nonexistent")
    assert entry._align_sentences_oracle() == ""
