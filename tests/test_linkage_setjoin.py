"""Tests for the record-linkage band (operators/linkage.py), the
k-anonymity release gate (operators/profile.py:k_anonymize_agg), and the
prefix-filtered exact set-similarity join (operators/setjoin.py)."""

import random

from pyspark.sql import functions as F

from invoice_ocr_reconciler_spark.operators.linkage import (
    FieldSpec,
    blocking_metrics,
    fs_linkage,
)
from invoice_ocr_reconciler_spark.operators.profile import k_anonymize_agg
from invoice_ocr_reconciler_spark.operators.setjoin import (
    prefix_filtered_jaccard_join,
)

FIELDS = [
    FieldSpec("name", 0.9, 0.01),
    FieldSpec("city", 0.8, 0.1),
]
W_NAME_A, W_NAME_D = FIELDS[0].w_agree, FIELDS[0].w_disagree
W_CITY_A, W_CITY_D = FIELDS[1].w_agree, FIELDS[1].w_disagree


def _ab(spark, rows_a, rows_b):
    a = spark.createDataFrame(rows_a, "id_a int, block int, a_name string, a_city string")
    b = spark.createDataFrame(rows_b, "id_b int, block int, b_name string, b_city string")
    return a, b


class TestFsLinkage:
    def test_decisions_and_weights(self, spark):
        a, b = _ab(
            spark,
            [(1, 0, "ann", "rome"), (2, 0, "bob", "kiev"), (3, 1, "cyd", "oslo")],
            [(10, 0, "ann", "rome"), (20, 0, "zed", "lima"), (30, 1, "cyd", None)],
        )
        out = fs_linkage(
            a, b, fields=FIELDS, lower=0.0, upper=7.0, keep_non_matches=True
        )
        got = {(r.id_a, r.id_b): (r.score, r.decision) for r in out.collect()}
        # block 0: 2x2 pairs; block 1: 1x1
        assert len(got) == 5
        full_agree = W_NAME_A + W_CITY_A
        assert abs(got[(1, 10)][0] - full_agree) < 1e-5
        assert got[(1, 10)][1] == "match"
        # all-disagree pair
        assert abs(got[(2, 20)][0] - (W_NAME_D + W_CITY_D)) < 1e-5
        assert got[(2, 20)][1] == "non_match"
        # NULL city contributes exactly 0 — name agreement only
        assert abs(got[(3, 30)][0] - W_NAME_A) < 1e-5
        assert got[(3, 30)][1] == "possible"

    def test_non_matches_dropped_by_default(self, spark):
        a, b = _ab(spark, [(1, 0, "ann", "rome")], [(20, 0, "zed", "lima")])
        out = fs_linkage(a, b, fields=FIELDS, lower=0.0, upper=7.0)
        assert out.count() == 0

    def test_blocking_prevents_cross_block_pairs(self, spark):
        a, b = _ab(spark, [(1, 0, "ann", "rome")], [(10, 1, "ann", "rome")])
        out = fs_linkage(
            a, b, fields=FIELDS, lower=-99.0, upper=6.0, keep_non_matches=True
        )
        assert out.count() == 0


class TestBlockingMetrics:
    def test_hand_computed(self, spark):
        records = spark.createDataFrame(
            [
                (1, "a", "x"), (2, "a", "x"), (3, "a", "y"),
                (1, "b", "x"), (2, "b", "y"), (3, "b", "y"),
            ],
            "rec_id int, side string, key string",
        )
        truth = spark.createDataFrame(
            [(1, 1), (2, 2), (3, 3)], "id_a int, id_b int"
        )
        out = blocking_metrics(
            records, truth, {"k1": F.col("key")}
        ).collect()
        assert len(out) == 1
        r = out[0]
        # blocks: x (n_a=2,n_b=1), y (n_a=1,n_b=2) -> cand = 2 + 2 = 4
        assert r.n_blocks == 2 and r.cand_pairs == 4
        assert abs(r.reduction_ratio - (1 - 4 / 9)) < 1e-5
        # truth coverage: ids 1 (x=x) and 3 (y=y) covered, id 2 (x!=y) not
        assert abs(r.pairs_completeness - 2 / 3) < 1e-5

    def test_multi_scheme_single_pass(self, spark):
        records = spark.createDataFrame(
            [(1, "a", "x", "p"), (1, "b", "x", "q")],
            "rec_id int, side string, k1 string, k2 string",
        )
        truth = spark.createDataFrame([(1, 1)], "id_a int, id_b int")
        out = {
            r.scheme: r
            for r in blocking_metrics(
                records, truth, {"s1": F.col("k1"), "s2": F.col("k2")}
            ).collect()
        }
        assert out["s1"].pairs_completeness == 1.0
        assert out["s2"].pairs_completeness == 0.0
        # s2 keys differ -> records land in two blocks of (1,0)/(0,1) -> 0 cands
        assert out["s2"].cand_pairs == 0 and out["s2"].reduction_ratio == 1.0


class TestKAnonymize:
    def test_small_groups_collapse(self, spark):
        rows = [("A", 10.00)] * 5 + [("B", 20.00)] * 2 + [("C", 30.00)]
        df = spark.createDataFrame(rows, "seg string, amt double")
        out = {r.seg: r for r in
               k_anonymize_agg(df, ["seg"], k=3, amount_col="amt").collect()}
        assert set(out) == {"A", "*"}
        assert out["A"].n == 5 and abs(out["A"].total - 50.0) < 1e-9
        assert out["*"].n == 3 and abs(out["*"].total - 70.0) < 1e-9

    def test_no_small_groups_no_star_row(self, spark):
        df = spark.createDataFrame(
            [("A", 1.0)] * 4, "seg string, amt double"
        )
        out = k_anonymize_agg(df, ["seg"], k=3, amount_col="amt").collect()
        assert len(out) == 1 and out[0].seg == "A"

    def test_star_bucket_meets_k_or_is_dropped(self, spark):
        # suppressed mass 2 < k=3: publishing the '*' bucket would leak a
        # sub-threshold aggregate -> nothing is published at all
        df = spark.createDataFrame(
            [("A", 1.5), ("B", 2.25)], "seg string, amt double"
        )
        assert k_anonymize_agg(df, ["seg"], k=3, amount_col="amt").count() == 0
        # suppressed mass 3 >= k=3: bucket publishes
        df2 = spark.createDataFrame(
            [("A", 1.0), ("B", 2.0), ("C", 4.0)], "seg string, amt double"
        )
        out = k_anonymize_agg(df2, ["seg"], k=3, amount_col="amt").collect()
        assert len(out) == 1 and out[0].seg == "*" and out[0].n == 3

    def test_non_string_quasi_published_as_string(self, spark):
        df = spark.createDataFrame(
            [(7, 1.0)] * 4 + [(9, 2.0)], "grp int, amt double"
        )
        out = k_anonymize_agg(df, ["grp"], k=3, amount_col="amt")
        assert dict(out.dtypes)["grp"] == "string"
        assert {r.grp for r in out.collect()} == {"7"}  # 9's group dropped (<k)


def _brute_jaccard_pairs(docs, tau_num, tau_den, gram_n):
    def grams(text):
        toks = [t for t in text.lower().split() if t]
        if gram_n == 1:
            return set(toks)
        return {
            " ".join(toks[i : i + gram_n])
            for i in range(len(toks) - gram_n + 1)
        }

    sets = {i: grams(t) for i, t in docs}
    out = set()
    ids = sorted(sets)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            sa, sb = sets[ids[ai]], sets[ids[bi]]
            if not sa or not sb:
                continue
            inter = len(sa & sb)
            uni = len(sa) + len(sb) - inter
            if tau_den * inter >= tau_num * uni:
                out.add((ids[ai], ids[bi]))
    return out


class TestSetjoinPrefix:
    def _docs(self):
        rng = random.Random(42)
        vocab = [f"w{i}" for i in range(40)]
        docs = []
        for i in range(60):
            n = rng.randint(5, 25)
            docs.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
        # planted near-dups: drop the last token
        for i in range(0, 60, 6):
            toks = docs[i][1].split()
            docs.append((1000 + i, " ".join(toks[:-1])))
        return docs

    def test_matches_brute_force_unigram(self, spark):
        docs = self._docs()
        df = spark.createDataFrame(docs, "doc_id int, text string")
        got = {
            (r.id_a, r.id_b)
            for r in prefix_filtered_jaccard_join(
                df, tau_num=3, tau_den=5
            ).collect()
        }
        assert got == _brute_jaccard_pairs(docs, 3, 5, 1)
        assert got  # non-vacuous

    def test_matches_brute_force_trigram(self, spark):
        docs = self._docs()
        df = spark.createDataFrame(docs, "doc_id int, text string")
        got = {
            (r.id_a, r.id_b)
            for r in prefix_filtered_jaccard_join(
                df, tau_num=7, tau_den=10, gram_n=3
            ).collect()
        }
        assert got == _brute_jaccard_pairs(docs, 7, 10, 3)
        assert got

    def test_jaccard_values_exact(self, spark):
        df = spark.createDataFrame(
            [(1, "a b c d e"), (2, "a b c d f"), (3, "x y z q r")],
            "doc_id int, text string",
        )
        out = prefix_filtered_jaccard_join(df, tau_num=1, tau_den=2).collect()
        assert len(out) == 1
        r = out[0]
        assert (r.id_a, r.id_b, r.inter) == (1, 2, 4)
        assert abs(r.jaccard - 4 / 6) < 1e-6

    def test_hot_token_cap_bounds_candidates(self, spark):
        # 80 identical docs: uncapped -> all pairs; capped -> pruned
        df = spark.createDataFrame(
            [(i, "a b c d e f g h i j") for i in range(80)],
            "doc_id int, text string",
        )
        full = prefix_filtered_jaccard_join(df, tau_num=3, tau_den=5).count()
        assert full == 80 * 79 // 2
        capped = prefix_filtered_jaccard_join(
            df, tau_num=3, tau_den=5, hot_token_cap=10
        ).count()
        assert capped == 0  # degenerate postings dropped, O(n^2) avoided

    def test_empty_and_short_docs_drop_out(self, spark):
        df = spark.createDataFrame(
            [(1, ""), (2, "  "), (3, "a b"), (4, "a b")],
            "doc_id int, text string",
        )
        out = prefix_filtered_jaccard_join(
            df, tau_num=1, tau_den=2, gram_n=3
        ).collect()
        assert out == []  # all below gram_n tokens


class TestContainmentJoin:
    def test_quote_detected_directionally(self, spark):
        from invoice_ocr_reconciler_spark.operators.setjoin import (
            containment_join,
        )

        df = spark.createDataFrame(
            [
                (1, "a b c d e f g h"),
                (2, "c d e"),          # fully inside 1
                (3, "x y z w"),        # unrelated
            ],
            "doc_id int, text string",
        )
        out = {
            (r.id_a, r.id_b): (r.inter, r.containment)
            for r in containment_join(df, tau_num=9, tau_den=10).collect()
        }
        assert (2, 1) in out and out[(2, 1)] == (3, 1.0)
        assert (1, 2) not in out  # big doc not contained in its quote
        assert all(a != b for a, b in out)

    def test_matches_brute_force(self, spark):
        from invoice_ocr_reconciler_spark.operators.setjoin import (
            containment_join,
        )

        rng = random.Random(7)
        vocab = [f"w{i}" for i in range(30)]
        docs = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(4, 20))))
            for i in range(40)
        ]
        df = spark.createDataFrame(docs, "doc_id int, text string")
        got = {
            (r.id_a, r.id_b)
            for r in containment_join(df, tau_num=4, tau_den=5).collect()
        }
        sets = {i: set(t.split()) for i, t in docs}
        want = {
            (a, b)
            for a in sets
            for b in sets
            if a != b
            and sets[a]
            and 5 * len(sets[a] & sets[b]) >= 4 * len(sets[a])
        }
        assert got == want and got

    def test_max_doc_freq_cut_keeps_exact_inter(self, spark):
        from invoice_ocr_reconciler_spark.operators.setjoin import (
            containment_join,
        )

        # 'common' appears in every doc; pair (1,2) also shares rare 'q'
        df = spark.createDataFrame(
            [(1, "common q"), (2, "common q r"), (3, "common s")],
            "doc_id int, text string",
        )
        out = {
            (r.id_a, r.id_b): r.inter
            for r in containment_join(
                df, tau_num=1, tau_den=2, max_doc_freq=2
            ).collect()
        }
        # candidates only via 'q' (df=2), but inter verified EXACTLY (=2)
        assert out[(1, 2)] == 2
        # doc 3 shares only the cut stop-token -> pair missed (documented)
        assert (3, 1) not in out and (3, 2) not in out


class TestCollocations:
    def test_lift_exact_and_ordering(self, spark):
        from invoice_ocr_reconciler_spark.operators.tfidf import collocations

        # 'new york' always adjacent (high lift); 'a b' adjacent sometimes
        df = spark.createDataFrame(
            [
                (1, "new york a b c"),
                (2, "new york c a b"),
                (3, "new york b a c"),
                (4, "a c b new york"),
            ],
            "doc_id int, text string",
        )
        out = collocations(df, min_count=3, k=10).collect()
        assert out[0].bigram == "new york" and out[0].c_ab == 4
        n_uni, n_bi = 20, 16
        want_lift = (4 * n_uni * n_uni) / (n_bi * 4 * 4)
        assert abs(out[0].lift - want_lift) < 1e-6
        # every reported bigram meets min_count and rows are rank-ordered
        assert all(r.c_ab >= 3 for r in out)
        lifts = [r.lift for r in out]
        assert lifts == sorted(lifts, reverse=True)

    def test_min_count_filters(self, spark):
        from invoice_ocr_reconciler_spark.operators.tfidf import collocations

        df = spark.createDataFrame(
            [(1, "p q"), (2, "p q"), (3, "r s")], "doc_id int, text string"
        )
        out = collocations(df, min_count=2, k=10).collect()
        assert {r.bigram for r in out} == {"p q"}


class TestFsEmFit:
    def _pairs(self, spark):
        # planted generative process, fed as exact pattern counts:
        # 10% matches (name agrees 90%, city agrees 80%),
        # 90% non-matches (name agrees 2%, city agrees 20%)
        rows = []
        for n, (a_name, a_city) in [
            (72, (True, True)), (18, (True, False)),
            (8, (False, True)), (2, (False, False)),
        ]:
            rows += [(a_name, a_city)] * n  # 100 matches
        for n, (a_name, a_city) in [
            (4, (True, True)), (14, (True, False)),
            (176, (False, True)), (706, (False, False)),
        ]:
            rows += [(a_name, a_city)] * n  # 900 non-matches
        return spark.createDataFrame(
            rows, "agree_name boolean, agree_city boolean"
        )

    def test_recovers_planted_parameters(self, spark):
        from invoice_ocr_reconciler_spark.operators.linkage import fs_em_fit

        out = {
            r.field: r
            for r in fs_em_fit(
                self._pairs(spark), ["agree_name", "agree_city"]
            ).collect()
        }
        # match prevalence ~0.1, name separates hard (m>>u)
        assert 0.03 < out["__p__"].m < 0.3
        assert out["agree_name"].m > 0.7 and out["agree_name"].u < 0.1
        assert out["agree_name"].w_agree > 2.0
        assert out["agree_name"].w_disagree < -1.0
        # weaker field still ordered correctly
        assert out["agree_city"].m > out["agree_city"].u

    def test_deterministic_across_runs_and_partitioning(self, spark):
        from invoice_ocr_reconciler_spark.operators.linkage import fs_em_fit

        a = fs_em_fit(
            self._pairs(spark).repartition(2), ["agree_name", "agree_city"]
        ).collect()
        b = fs_em_fit(
            self._pairs(spark).repartition(7), ["agree_name", "agree_city"]
        ).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_null_agreements_excluded_from_field(self, spark):
        from invoice_ocr_reconciler_spark.operators.linkage import fs_em_fit

        rows = [(True, None)] * 50 + [(False, None)] * 50
        df = spark.createDataFrame(
            rows, "agree_name boolean, agree_city boolean"
        )
        out = {
            r.field: r
            for r in fs_em_fit(df, ["agree_name", "agree_city"]).collect()
        }
        # city never observed -> stays at (clamped) init values
        assert abs(out["agree_city"].m - 0.8) < 1e-6
        assert abs(out["agree_city"].u - 0.2) < 1e-6


class TestKAnonymizeInvariants:
    def test_totals_preserved_under_suppression(self, spark):
        """Suppression reshuffles rows but can't create or destroy mass:
        published n sums to the input count and published totals sum to
        the input's rounded-cents total, for any k."""
        rng = random.Random(11)
        rows = [
            (f"g{rng.randint(0, 30)}", round(rng.uniform(-50, 500), 2))
            for _ in range(800)
        ]
        df = spark.createDataFrame(rows, "seg string, amt double")
        import math

        want_cents = sum(math.floor(a * 100 + 0.5) for _, a in rows)
        for k in (1, 5, 50):
            out = k_anonymize_agg(df, ["seg"], k=k, amount_col="amt").collect()
            assert sum(r.n for r in out) == len(rows)
            got_cents = round(sum(r.total for r in out) * 100)
            assert got_cents == want_cents
            assert all(r.n >= k for r in out)  # the '*' bucket included
        # k beyond the corpus: even the suppressed bucket is below k ->
        # total suppression, nothing published
        assert k_anonymize_agg(df, ["seg"], k=10_000, amount_col="amt").count() == 0


def test_run_linkage_job(spark, tmp_path, monkeypatch):
    """End-to-end CLI job: two parquet tables -> links parquet + stats
    JSON; --fit-em path re-estimates m/u from the data first."""
    import json
    import sys

    a = [(i, i % 5, f"n{i}", f"c{i % 9}") for i in range(200)]
    # b: same people, name perturbed for id%4==0
    b = [
        (i, i % 5, (f"n{i}" if i % 4 else "zz"), f"c{i % 9}")
        for i in range(200)
    ]
    pa, pb = f"{tmp_path}/a", f"{tmp_path}/b"
    spark.createDataFrame(a, "pid int, blk int, name string, city string") \
        .write.mode("overwrite").parquet(pa)
    spark.createDataFrame(b, "pid int, blk int, name string, city string") \
        .write.mode("overwrite").parquet(pb)
    out = f"{tmp_path}/lnk"
    monkeypatch.setattr(
        sys,
        "argv",
        ["run_linkage.py", "--a", pa, "--b", pb, "--id-a", "pid",
         "--id-b", "pid", "--block", "blk",
         "--fields", "name:0.9:0.01,city:0.8:0.15",
         "--lower", "0.0", "--upper", "5.0", "--out", out],
    )
    import jobs.run_linkage as job

    job.main()
    stats = json.loads(open(f"{out}/linkage_stats.json").read())
    assert stats["n_a"] == 200 and stats["n_b"] == 200
    assert stats["decisions"].get("match", 0) > 100  # unperturbed pairs
    links = spark.read.parquet(f"{out}/links")
    assert links.where("decision = 'non_match'").count() == 0

    out2 = f"{tmp_path}/lnk_em"
    monkeypatch.setattr(
        sys,
        "argv",
        ["run_linkage.py", "--a", pa, "--b", pb, "--id-a", "pid",
         "--id-b", "pid", "--block", "blk",
         "--fields", "name:0.9:0.01,city:0.8:0.15",
         "--lower", "0.0", "--upper", "5.0", "--out", out2, "--fit-em"],
    )
    job.main()
    stats2 = json.loads(open(f"{out2}/linkage_stats.json").read())
    assert stats2["fitted_by_em"]
    name_field = next(f for f in stats2["fields"] if f["name"] == "name")
    assert name_field["m"] > name_field["u"]


class TestReviewFixes:
    def test_blocking_null_keys_add_no_candidate_mass(self, spark):
        records = spark.createDataFrame(
            [
                (1, "a", "x"), (2, "a", None), (3, "a", None),
                (1, "b", "x"), (2, "b", None), (3, "b", None),
            ],
            "rec_id int, side string, key string",
        )
        truth = spark.createDataFrame(
            [(1, 1), (2, 2), (3, 3)], "id_a int, id_b int"
        )
        r = blocking_metrics(records, truth, {"k": F.col("key")}).collect()[0]
        # the NULL group is not a block and contributes no candidates,
        # but its records still count in the reduction denominator (3x3)
        assert r.n_blocks == 1 and r.cand_pairs == 1
        assert abs(r.reduction_ratio - (1 - 1 / 9)) < 1e-5
        # NULL-keyed truth pairs are uncovered
        assert abs(r.pairs_completeness - 1 / 3) < 1e-5

    def test_em_label_swap_guard(self, spark):
        from invoice_ocr_reconciler_spark.operators.linkage import fs_em_fit

        # match-heavy candidate set (tight blocking): 90% matches that
        # agree, 10% non-matches that don't — without the guard EM can
        # land on the swapped labeling (p>0.5, m<u)
        rows = [(True,)] * 900 + [(False,)] * 100
        df = spark.createDataFrame(rows, "agree_name boolean")
        out = {r.field: r for r in fs_em_fit(df, ["agree_name"]).collect()}
        assert out["__p__"].m <= 0.5
        assert out["agree_name"].m > out["agree_name"].u
        assert out["agree_name"].w_agree > 0

    def test_agreement_col_shared_contract(self, spark):
        from invoice_ocr_reconciler_spark.operators.linkage import (
            agreement_col,
        )

        df = spark.createDataFrame(
            [("x", "x"), ("x", "y"), (None, "x"), ("x", None)],
            "a_f string, b_f string",
        )
        got = [r[0] for r in df.select(agreement_col("f")).collect()]
        assert got == [True, False, None, None]


class TestRrfFuse:
    def test_hand_computed_fusion(self, spark):
        from invoice_ocr_reconciler_spark.operators.tfidf import rrf_fuse

        bm = spark.createDataFrame(
            [(10, 1), (11, 2), (12, 3)], "doc_id int, rank int"
        )
        ann = spark.createDataFrame(
            [(11, 1), (13, 2)], "doc_id int, rank int"
        )
        out = {
            r.doc_id: r
            for r in rrf_fuse({"bm25": bm, "ann": ann}, k=10).collect()
        }
        # doc 11 is in both lists -> highest fused score
        assert abs(out[11].rrf_score - (1 / 62 + 1 / 61)) < 1e-6
        assert out[11].fused_rank == 1
        # single-list docs: score from one term only, other rank NULL
        assert abs(out[10].rrf_score - 1 / 61) < 1e-6
        assert out[10].rank_ann is None
        assert abs(out[13].rrf_score - 1 / 62) < 1e-6
        assert out[13].rank_bm25 is None
        assert len(out) == 4

    def test_k_cut_and_total_order(self, spark):
        from invoice_ocr_reconciler_spark.operators.tfidf import rrf_fuse

        bm = spark.createDataFrame(
            [(i, i + 1) for i in range(30)], "doc_id int, rank int"
        )
        out = rrf_fuse({"bm25": bm}, k=7).collect()
        assert [r.doc_id for r in out] == list(range(7))
        assert [r.fused_rank for r in out] == list(range(1, 8))


class TestKwicSnippets:
    def test_window_and_term_priority(self, spark):
        from invoice_ocr_reconciler_spark.operators.tfidf import kwic_snippets

        left = "x" * 50
        df = spark.createDataFrame(
            [
                (1, f"{left}stream and window here"),
                (2, "window only"),
                (3, "nothing relevant"),
                (4, "Stream CAPS"),
            ],
            "doc_id int, text string",
        )
        out = {
            r.doc_id: r
            for r in kwic_snippets(
                df, ["merge", "stream", "window"], window_chars=10
            ).collect()
        }
        assert set(out) == {1, 2, 4}
        # doc 1: 'stream' precedes 'window' in term order AND text
        assert out[1].term == "stream" and out[1].pos == 51
        assert out[1].snippet == "x" * 10 + "stream" + " and windo"
        # doc 2: window at pos 1, left clamp
        assert out[2].term == "window" and out[2].pos == 1
        assert out[2].snippet.startswith("window")
        # case-insensitive locate, original-case snippet
        assert out[4].term == "stream" and "Stream" in out[4].snippet


def test_rrf_fuse_collapses_duplicate_ids_and_rejects_empty(spark):
    import pytest

    from invoice_ocr_reconciler_spark.operators.tfidf import rrf_fuse

    # multi-query ANN output: same doc under two ranks -> best rank wins
    ann = spark.createDataFrame(
        [(5, 3), (5, 1), (6, 2)], "doc_id int, rank int"
    )
    out = {r.doc_id: r for r in rrf_fuse({"ann": ann}, k=10).collect()}
    assert len(out) == 2 and out[5].rank_ann == 1
    assert out[5].fused_rank == 1 and out[6].fused_rank == 2
    with pytest.raises(ValueError):
        rrf_fuse({})


class TestPoolEmbeddings:
    def test_mean_exact_and_partition_invariant(self, spark):
        from invoice_ocr_reconciler_spark.operators.similarity import (
            pool_embeddings,
        )

        rows = [
            (1, [1.0, 2.0]),
            (1, [3.0, 4.0]),
            (1, [5.0, 0.5]),
            (2, [0.25, -0.75]),
        ]

        def run(parts):
            df = spark.createDataFrame(
                rows, "doc_id int, embedding array<double>"
            ).repartition(parts)
            return {
                r.doc_id: (r.n_chunks, r.pooled)
                for r in pool_embeddings(df).collect()
            }

        a = run(1)
        assert a[1][0] == 3 and a[1][1] == [3.0, 6.5 / 3 * 1.0]
        # exact: (2.0+4.0+0.5)=6.5 -> 6500000/(3*1e6)
        assert abs(a[1][1][1] - 6500000 / 3000000) < 1e-12
        assert a[2] == (1, [0.25, -0.75])
        assert run(5) == a  # bit-identical at any partitioning


class TestPercolate:
    def test_and_semantics(self, spark):
        from invoice_ocr_reconciler_spark.operators.tfidf import percolate

        docs = spark.createDataFrame(
            [
                (1, "alpha beta gamma"),
                (2, "alpha delta"),
                (3, "beta Alpha extra"),  # case-insensitive doc tokens
                (4, "unrelated words"),
            ],
            "doc_id int, text string",
        )
        queries = spark.createDataFrame(
            [
                (100, ["alpha", "beta"]),
                (200, ["alpha"]),
                (300, ["alpha", "alpha"]),  # duplicate terms collapse
                (400, ["missing"]),
            ],
            "query_id int, terms array<string>",
        )
        got = {
            (r.doc_id, r.query_id): r.n_terms
            for r in percolate(docs, queries).collect()
        }
        assert set(got) == {
            (1, 100), (1, 200), (1, 300),
            (2, 200), (2, 300),
            (3, 100), (3, 200), (3, 300),
        }
        assert got[(1, 100)] == 2 and got[(2, 300)] == 1


class TestBm25f:
    def test_title_hit_outranks_body_hit(self, spark):
        from invoice_ocr_reconciler_spark.operators.tfidf import bm25f_search

        docs = spark.createDataFrame(
            [
                (1, "target one", "filler words here pad pad"),
                (2, "other words", "target filler here pad pad"),
                (3, "other words", "filler words here pad pad"),
            ],
            "doc_id int, title string, body string",
        )
        out = bm25f_search(
            docs,
            ["target"],
            {"title": (2.0, 0.5), "body": (1.0, 0.75)},
            k=10,
        ).collect()
        ranks = {r.doc_id: r.rank for r in out}
        assert set(ranks) == {1, 2}  # doc 3 never matches
        assert ranks[1] == 1 and ranks[2] == 2  # title-weighted win
        scores = {r.doc_id: r.score for r in out}
        assert scores[1] > scores[2] > 0

    def test_cross_field_df_counts_doc_once(self, spark):
        from invoice_ocr_reconciler_spark.operators.tfidf import bm25f_search

        # term in BOTH fields of one doc: df must be 1, not 2
        docs = spark.createDataFrame(
            [(1, "target a", "target b"), (2, "x y", "z w")],
            "doc_id int, title string, body string",
        )
        out = bm25f_search(
            docs, ["target"], {"title": (2.0, 0.5), "body": (1.0, 0.75)}
        ).collect()
        assert len(out) == 1 and out[0].doc_id == 1 and out[0].n_matched == 1
