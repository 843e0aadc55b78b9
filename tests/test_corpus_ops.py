"""Tests for the curation corpus operators added after round 1:
line-level dedup, benchmark decontamination, Gopher quality rules, and
domain-mixture sampling."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def lined_docs(spark):
    boiler = "accept all cookies"
    rows = [
        (0, f"{boiler}\nunique alpha content zero\nmore unique zero"),
        (1, f"{boiler}\nunique beta content one"),
        (2, f"  {boiler}  \nunique gamma content two\n\n   "),  # trim + blanks
        (3, "no boilerplate here at all"),
        (4, ""),  # empty doc
        (5, None),  # null text
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_line_dedup_removes_global_boilerplate(lined_docs):
    from invoice_ocr_reconciler_spark.operators.dedup import line_dedup

    out = {r["doc_id"]: r.asDict() for r in
           line_dedup(lined_docs, max_doc_freq=3).collect()}
    assert len(out) == 6  # every input doc survives, even empty/null
    # the 3-doc boilerplate line is removed everywhere, order preserved
    assert out[0]["text_clean"] == "unique alpha content zero\nmore unique zero"
    assert out[0]["n_lines_kept"] == 2 and out[0]["n_lines_removed"] == 1
    assert out[1]["text_clean"] == "unique beta content one"
    # trimmed occurrence counts toward the same line key; blanks dropped
    assert out[2]["text_clean"] == "unique gamma content two"
    assert out[2]["n_lines_removed"] == 1
    # doc without boilerplate is untouched
    assert out[3]["text_clean"] == "no boilerplate here at all"
    assert out[3]["n_lines_removed"] == 0
    # empty/null docs: no lines, empty clean text
    for i in (4, 5):
        assert out[i]["text_clean"] == ""
        assert out[i]["n_lines_kept"] == 0 and out[i]["n_lines_removed"] == 0


def test_line_dedup_threshold_boundary(lined_docs):
    from invoice_ocr_reconciler_spark.operators.dedup import line_dedup

    # at max_doc_freq=4 the 3-doc line is NOT boilerplate
    out = {r["doc_id"]: r.asDict() for r in
           line_dedup(lined_docs, max_doc_freq=4).collect()}
    assert out[1]["text_clean"] == "accept all cookies\nunique beta content one"
    assert out[1]["n_lines_removed"] == 0


def test_line_dedup_scoped_protects_cross_site_lines(spark):
    from invoice_ocr_reconciler_spark.operators.dedup import line_dedup

    # "common phrase" appears once on each of 3 SITES: global dedup at
    # max_doc_freq=3 removes it, per-site dedup keeps it; site-a's own
    # template line (3 docs, same site) is cut by BOTH
    rows = [
        (0, "a", "site template line\ncommon phrase\nalpha body"),
        (1, "a", "site template line\nbeta body"),
        (2, "a", "site template line\ngamma body"),
        (3, "b", "common phrase\ndelta body"),
        (4, "c", "common phrase\nepsilon body"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    g = {r["doc_id"]: r["text_clean"]
         for r in line_dedup(docs, max_doc_freq=3).collect()}
    s_ = {r["doc_id"]: r["text_clean"]
          for r in line_dedup(docs, max_doc_freq=3, scope_col="source").collect()}
    # both cut site-a's template
    assert "site template line" not in g[0] and "site template line" not in s_[0]
    # global cuts the cross-site phrase; scoped keeps it
    assert "common phrase" not in g[0] and "common phrase" not in g[3]
    assert s_[0] == "common phrase\nalpha body"
    assert s_[3] == "common phrase\ndelta body"
    assert s_[4] == "common phrase\nepsilon body"


def test_decontaminate_flags_ngram_overlap(spark):
    from invoice_ocr_reconciler_spark.operators.decontam import decontaminate

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta eta theta"),  # contains bench
            (1, "prefix words alpha beta gamma delta epsilon zeta suffix"),  # hit
            (2, "totally unrelated content with other words entirely here"),
            (3, "alpha beta gamma delta epsilon"),  # only 5 tokens of the 6-gram
            (4, ""),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [("alpha beta gamma delta epsilon zeta",)], "text string"
    )
    out = {r["doc_id"]: r.asDict() for r in
           decontaminate(docs, bench, n=6).collect()}
    assert out[0]["contaminated"] == 1 and out[0]["n_hit_grams"] == 1
    assert out[1]["contaminated"] == 1
    assert out[2]["contaminated"] == 0 and out[2]["n_hit_grams"] == 0
    assert out[3]["contaminated"] == 0  # sub-n overlap is not a hit
    assert out[4]["contaminated"] == 0
    # shuffle-join fallback path gives identical results
    out2 = {r["doc_id"]: r["contaminated"] for r in
            decontaminate(docs, bench, n=6, broadcast_bench=False).collect()}
    assert out2 == {k: v["contaminated"] for k, v in out.items()}


def test_decontaminate_short_benchmark_contributes_nothing(spark):
    from invoice_ocr_reconciler_spark.operators.decontam import decontaminate

    docs = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta")], "doc_id long, text string"
    )
    bench = spark.createDataFrame([("alpha beta",)], "text string")
    out = decontaminate(docs, bench, n=6).collect()
    assert out[0]["contaminated"] == 0


def test_gopher_rules_features_and_pass(spark):
    from invoice_ocr_reconciler_spark.functions.text import gopher_rules_cols

    good = " ".join(["word"] * 60)  # 60 words, mean len 4, all alpha
    short = "too short"
    symbols = " ".join(["###"] * 60)  # no [a-z] and symbol-heavy
    bullets = "\n".join(["- item one two three four five six seven eight nine"] * 6)
    docs = spark.createDataFrame(
        [(0, good), (1, short), (2, symbols), (3, bullets), (4, None)],
        "doc_id long, text string",
    )
    g = gopher_rules_cols(F.col("text"))
    out = {r["doc_id"]: r.asDict() for r in
           docs.select("doc_id", *[v.alias(k) for k, v in g.items()]).collect()}
    assert out[0]["n_words"] == 60
    assert out[0]["mean_word_len"] == 4.0
    assert out[0]["frac_alpha_words"] == 1.0
    assert out[0]["gopher_pass"] == 1
    assert out[1]["gopher_pass"] == 0  # n_words < 50
    assert out[2]["frac_alpha_words"] == 0.0
    assert out[2]["symbol_word_ratio"] == 3.0  # three '#' per token
    assert out[2]["gopher_pass"] == 0
    assert out[3]["bullet_line_frac"] == 1.0
    assert out[3]["gopher_pass"] == 0  # bullet fraction rule
    assert out[4]["n_words"] == 0 and out[4]["gopher_pass"] == 0


def test_mixture_sample_hits_target_mix(spark):
    from invoice_ocr_reconciler_spark.operators.sampling import mixture_sample

    rows = [(i, "a" if i < 1000 else "b", "x") for i in range(2000)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = mixture_sample(
        docs, weights={"a": 0.25, "b": 0.75}, total_fraction=0.4
    )
    got = {r["source"]: r["cnt"] for r in
           out.groupBy("source").agg(F.count("*").alias("cnt")).collect()}
    # targets: a = 0.25*0.4*2000 = 200 of 1000 (rate .2); b = 600 of 1000 (rate .6)
    assert abs(got["a"] - 200) < 40  # md5 buckets are uniform, not exact
    assert abs(got["b"] - 600) < 60
    rates = {r["source"]: r["accept_rate"] for r in
             out.select("source", "accept_rate").distinct().collect()}
    assert abs(rates["a"] - 0.2) < 1e-9 and abs(rates["b"] - 0.6) < 1e-9


def test_mixture_sample_saturation_and_unlisted(spark):
    from invoice_ocr_reconciler_spark.operators.sampling import mixture_sample

    rows = [(i, ["tiny", "big", "other"][min(i // 10, 2)], "x")
            for i in range(1000)]  # tiny=10, big=10..., other=980
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = mixture_sample(
        docs, weights={"tiny": 0.9, "big": 0.1}, total_fraction=0.5
    ).cache()
    by_src = {r["source"]: r["cnt"] for r in
              out.groupBy("source").agg(F.count("*").alias("cnt")).collect()}
    # tiny saturates: target 0.9*0.5*1000=450 >> 10 -> rate 1.0, all 10 kept
    assert by_src.get("tiny") == 10
    # unlisted domain dropped entirely
    assert "other" not in by_src
    rates = {r["source"]: r["accept_rate"] for r in
             out.select("source", "accept_rate").distinct().collect()}
    assert rates["tiny"] == 1.0
    out.unpersist()


def test_mixture_sample_partition_invariant(spark):
    from invoice_ocr_reconciler_spark.operators.sampling import mixture_sample

    rows = [(i, "a" if i % 3 else "b", "x") for i in range(500)]
    docs1 = spark.createDataFrame(rows, "doc_id long, source string, text string")
    docs2 = docs1.repartition(17, "text")
    kept1 = sorted(r["doc_id"] for r in mixture_sample(
        docs1, weights={"a": 0.5, "b": 0.5}, total_fraction=0.3).collect())
    kept2 = sorted(r["doc_id"] for r in mixture_sample(
        docs2, weights={"a": 0.5, "b": 0.5}, total_fraction=0.3).collect())
    assert kept1 == kept2 and len(kept1) > 0


def test_line_dedup_degenerate_all_identical(spark):
    """10k copies of one doc: boilerplate removal must stay linear — the
    hot line collapses in the partial agg, output is one row per doc."""
    from invoice_ocr_reconciler_spark.operators.dedup import line_dedup

    docs = spark.range(10_000).select(
        F.col("id").alias("doc_id"),
        F.lit("same line everywhere\nsecond shared line").alias("text"),
    )
    out = line_dedup(docs, max_doc_freq=3)
    assert out.count() == 10_000
    row = out.filter(F.col("doc_id") == 0).collect()[0]
    assert row["text_clean"] == "" and row["n_lines_removed"] == 2


def test_curation_gopher_and_decontam_stages(spark):
    from invoice_ocr_reconciler_spark.operators.curation import curate_documents

    long_good = " ".join(
        "the quick brown fox with that zeta%d word and more of the text is with"
        % i for i in range(5)
    )  # 65 words, passes gopher + quality
    rows = [
        (i, long_good.replace("zeta0", f"uniq{i}")) for i in range(6)
    ] + [
        (100, "the short text"),  # fails gopher (n_words < 50), passes quality? no—also low quality
        (101, " ".join(["the data is with that of to"] * 10)),  # 70 words, repetitive but gopher-ok
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bench = spark.createDataFrame(
        [("brown fox with that uniq3 word",)], "text string"  # 1 gram, only doc 3
    )
    out = curate_documents(
        docs,
        min_quality=0.0,
        langs=("en",),
        with_near_dup=False,
        gopher=True,
        benchmark=bench,
        decontam_n=6,
    )
    s = out["stats"].collect()[0]
    assert (
        s["n_exact_dup"] + s["n_filtered_out"] + s["n_repetition_out"]
        + s["n_gopher_out"] + s["n_contaminated"]
        + s["n_near_dup"] + s["n_sampled_out"] + s["n_curated"]
        == s["n_input"] == 8
    )
    kept = {r["doc_id"] for r in out["curated"].collect()}
    assert 100 not in kept          # gopher cut
    assert 3 not in kept            # decontaminated (uniq3 6-gram hit)
    assert s["n_contaminated"] == 1
    assert s["n_gopher_out"] >= 1
    assert {0, 1, 2, 4, 5}.issubset(kept)


def test_curation_new_stages_off_report_zero(spark):
    from invoice_ocr_reconciler_spark.operators.curation import curate_documents

    docs = spark.createDataFrame(
        [(i, f"the value {i} and the table of data") for i in range(5)],
        "doc_id long, text string",
    )
    out = curate_documents(docs, min_quality=0.0, with_near_dup=False)
    s = out["stats"].collect()[0]
    assert s["n_gopher_out"] == 0 and s["n_contaminated"] == 0


def test_line_dedup_crlf_line_endings(spark):
    from invoice_ocr_reconciler_spark.operators.dedup import line_dedup

    # the same boilerplate under Unix and Windows endings must share one
    # line key; blank CRLF lines must not count as content lines
    rows = [
        (0, "accept all cookies\nunique zero"),
        (1, "accept all cookies\r\nunique one\r\n\r\n"),
        (2, "accept all cookies\r\nunique two"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in
           line_dedup(docs, max_doc_freq=3).collect()}
    for i, uniq in ((0, "unique zero"), (1, "unique one"), (2, "unique two")):
        assert out[i]["text_clean"] == uniq
        assert out[i]["n_lines_removed"] == 1
        assert out[i]["n_lines_kept"] == 1


def test_gopher_line_rules_crlf(spark):
    from invoice_ocr_reconciler_spark.functions.text import gopher_rules_cols

    # CRLF text: the '\r' never reaches the line values, so the
    # ellipsis-end rule fires identically to Unix endings (and identically
    # to the RE2 oracle, whose '$' does not match before '\r')
    unix = "to be continued...\nplain line"
    crlf = "to be continued...\r\nplain line"
    docs = spark.createDataFrame(
        [(0, unix), (1, crlf), (2, "ends with ellipsis...")],
        "doc_id long, text string",
    )
    g = gopher_rules_cols(F.col("text"))
    out = {r["doc_id"]: r.asDict() for r in
           docs.select("doc_id", *[v.alias(k) for k, v in g.items()]).collect()}
    assert out[0]["ellipsis_line_frac"] == out[1]["ellipsis_line_frac"] == 0.5
    assert out[2]["ellipsis_line_frac"] == 1.0


def test_wordlist_flags_counts_and_audit(spark):
    from invoice_ocr_reconciler_spark.functions.text import wordlist_flags

    docs = spark.createDataFrame(
        [
            (0, "Bad word BAD again bad end"),   # case-insensitive, 3 hits
            (1, "totally clean text here"),
            (2, ""),
            (3, None),
            (4, "bad"),
        ],
        "doc_id long, text string",
    )
    lex = spark.createDataFrame([("BAD",), ("evil",)], "word string")
    out = {r["doc_id"]: r.asDict() for r in wordlist_flags(docs, lex).collect()}
    # occurrences, not distinct words; rows never dropped
    assert sorted(out) == [0, 1, 2, 3, 4]
    assert out[0]["n_flagged"] == 3 and out[0]["n_tokens"] == 6
    assert out[0]["flagged_ratio"] == 0.5
    assert out[0]["first_flagged"] == "bad"
    assert out[1]["n_flagged"] == 0 and out[1]["first_flagged"] is None
    for i in (2, 3):  # empty/null docs: ratio 0.0, never null
        assert out[i] == {"doc_id": i, "n_tokens": 0, "n_flagged": 0,
                          "flagged_ratio": 0.0, "first_flagged": None}
    assert out[4]["flagged_ratio"] == 1.0


def test_wordlist_flags_empty_lexicon_and_corpus(spark):
    from invoice_ocr_reconciler_spark.functions.text import wordlist_flags

    docs = spark.createDataFrame([(0, "some text")], "doc_id long, text string")
    empty_lex = spark.createDataFrame([], "word string")
    out = wordlist_flags(docs, empty_lex).collect()
    assert len(out) == 1 and out[0]["n_flagged"] == 0
    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    lex = spark.createDataFrame([("bad",)], "word string")
    assert wordlist_flags(empty_docs, lex).count() == 0


def test_calibrate_scores_zscore(spark):
    from invoice_ocr_reconciler_spark.operators.sampling import calibrate_scores

    rows = [
        (0, "a", 10.0), (1, "a", 20.0), (2, "a", 30.0),   # mean 20, std ~8.165
        (3, "b", 5.0), (4, "b", 5.0),                     # constant group
        (5, "c", None),                                   # null score
        (6, "c", 7.0),                                    # singleton real score
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, score double")
    out = {r["doc_id"]: r["calibrated"]
           for r in calibrate_scores(docs, "score", "source").collect()}
    assert out[1] == 0.0 and out[0] == -out[2] < 0
    assert abs(out[2] - 1.224745) < 1e-6
    assert out[3] == out[4] == 0.0          # stddev 0 -> no signal -> 0.0
    assert out[5] is None                   # null passes through
    assert out[6] == 0.0                    # group c stats exclude the null

def test_calibrate_scores_pct_rank(spark):
    from invoice_ocr_reconciler_spark.operators.sampling import calibrate_scores

    rows = [
        (0, "a", 10.0), (1, "a", 20.0), (2, "a", 20.0), (3, "a", 40.0),
        (4, "b", 3.0),                                    # singleton -> 0.0
        (5, "a", None),                                   # excluded from ranks
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, score double")
    out = {r["doc_id"]: r["calibrated"]
           for r in calibrate_scores(docs, "score", "source",
                                     method="pct_rank").collect()}
    # 4 ranked rows in group a: the null must NOT shift these
    assert out[0] == 0.0 and out[3] == 1.0
    assert out[1] == out[2] == pytest.approx(1 / 3, abs=1e-6)  # ties share
    assert out[4] == 0.0 and out[5] is None


def test_calibrate_scores_null_group_survives(spark):
    # a NULL group key is a group of its own in BOTH methods — the zscore
    # stats join must be null-safe, not an equi-join that drops the rows
    from invoice_ocr_reconciler_spark.operators.sampling import calibrate_scores

    rows = [
        (0, "a", 10.0), (1, "a", 30.0),
        (2, None, 4.0), (3, None, 8.0),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, score double")
    z = {r["doc_id"]: r["calibrated"]
         for r in calibrate_scores(docs, "score", "source").collect()}
    assert set(z) == {0, 1, 2, 3}                  # no silent row loss
    assert z[2] == -1.0 and z[3] == 1.0            # NULL group standardized
    p = {r["doc_id"]: r["calibrated"]
         for r in calibrate_scores(docs, "score", "source",
                                   method="pct_rank").collect()}
    assert set(p) == {0, 1, 2, 3}
    assert p[2] == 0.0 and p[3] == 1.0


def test_calibrate_scores_bad_method(spark):
    from invoice_ocr_reconciler_spark.operators.sampling import calibrate_scores

    docs = spark.createDataFrame([(0, "a", 1.0)],
                                 "doc_id long, source string, score double")
    with pytest.raises(ValueError):
        calibrate_scores(docs, "score", "source", method="nope")


def test_latest_snapshot_newest_wins_and_ambiguity_guard(spark):
    import datetime as dt

    from invoice_ocr_reconciler_spark.operators.diff import latest_snapshot

    t = lambda d: dt.datetime(2026, 3, d)
    rows = [
        ("u1", t(1), 1, "a"), ("u1", t(5), 2, "b"),   # newest wins
        ("u2", t(3), 3, "c"),
        ("u3", None, 4, "d"), ("u3", t(2), 5, "e"),   # null ts loses
        ("u4", t(7), 6, "f"), ("u4", t(7), 7, "g"),   # tie -> tiebreak desc
    ]
    snaps = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, seq long, payload string"
    )
    out = {r["url"]: r for r in
           latest_snapshot(snaps, tiebreak_col="seq").collect()}
    assert len(out) == 4
    assert out["u1"]["payload"] == "b"
    assert out["u3"]["payload"] == "e"
    assert out["u4"]["payload"] == "g"      # highest seq wins the tie
    # without a tiebreak column, equal-ts duplicates must raise
    import pytest as _pytest
    with _pytest.raises(ValueError, match="equal-timestamp"):
        latest_snapshot(snaps).collect()
    # but a frame with NO ties passes without one
    clean = snaps.filter("url <> 'u4'")
    assert latest_snapshot(clean).count() == 3


def test_latest_snapshot_partition_invariant_and_empty(spark):
    from invoice_ocr_reconciler_spark.operators.diff import latest_snapshot

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    a = sorted(map(tuple, latest_snapshot(
        ev, key_col="user_id", ts_col="ts", tiebreak_col="event_id").collect()))
    b = sorted(map(tuple, latest_snapshot(
        ev.repartition(7), key_col="user_id", ts_col="ts",
        tiebreak_col="event_id").collect()))
    assert a == b and len(a) > 0
    empty = spark.createDataFrame([], "url string, warc_ts timestamp")
    assert latest_snapshot(empty).count() == 0


def test_corpus_report_one_row_metrics(spark):
    from invoice_ocr_reconciler_spark.operators.profile import corpus_report

    docs = spark.createDataFrame(
        [
            (0, "the cat and the dog is here with that thing"),
            (1, "the cat and the dog is here with that thing"),  # exact dup
            (2, ""),
            (3, None),
            (4, "le chat est dans la maison des amis une fois"),
        ],
        "doc_id long, text string",
    )
    r = corpus_report(docs).collect()[0].asDict()
    assert r["n_docs"] == 5 and r["n_empty"] == 2
    # 3 distinct fingerprints: the dup pair, the ''/None pair, the fr doc
    assert r["uniq_fingerprints"] == 3
    assert r["exact_dup_rate"] == pytest.approx(1 - 3 / 5, abs=1e-6)
    assert r["total_tokens"] == 10 + 10 + 10
    assert r["lang_share"] == pytest.approx(2 / 5, abs=1e-6)  # en docs 0,1


def test_corpus_report_empty_frame(spark):
    from invoice_ocr_reconciler_spark.operators.profile import corpus_report

    empty = spark.createDataFrame([], "doc_id long, text string")
    r = corpus_report(empty).collect()[0].asDict()
    assert r["n_docs"] == 0 and r["total_tokens"] == 0
    assert r["mean_tokens"] is None and r["exact_dup_rate"] is None


def test_crawl_frontier(spark):
    from invoice_ocr_reconciler_spark.operators.graph import crawl_frontier

    links = spark.createDataFrame(
        [
            ("https://a.example/p1", "https://b.example/x"),
            ("https://a.example/p2", "https://b.example/x"),
            ("https://c.example/p1", "https://b.example/x"),
            ("https://a.example/p1", "https://a.example/p2"),  # already crawled
            ("https://a.example/p1", "https://d.example/new"),
        ],
        "url string, link string",
    )
    crawled = spark.createDataFrame(
        [("https://a.example/p1",), ("https://a.example/p2",)], "url string"
    )
    out = {r["link"]: r for r in crawl_frontier(links, crawled).collect()}
    assert set(out) == {"https://b.example/x", "https://d.example/new"}
    b = out["https://b.example/x"]
    assert b["n_referrers"] == 3            # three referring pages
    assert b["n_referrer_hosts"] == 2       # a.example + c.example
    assert b["host"] == "b.example"
    assert out["https://d.example/new"]["n_referrers"] == 1


def test_crawl_frontier_empty(spark):
    from invoice_ocr_reconciler_spark.operators.graph import crawl_frontier

    links = spark.createDataFrame([], "url string, link string")
    crawled = spark.createDataFrame([("https://a.example/p1",)], "url string")
    assert crawl_frontier(links, crawled).count() == 0


def test_nfc_normalize_text(spark):
    from invoice_ocr_reconciler_spark.functions.text import nfc_normalize_text

    rows = [
        (0, "Café"),                      # decomposed -> precomposed
        (1, "a b​c­d\x07e"),     # nbsp/zwsp/shy/control
        (2, "x\r\ny\rz"),                       # CRLF / CR -> LF
        (3, None),
        (4, "plain"),
        (5, "tab\tkeeps\nnewline"),             # \t and \n survive
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["text_norm"]
           for r in nfc_normalize_text(docs).collect()}
    assert out[0] == "Café"
    assert out[1] == "a bcde"
    assert out[2] == "x\ny\nz"
    assert out[3] == ""                 # clean pass coalesces null -> ''
    assert out[4] == "plain"
    assert out[5] == "tab\tkeeps\nnewline"


def test_nfc_normalize_no_clean_keeps_null(spark):
    from invoice_ocr_reconciler_spark.functions.text import nfc_normalize_text

    docs = spark.createDataFrame(
        [(0, None), (1, "Café\x07")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["text_norm"]
           for r in nfc_normalize_text(docs, clean=False).collect()}
    assert out[0] is None               # NFC alone propagates null
    assert out[1] == "Café\x07"    # control char untouched without clean


def test_fetch_schedule(spark):
    from invoice_ocr_reconciler_spark.operators.graph import fetch_schedule

    rows = [
        ("https://a.example/1", "a.example", 5, 1),
        ("https://a.example/2", "a.example", 9, 1),
        ("https://a.example/3", "a.example", 9, 2),   # ties: link asc
        ("https://b.example/x", "b.example", 1, 1),
    ]
    frontier = spark.createDataFrame(
        rows, "link string, host string, n_referrers long, n_referrer_hosts long"
    )
    out = {r["link"]: r["wave"] for r in fetch_schedule(frontier).collect()}
    # a.example: priority 9 first (tie by link), then 5; b independent
    assert out["https://a.example/2"] == 1
    assert out["https://a.example/3"] == 2
    assert out["https://a.example/1"] == 3
    assert out["https://b.example/x"] == 1
    capped = fetch_schedule(frontier, max_per_host=2).collect()
    assert len(capped) == 3
    assert all(r["wave"] <= 2 for r in capped)


class TestCompressionRatio:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id bigint, text string")

    def test_repetitive_compresses_below_prose(self, spark):
        from invoice_ocr_reconciler_spark.functions.text import (
            compression_ratio,
        )

        prose = (
            "The quarterly reconciliation surfaced three mismatched "
            "ledger entries across unrelated vendors, each traced to a "
            "distinct currency rounding convention."
        )
        got = {
            r["doc_id"]: r
            for r in compression_ratio(
                self._df(spark, [(1, "spam " * 40), (2, prose)])
            ).collect()
        }
        assert got[1]["compression_ratio"] < got[2]["compression_ratio"]
        assert got[2]["n_bytes"] == len(prose.encode())
        assert 0 < got[1]["compression_ratio"] < 1

    def test_empty_and_null_yield_null_ratio(self, spark):
        from invoice_ocr_reconciler_spark.functions.text import (
            compression_ratio,
        )

        got = compression_ratio(self._df(spark, [(1, ""), (2, None)])).collect()
        assert all(r["compression_ratio"] is None and r["n_bytes"] == 0 for r in got)

    def test_partition_invariant(self, spark):
        from invoice_ocr_reconciler_spark.functions.text import (
            compression_ratio,
        )

        df = self._df(
            spark, [(i, f"doc {i} " + "tok " * (i % 9)) for i in range(40)]
        )
        a = sorted(map(tuple, compression_ratio(df.repartition(1)).collect()))
        b = sorted(map(tuple, compression_ratio(df.repartition(11)).collect()))
        assert a == b
