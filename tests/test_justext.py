"""justext-style classification (extraction/justext.py): Spark codegen
classifier vs the pure-Python rule, and the second extractor's behavior
on crafted boilerplate-heavy HTML."""

import random

from invoice_ocr_reconciler_spark.extraction.justext import (
    _classify_cf,
    _resolve_ctx,
    extract_main_text_justext,
    justext_classify,
)

GOOD_PARA = (
    "the project is aligned with the goals and the review of the plan "
    "that is agreed with the team is complete to the last detail"
)  # long + stopword-dense -> good
BAD_PARA = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda"
LINKY = "see http://ex.example/a http://ex.example/b http://ex.example/c ok"
SHORT = "the plan is agreed"  # < 40 chars, no links -> short


def _spark_classify(spark, docs):
    rows = [
        (doc_id, i, seg)
        for doc_id, segs in docs
        for i, seg in enumerate(segs)
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, seg_idx int, seg_text string"
    )
    out = justext_classify(df).collect()
    got = {}
    for r in out:
        got.setdefault(r["doc_id"], {})[r["seg_idx"]] = (
            r["cf_class"],
            r["final_class"],
        )
    return got


def _py_classify(segs):
    cf = []
    for s in segs:
        low = (s or "").lower()
        toks = [t for t in low.split() if t]
        import re

        from invoice_ocr_reconciler_spark.extraction.justext import (
            _STOP_RE,
            _URL_RE,
        )

        link_chars = sum(len(m) for m in _URL_RE.findall(s or ""))
        cf.append(
            _classify_cf(
                len(s or ""), len(toks), len(_STOP_RE.findall(low)), link_chars
            )
        )
    return list(zip(cf, _resolve_ctx(cf)))


def test_spark_matches_python_rule(spark):
    rng = random.Random(3)
    vocab = ["the", "and", "of", "row", "scan", "merge", "x", "http://a.ex/b"]
    docs = []
    for d in range(12):
        segs = [
            " ".join(rng.choice(vocab) for _ in range(rng.randrange(1, 30)))
            for _ in range(rng.randrange(1, 9))
        ]
        docs.append((f"d{d}", segs))
    docs.append(("fixed", [GOOD_PARA, SHORT, BAD_PARA, LINKY, GOOD_PARA]))
    got = _spark_classify(spark, docs)
    for doc_id, segs in docs:
        ref = _py_classify(segs)
        for i, (cf, fin) in enumerate(ref):
            assert got[doc_id][i] == (cf, fin), (doc_id, i, segs[i])


def test_context_propagation(spark):
    # short between two goods -> good; near-good after a good -> good;
    # short at document edge (prev treated as bad) -> bad
    segs = [GOOD_PARA, SHORT, GOOD_PARA]
    assert _py_classify(segs)[1][1] == "good"
    segs = [SHORT, GOOD_PARA]
    assert _py_classify(segs)[0][1] == "bad"
    got = _spark_classify(spark, [("a", [GOOD_PARA, SHORT, GOOD_PARA])])
    assert got["a"][1] == ("short", "good")


def test_extractor_drops_boilerplate_keeps_content():
    html = (
        "<html><body>"
        "<nav><a href='/x'>home</a> <a href='/y'>about</a> "
        "<a href='/z'>contact us now</a></nav>"
        f"<div><p>{GOOD_PARA}</p></div>"
        f"<div><p>{SHORT}</p></div>"
        f"<div><p>{GOOD_PARA} indeed and that is the point of it</p></div>"
        "<footer><a href='/t'>terms</a> <a href='/p'>privacy</a> "
        "<a href='/c'>cookies policy</a></footer>"
        "</body></html>"
    )
    out = extract_main_text_justext(html)
    assert GOOD_PARA in out
    assert SHORT in out  # sandwiched short promotes to good
    assert "home" not in out and "terms" not in out  # link-dense nav/footer


def test_extractor_compare_density_canary(spark):
    # extractor_compare is a rows-only driver entry (HTML parsing is not
    # SQL-expressible) — this test is its durable pin: the density
    # extractor must score EXACTLY 1.0 on the identity gold subset (the
    # byte-identity contract), and the justext policy must be a
    # high-precision subset of it, never degenerate
    import __spark_entry__ as e

    df = e.queries()["extractor_compare"](spark, "/root/testdata/sf0.001")
    rows = {r["extractor"]: r for r in df.collect()}
    assert rows["density"]["micro_f1"] == 1.0
    assert rows["density"]["micro_precision"] == 1.0
    assert rows["density"]["micro_recall"] == 1.0
    assert rows["justext"]["t_pred"] > 0
    assert rows["justext"]["micro_precision"] >= 0.9
    assert 0.05 < rows["justext"]["micro_recall"] < 1.0
    # third extractor (Arc90 readability): present and non-degenerate —
    # its keep rule is length/comma-driven, so on the plain synthetic
    # pages it must neither copy density (1.0) nor go to zero
    assert "readability" in rows
    assert rows["readability"]["t_pred"] > 0
    assert 0.0 < rows["readability"]["micro_f1"] <= 1.0
    # fourth extractor (boilerpipe NumWords/LinkDensity): present and
    # non-degenerate — its lag/lead tree keeps long plain blocks, so on
    # the synthetic pages it must produce output without copying density
    assert "boilerpipe" in rows
    assert rows["boilerpipe"]["t_pred"] > 0
    assert 0.0 < rows["boilerpipe"]["micro_f1"] <= 1.0


def test_extractor_pure_and_empty():
    assert extract_main_text_justext("") == ""
    html = f"<div><p>{GOOD_PARA}</p></div>"
    assert extract_main_text_justext(html) == extract_main_text_justext(html)
