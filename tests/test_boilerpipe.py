"""Boilerpipe NumWords/LinkDensity band (extraction/boilerpipe.py)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from invoice_ocr_reconciler_spark.extraction.boilerpipe import (
    _classify,
    boilerpipe_classify,
    extract_main_text_boilerpipe,
)


def _h(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:4], "big")


def test_classify_branch_matrix():
    # curr link density > 1/3 -> always boilerplate, whatever the context
    assert not _classify(12, 5, 100, 0, 100)
    # plain context (prev density <= 5/9): long current block -> content
    assert _classify(17, 0, 0, 0, 0)
    assert not _classify(16, 0, 0, 0, 0)  # threshold is strict >
    # plain context, short block: rescued by a long NEXT block
    assert _classify(5, 0, 0, 0, 16)
    assert not _classify(5, 0, 0, 0, 15)
    # plain context, short block: rescued by a non-trivial PREV block
    assert _classify(5, 0, 5, 0, 0)
    assert not _classify(5, 0, 4, 0, 0)
    # link-heavy context (prev density > 5/9): higher bars
    assert _classify(41, 0, 9, 6, 0)  # 9*6=54 > 5*9=45 -> heavy branch
    assert not _classify(40, 0, 9, 6, 0)
    assert _classify(10, 0, 9, 6, 18)
    assert not _classify(10, 0, 9, 6, 17)
    # empty block never keeps
    assert not _classify(0, 0, 100, 0, 100)


def test_spark_python_rule_parity(spark):
    # random-ish segment frames: the codegen keep column must equal the
    # pure-Python rule applied to the same lag/lead context
    rows = []
    for doc in range(8):
        n_seg = 3 + _h(f"n:{doc}") % 5
        for idx in range(n_seg):
            n_words = _h(f"w:{doc}:{idx}") % 50
            n_links = min(_h(f"l:{doc}:{idx}") % 20, n_words)
            toks = [f"http://x.example/{j}" for j in range(n_links)] + [
                f"w{j}" for j in range(n_words - n_links)
            ]
            rows.append((doc, idx, " ".join(toks)))
    df = spark.createDataFrame(rows, "doc_id int, chunk_id int, seg_text string")
    got = {
        (r["doc_id"], r["chunk_id"]): (
            r["n_words"], r["link_words"], r["keep"]
        )
        for r in boilerpipe_classify(df).collect()
    }
    # python reference over the same per-doc sequences
    by_doc: dict[int, list[tuple[int, int, int]]] = {}
    for doc, idx, text in rows:
        toks = text.split()
        links = sum(1 for t in toks if t.startswith("http://"))
        by_doc.setdefault(doc, []).append((idx, len(toks), links))
    for doc, segs in by_doc.items():
        segs.sort()
        for i, (idx, w, l) in enumerate(segs):
            pw, pl = (segs[i - 1][1], segs[i - 1][2]) if i > 0 else (0, 0)
            nw = segs[i + 1][1] if i + 1 < len(segs) else 0
            want = _classify(w, l, pw, pl, nw)
            assert got[(doc, idx)] == (w, l, want), (doc, idx)


def test_extractor_article_vs_nav():
    html = (
        "<html><body>"
        "<nav><a href='/a'>home</a> <a href='/b'>about</a> "
        "<a href='/c'>contact</a></nav>"
        "<p>" + " ".join(f"word{i}" for i in range(30)) + "</p>"
        "<p>" + " ".join(f"tail{i}" for i in range(25)) + "</p>"
        "<footer><a href='/t'>terms</a> <a href='/p'>privacy</a></footer>"
        "</body></html>"
    )
    out = extract_main_text_boilerpipe(html)
    assert "word0" in out and "tail0" in out
    assert "home" not in out and "terms" not in out


def test_extractor_pure_and_empty():
    assert extract_main_text_boilerpipe("") == ""
    html = "<p>" + " ".join(f"w{i}" for i in range(20)) + "</p>"
    assert extract_main_text_boilerpipe(html) == extract_main_text_boilerpipe(
        html
    )


def test_query_branch_variety(spark):
    # the driver-facing query must exercise both keep outcomes AND the
    # link-heavy-context branch (prev density > 5/9), or the oracle is
    # rubber-stamping a constant
    import __spark_entry__ as e

    df = e.queries()["boilerpipe_classify"](spark, "/root/testdata/sf0.001")
    agg = df.agg(
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("kept"),
        F.sum(F.when(~F.col("keep"), 1).otherwise(0)).alias("cut"),
        F.sum(
            F.when(
                F.lit(9) * F.col("prev_link_words")
                > F.lit(5) * F.col("prev_words"),
                1,
            ).otherwise(0)
        ).alias("heavy_ctx"),
        F.sum(F.when(F.col("link_words") > 0, 1).otherwise(0)).alias("linky"),
    ).collect()[0]
    assert agg["kept"] > 0 and agg["cut"] > 0
    assert agg["heavy_ctx"] > 0 and agg["linky"] > 0
