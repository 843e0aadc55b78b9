"""Web-quality heuristics (soft-404, readability, code detect, mojibake),
pagination-chain collapse, bitext candidate mining, WET export, snapshot
retention."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _apply(spark, rows, cols_fn, src_col="text"):
    df = _docs(spark, rows)
    cols = cols_fn(F.col(src_col))
    out = df.select("doc_id", *(cols[k].alias(k) for k in cols))
    return {r["doc_id"]: r.asDict() for r in out.collect()}


# ---------------------------------------------------------------- soft-404


def test_soft404_title_and_body_signals(spark):
    from invoice_ocr_reconciler_spark.functions.webquality import soft_404_cols

    long_body = " ".join(["word"] * 60)
    df = spark.createDataFrame(
        [
            (1, "404 Not Found", "nothing here"),          # title + thin
            (2, "Fine Title", "this page does not exist"),  # body + thin
            (3, "Error budget review", long_body),           # title only, long
            (4, "Fine Title", long_body),                    # clean
        ],
        "doc_id long, title string, body string",
    )
    cols = soft_404_cols(F.col("title"), F.col("body"))
    got = {
        r["doc_id"]: r.asDict()
        for r in df.select("doc_id", *(cols[k].alias(k) for k in cols)).collect()
    }
    assert got[1]["is_soft404"] and got[1]["soft404_score"] == 0.7
    # body phrase on a thin page: 0.3 + 0.2 = 0.5 -> flagged
    assert got[2]["is_soft404"] and got[2]["soft404_score"] == 0.5
    # error-ish title over a long body: title alone crosses 0.5
    assert got[3]["is_soft404"] and got[3]["title_hit"] == 1 and got[3]["thin"] == 0
    assert not got[4]["is_soft404"] and got[4]["soft404_score"] == 0.0


def test_soft404_404_is_word_bounded(spark):
    from invoice_ocr_reconciler_spark.functions.webquality import soft_404_cols

    long_body = " ".join(["word"] * 60)
    df = spark.createDataFrame(
        [(1, "Room 14042 directory", long_body)], "doc_id long, title string, body string"
    )
    cols = soft_404_cols(F.col("title"), F.col("body"))
    row = df.select(*(cols[k].alias(k) for k in cols)).collect()[0]
    assert row["title_hit"] == 0 and not row["is_soft404"]


# ---------------------------------------------------------------- readability


def test_readability_known_text(spark):
    from invoice_ocr_reconciler_spark.functions.webquality import readability_cols

    # "It is a day." -> 4 words, 1 sentence, vowel groups: I,i,a,ay = 4
    got = _apply(spark, [(1, "It is a day."), (2, "")], readability_cols)
    r = got[1]
    assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (4, 1, 4)
    wps, spw = 4.0, 1.0
    ease = 206.835 - 1.015 * wps - 84.6 * spw
    grade = 0.39 * wps + 11.8 * spw - 15.59
    assert abs(r["flesch_ease"] - round(ease, 4)) < 1e-9
    assert abs(r["fk_grade"] - round(grade, 4)) < 1e-9
    # empty text -> NULL scores, zero counts
    assert got[2]["flesch_ease"] is None and got[2]["fk_grade"] is None
    assert got[2]["n_words"] == 0


def test_readability_orders_polysyllabic_below_simple(spark):
    from invoice_ocr_reconciler_spark.functions.webquality import readability_cols

    got = _apply(
        spark,
        [
            (1, "The cat sat. The dog ran. It is fun."),
            (2, "Extraordinarily complicated vocabulary necessitates considerable comprehension."),
        ],
        readability_cols,
    )
    assert got[1]["flesch_ease"] > got[2]["flesch_ease"]
    assert got[1]["fk_grade"] < got[2]["fk_grade"]


# ---------------------------------------------------------------- code detect


def test_code_detect_splits_code_from_prose(spark):
    from invoice_ocr_reconciler_spark.functions.webquality import code_detect_cols

    code = "def f(x):\n  return x + 1;\nwhile (a < b) {\n\tb = a[0];\n}"
    prose = "the quick brown fox jumps over a lazy dog and keeps on running home"
    kw_prose = "the class will return for a while if things go well " + prose
    got = _apply(spark, [(1, code), (2, prose), (3, kw_prose), (4, "")], code_detect_cols)
    assert got[1]["is_code"] and got[1]["n_indented"] >= 2 and got[1]["n_symbols"] >= 10
    assert not got[2]["is_code"] and got[2]["code_score"] < 0.2
    # keyword-flavored prose: keywords alone must not flag
    assert not got[3]["is_code"] and got[3]["n_keywords"] >= 4
    assert not got[4]["is_code"] and got[4]["code_score"] == 0.0


# ---------------------------------------------------------------- mojibake


def test_mojibake_repair_and_count(spark):
    from invoice_ocr_reconciler_spark.functions.webquality import mojibake_cols

    got = _apply(
        spark,
        [
            (1, "CafÃ© â€œquoteâ€¦ Ã±oÃ±o menÃ¼ â€™s"),
            (2, "Café “quote…” ñoño menü ’s"),  # already clean: 0 fixes
            (3, "plain ascii text"),
        ],
        mojibake_cols,
    )
    assert got[1]["is_mojibake"] and got[1]["n_fixes"] == 7
    assert got[1]["fixed_text"] == "Café “quote… ñoño menü ’s"
    assert not got[2]["is_mojibake"] and got[2]["n_fixes"] == 0
    assert got[2]["fixed_text"] == "Café “quote…” ñoño menü ’s"
    assert not got[3]["is_mojibake"] and got[3]["fixed_text"] == "plain ascii text"


def test_mojibake_map_ordering_contract():
    # longer (3-byte) artifacts must precede 2-byte ones so a future
    # prefix-overlapping addition can't half-eat a longer artifact
    from invoice_ocr_reconciler_spark.functions.webquality import MOJIBAKE_MAP

    lengths = [len(a) for a, _ in MOJIBAKE_MAP]
    assert lengths == sorted(lengths, reverse=True)


# ---------------------------------------------------------------- pagination


def test_pagination_chains_collapse(spark):
    from invoice_ocr_reconciler_spark.functions.urls import pagination_chains

    pages = spark.createDataFrame(
        [
            ("https://a.example/cat?page=1",),
            ("https://a.example/cat?page=2",),
            ("https://a.example/cat?page=2",),  # re-crawl: captures+1, pages same
            ("https://a.example/cat?page=7",),
            ("https://b.example/list/page/3",),
            ("https://b.example/list/page/4",),
            ("https://c.example/x?p=2",),
            ("https://d.example/about",),  # unpaginated -> dropped
        ],
        "url string",
    )
    got = {r["chain_key"]: r.asDict() for r in pagination_chains(pages).collect()}
    a = got["https://a.example/cat?page=*"]
    assert (a["n_captures"], a["n_pages"], a["min_page"], a["max_page"]) == (4, 3, 1, 7)
    b = got["https://b.example/list/page/*"]
    assert (b["n_captures"], b["n_pages"], b["min_page"], b["max_page"]) == (2, 2, 3, 4)
    assert "https://c.example/x?p=*" in got
    assert len(got) == 3  # unpaginated url produced no chain


def test_pagination_chains_page_param_priority(spark):
    from invoice_ocr_reconciler_spark.functions.urls import pagination_chains

    # url carries BOTH ?page= and ?p= -> ?page= wins for number AND key
    pages = spark.createDataFrame(
        [("https://a.example/c?p=9&page=3",)], "url string"
    )
    rows = pagination_chains(pages).collect()
    assert rows[0]["chain_key"] == "https://a.example/c?p=9&page=*"
    assert rows[0]["min_page"] == 3


# ---------------------------------------------------------------- bitext


def test_bitext_candidates_pairs_and_filters(spark):
    from invoice_ocr_reconciler_spark.operators.bitext import bitext_candidates

    pages = spark.createDataFrame(
        [
            ("https://s.example/en/about", "en"),
            ("https://s.example/fr/about", "fr"),
            ("https://s.example/de/about", "de"),
            ("https://s.example/a?lang=en", "en"),
            ("https://s.example/a?lang=es", "es"),
            ("https://s.example/it/about", "fr"),   # marker/lang mismatch -> drop
            ("https://s.example/item/9", "en"),     # /it.../ NOT a lang segment
            ("https://s.example/plain", "en"),      # no marker -> drop
        ],
        "url string, lang string",
    )
    got = bitext_candidates(pages).collect()
    seg = sorted(
        (r["lang_a"], r["lang_b"]) for r in got if r["slot"].endswith("/*/about")
    )
    assert seg == [("de", "en"), ("de", "fr"), ("en", "fr")]
    qp = [(r["lang_a"], r["lang_b"]) for r in got if "lang=*" in r["slot"]]
    assert qp == [("en", "es")]
    assert all(r["lang_a"] < r["lang_b"] for r in got)
    assert len(got) == 4


# ---------------------------------------------------------------- WET export


def test_wet_export_record_bytes(spark):
    import datetime as dt

    from invoice_ocr_reconciler_spark.sources.warc import wet_export

    ts = dt.datetime(2024, 3, 5, 12, 34, 56)
    pages = spark.createDataFrame(
        [("https://w.example/1", ts, "héllo world"), ("https://w.example/2", ts, None)],
        "url string, warc_ts timestamp, text string",
    )
    got = {r["url"]: r.asDict() for r in wet_export(pages).collect()}
    text = "héllo world"
    digest = hashlib.md5(text.encode()).hexdigest()
    expected = (
        "WARC/1.0\r\nWARC-Type: conversion\r\n"
        "WARC-Target-URI: https://w.example/1\r\n"
        "WARC-Date: 2024-03-05T12:34:56Z\r\n"
        f"WARC-Block-Digest: md5:{digest}\r\n"
        f"Content-Length: {len(text.encode())}\r\n\r\n{text}\r\n\r\n"
    )
    r = got["https://w.example/1"]
    assert r["record"] == expected
    assert r["content_length"] == 12  # octet length, not char length
    assert r["digest"] == digest
    # NULL text -> empty conversion record, zero length
    r2 = got["https://w.example/2"]
    assert r2["content_length"] == 0
    assert r2["record"].endswith("Content-Length: 0\r\n\r\n\r\n\r\n")


# ---------------------------------------------------------------- retention


def test_snapshot_retention_split_and_tiebreak(spark):
    import datetime as dt

    from invoice_ocr_reconciler_spark.operators.diff import snapshot_retention

    t0 = dt.datetime(2024, 1, 1)
    h = dt.timedelta(hours=1)
    caps = spark.createDataFrame(
        [
            # url A: 5 captures -> keep 3, evict 2
            ("https://a/x", t0 + 0 * h, "d0"),
            ("https://a/x", t0 + 1 * h, "d1"),
            ("https://a/x", t0 + 2 * h, "d2"),
            ("https://a/x", t0 + 3 * h, "d3"),
            ("https://a/x", t0 + 4 * h, "d4"),
            # url B: 2 captures, same ts -> digest DESC breaks the tie
            ("https://b/y", t0, "zz"),
            ("https://b/y", t0, "aa"),
        ],
        "url string, warc_ts timestamp, digest string",
    )
    got = {r["url"]: r.asDict() for r in snapshot_retention(caps, keep=3).collect()}
    a = got["https://a/x"]
    assert (a["n_captures"], a["n_kept"], a["n_evicted"]) == (5, 3, 2)
    assert a["newest_ts"] == t0 + 4 * h and a["oldest_kept_ts"] == t0 + 2 * h
    b = got["https://b/y"]
    assert (b["n_kept"], b["n_evicted"]) == (2, 0)
    assert b["oldest_kept_ts"] == t0


# ------------------------------------------------------------- script mix


def test_script_mix_counts_and_dominant(spark):
    from invoice_ocr_reconciler_spark.functions.text import script_mix_cols
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [
            (0, "hello 世界 world"),          # latin 10, han 2 -> latin
            (1, "汉字文本流"),                 # han only
            (2, "данные data"),               # cyrillic 6, latin 4
            (3, "2024 بيانات"),               # digit 4, arabic 6 -> arabic
            (4, ""),                          # empty -> none
            (5, None),                        # null -> none
            (6, "ab кг"),                     # tie latin 2 == cyrillic 2
        ],
        "doc_id long, text string",
    )
    cols = script_mix_cols(F.col("text"))
    rows = {
        r["doc_id"]: r
        for r in docs.select(
            "doc_id", *[v.alias(k) for k, v in cols.items()]
        ).collect()
    }
    assert rows[0]["dominant_script"] == "latin"
    assert (rows[0]["n_latin"], rows[0]["n_han"]) == (10, 2)
    assert rows[1]["dominant_script"] == "han" and rows[1]["dominant_frac"] == 1.0
    assert rows[2]["dominant_script"] == "cyrillic"
    assert rows[3]["dominant_script"] == "arabic"
    assert (rows[3]["n_digit"], rows[3]["n_arabic"]) == (4, 6)
    for d in (4, 5):
        assert rows[d]["dominant_script"] == "none"
        assert rows[d]["dominant_frac"] == 0.0 and rows[d]["n_scripted"] == 0
    # ties break alphabetically: cyrillic < latin
    assert rows[6]["dominant_script"] == "cyrillic"
