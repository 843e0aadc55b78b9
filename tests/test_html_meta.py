"""HTML head-metadata + table extraction (functions/html_meta.py)."""

from pyspark.sql import functions as F

from invoice_ocr_reconciler_spark.functions.html_meta import (
    decode_entities_col,
    extract_metadata,
    extract_tables,
    strip_tags_col,
)

_HTML = """<html lang="en-US"><head>
<title> Doc 1 &amp;  Co </title>
<meta content='D one' name=description>
<meta charset=UTF-8>
<link href="https://c.example/d/1" rel='canonical'>
<meta property="og:title" content="OG 1">
<meta name="robots" content="NOINDEX, nofollow">
<base href=/root/>
</head><body>
<table class=x><tr><th>Item</th><th> Amount </th></tr>
<tr><td><b>widget</b> &amp; sons</td><td>12.50</td></tr></table>
<p>no tables here</p>
<table><tr><td>solo</td></tr></table>
</body></html>"""

_HTML2 = (
    '<html><head><meta http-equiv="Content-Type" '
    'content="text/html; charset=iso-8859-1"></head><body>b</body></html>'
)


def _df(spark):
    return spark.createDataFrame(
        [("u1", _HTML), ("u2", _HTML2)], "url string, html string"
    )


class TestMetadata:
    def test_full_page(self, spark):
        got = {r["url"]: r for r in extract_metadata(_df(spark)).collect()}
        r = got["u1"]
        assert r["title"] == "Doc 1 & Co"  # entities + whitespace collapse
        assert r["description"] == "D one"  # single quotes, name last
        assert r["canonical"] == "https://c.example/d/1"
        assert r["charset"] == "utf-8"
        assert r["og_title"] == "OG 1"
        assert r["noindex"] and r["nofollow"]  # case-insensitive flags
        assert r["base_href"] == "/root/"  # unquoted value keeps '/'
        assert r["html_lang"] == "en-US"

    def test_absent_elements_null_and_equiv_charset(self, spark):
        r = {x["url"]: x for x in extract_metadata(_df(spark)).collect()}["u2"]
        assert r["title"] is None and r["description"] is None
        assert r["canonical"] is None and r["og_title"] is None
        assert not r["noindex"] and not r["nofollow"]
        assert r["charset"] == "iso-8859-1"  # http-equiv fallback

    def test_binary_html_column(self, spark):
        df = spark.createDataFrame(
            [("u", _HTML.encode())], "url string, html binary"
        )
        r = extract_metadata(df).collect()[0]
        assert r["title"] == "Doc 1 & Co"

    def test_amp_decodes_last(self, spark):
        df = spark.createDataFrame([("&amp;lt; &lt;",)], "t string")
        got = df.select(decode_entities_col(F.col("t")).alias("d")).collect()
        assert got[0]["d"] == "&lt; <"

    def test_strip_tags(self, spark):
        df = spark.createDataFrame([("<p>a  <b>b</b>\nc</p>",)], "t string")
        got = df.select(strip_tags_col(F.col("t")).alias("s")).collect()
        assert got[0]["s"] == "a b c"


class TestTables:
    def test_rows_cells_headers(self, spark):
        got = extract_tables(_df(spark)).orderBy(
            "url", "table_idx", "row_idx"
        ).collect()
        rows = [(r["url"], r["table_idx"], r["row_idx"], r["is_header"], r["cells"])
                for r in got]
        assert rows == [
            ("u1", 0, 0, True, ["Item", "Amount"]),
            ("u1", 0, 1, False, ["widget & sons", "12.50"]),
            ("u1", 1, 0, False, ["solo"]),
        ]

    def test_tableless_page_emits_nothing(self, spark):
        df = spark.createDataFrame([("u", "<html><p>x</p></html>")],
                                   "url string, html string")
        assert extract_tables(df).count() == 0

    def test_pure_codegen_no_python(self, spark):
        plan = (
            extract_metadata(_df(spark))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "EvalPython" not in plan
        plan2 = (
            extract_tables(_df(spark))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "EvalPython" not in plan2 and "Exchange" not in plan2


def test_extract_outline_rules(spark):
    from invoice_ocr_reconciler_spark.functions.html_meta import extract_outline

    pages = spark.createDataFrame(
        [
            (
                "u1",
                "<html><h1 id=t>One &amp; Two</h1><p>x</p>"
                "<H2>Upper <b>bold</b></H2>"
                "<h3>Three</h3><h4>not lifted</h4>"
                "<h2>Unclosed dangling"  # no close tag: not lifted
                "</html>",
            ),
            ("u2", "<p>no headings</p>"),
        ],
        "url string, html string",
    )
    got = [
        (r["pos"], r["level"], r["heading"])
        for r in extract_outline(pages).filter("url = 'u1'").orderBy("pos").collect()
    ]
    assert got == [
        (0, 1, "One & Two"),
        (1, 2, "Upper bold"),
        (2, 3, "Three"),
    ]
    assert extract_outline(pages).filter("url = 'u2'").count() == 0


def test_extract_outline_backreference_pins_close(spark):
    """</h2> cannot close an <h1>: the backreference forces matching
    levels, so a malformed pair is skipped, not mis-lifted."""
    from invoice_ocr_reconciler_spark.functions.html_meta import extract_outline

    pages = spark.createDataFrame(
        [("u", "<h1>bad</h2><h2>good</h2>")], "url string, html string"
    )
    got = [(r["level"], r["heading"]) for r in extract_outline(pages).collect()]
    assert got == [(2, "good")]


class TestAiOptout:
    def _run(self, spark, html, xrobots=None):
        from invoice_ocr_reconciler_spark.functions.html_meta import (
            ai_optout_cols,
        )
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [(html, xrobots)], "html string, xrobots string"
        )
        cols = ai_optout_cols(F.col("html"), F.col("xrobots"))
        return df.select(*[v.alias(k) for k, v in cols.items()]).collect()[0]

    def test_meta_noai_blocks_training(self, spark):
        r = self._run(spark, '<meta name="robots" content="noai">')
        assert r.noai and not r.train_ok and not r.noindex

    def test_attribute_order_and_quotes_and_case(self, spark):
        # content BEFORE name, single quotes, uppercase tokens
        r = self._run(spark, "<META CONTENT='NOINDEX,NOAI' NAME='robots'>")
        assert r.noindex and r.noai and not r.train_ok

    def test_header_channel_and_tdm(self, spark):
        r = self._run(spark, "<html></html>", xrobots="noai")
        assert r.noai and not r.train_ok
        r2 = self._run(
            spark, '<meta name="tdm-reservation" content="1">'
        )
        assert r2.tdm_reserved and not r2.train_ok and not r2.noai

    def test_clean_page_train_ok(self, spark):
        r = self._run(
            spark, '<meta name="robots" content="index, follow">'
        )
        assert r.train_ok and not r.noindex and not r.noai

    def test_noimageai_is_not_noai(self, spark):
        r = self._run(spark, '<meta name="robots" content="noimageai">')
        assert r.noimageai and not r.noai and r.train_ok

    def test_first_robots_tag_wins(self, spark):
        r = self._run(
            spark,
            '<meta name="robots" content="index">'
            '<meta name="robots" content="noai">',
        )
        assert not r.noai and r.train_ok


# ------------------------------------------------- image-caption pairs


def _cap_pages(spark):
    rows = [
        ("https://a.example/g/page.html",
         b'<html><img src="/img/1.jpg" alt="a red bicycle on grass">'
         b'<img src="th/2.png" alt="  spaced   caption  here ">'
         b'<img alt="no src attr">'
         b'<img src="https://cdn.example/3.webp" alt="x">'
         b'<img src="data:image/png;base64,AAAA" alt="inline data uri">'
         b'<img src="//cdn.example/4.gif" alt="protocol relative pic"></html>'),
        ("https://b.example/", b"<html><p>no images</p></html>"),
        ("https://c.example/x.html", None),
    ]
    return spark.createDataFrame(rows, "url string, html binary")


def test_image_caption_pairs_resolution_and_filters(spark):
    from invoice_ocr_reconciler_spark.operators.captions import (
        image_caption_pairs,
    )

    got = {
        r["img_pos"]: r
        for r in image_caption_pairs(_cap_pages(spark)).collect()
    }
    # kept: 1 (root-relative), 2 (dir-relative, ws-normalized), 6 (proto-rel)
    assert set(got) == {1, 2, 6}
    assert got[1]["img_url"] == "https://a.example/img/1.jpg"
    assert got[1]["caption"] == "a red bicycle on grass"
    assert got[2]["img_url"] == "https://a.example/g/th/2.png"
    assert got[2]["caption"] == "spaced caption here"
    assert got[6]["img_url"] == "https://cdn.example/4.gif"
    # dropped: no-src (3), short alt "x" (4), data: uri (5)


def test_image_caption_pairs_attribute_order_and_lengths(spark):
    from invoice_ocr_reconciler_spark.operators.captions import (
        image_caption_pairs,
    )

    rows = [
        ("https://a.example/p/",
         b'<img alt="alt before source works" src="/a.jpg">'
         b'<img src="/b.jpg" alt="' + b"y" * 600 + b'">'),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    out = image_caption_pairs(df).collect()
    assert len(out) == 1
    assert out[0]["caption"] == "alt before source works"
    assert out[0]["img_pos"] == 1  # position among ALL imgs, pre-filter


def test_image_caption_pairs_lazyload_and_pathless_url(spark):
    from invoice_ocr_reconciler_spark.operators.captions import (
        image_caption_pairs,
    )

    rows = [
        # data-src must not shadow the real src (or fake one when absent)
        ("https://a.example/p/",
         b'<img data-src="lazy.jpg" src="/real.jpg" alt="a sunny beach photo">'
         b'<img data-src="only-lazy.jpg" alt="lazy only image here">'),
        # pathless page url: relative src resolves to origin + '/'
        ("https://bare.example",
         b'<img src="logo.png" alt="company logo in header">'),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = {(r["url"], r["img_pos"]): r["img_url"]
           for r in image_caption_pairs(df).collect()}
    assert got[("https://a.example/p/", 1)] == "https://a.example/real.jpg"
    assert ("https://a.example/p/", 2) not in got  # no real src -> dropped
    assert got[("https://bare.example", 1)] == "https://bare.example/logo.png"


def test_extract_links_pathless_page_url(spark):
    from invoice_ocr_reconciler_spark.functions.urls import extract_links

    df = spark.createDataFrame(
        [("https://bare.example", b'<a href="about.html">about</a>')],
        "url string, html binary",
    )
    assert extract_links(df).collect()[0]["link"] == (
        "https://bare.example/about.html"
    )
