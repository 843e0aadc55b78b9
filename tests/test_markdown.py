"""HTML -> Markdown export + section chunking (functions/markdown.py)."""

from __future__ import annotations

from invoice_ocr_reconciler_spark.functions.markdown import (
    markdown_export,
    section_chunks,
)


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, html string")


def _md(spark, html):
    return markdown_export(_pages(spark, [("u", html)])).collect()[0][
        "markdown"
    ]


def test_element_mapping(spark):
    html = (
        "<html><body><h1>Title</h1><h3>Deep</h3>"
        "<p>plain <b>bold</b> and <em>it</em></p>"
        "<ul><li>one</li><li>two</li></ul>"
        '<p>see <a href="https://x/1">the doc</a></p>'
        "</body></html>"
    )
    md = _md(spark, html)
    assert "# Title" in md and "### Deep" in md
    assert "**bold**" in md and "*it*" in md
    assert "- one" in md and "- two" in md
    assert "[the doc](https://x/1)" in md
    assert "<" not in md  # every tag consumed


def test_subtree_drop_and_entities(spark):
    html = (
        "<nav><a href='/x'>home</a></nav>"
        "<script>var a=1;</script><style>p{}</style>"
        "<p>A &amp; B &lt;tag&gt; &quot;q&quot; &nbsp;x</p>"
    )
    md = _md(spark, html)
    assert "home" not in md and "var a" not in md
    assert 'A & B <tag> "q" x' in md


def test_nested_emphasis_in_heading(spark):
    md = _md(spark, "<h2>Sub <em>two</em> &amp; more</h2>")
    assert md == "## Sub *two* & more"


def test_whitespace_canonical_and_empty(spark):
    md = _md(spark, "<p>a</p>\n\n\n\n<p>b</p>")
    assert "\n\n\n" not in md
    assert _md(spark, "") == ""
    assert _md(spark, None) == ""


def test_sections_levels_and_preamble(spark):
    html = (
        "<p>preamble text</p>"
        "<h1>One</h1><p>alpha</p>"
        "<h2>Two</h2><p>beta</p><p>gamma</p>"
    )
    rows = sorted(
        section_chunks(_pages(spark, [("u", html)])).collect(),
        key=lambda r: r["sec_idx"],
    )
    assert [(r["level"], r["heading"]) for r in rows] == [
        (0, ""),
        (1, "One"),
        (2, "Two"),
    ]
    assert rows[0]["content"] == "preamble text"
    assert rows[1]["content"] == "alpha"
    assert rows[2]["content"] == "beta\n\ngamma"
    assert rows[2]["n_chars"] == len("beta\n\ngamma")
    assert [r["sec_idx"] for r in rows] == [0, 1, 2]


def test_sections_empty_preamble_dense_idx(spark):
    html = "<h1>Only</h1><p>body</p>"
    rows = section_chunks(_pages(spark, [("u", html)])).collect()
    assert len(rows) == 1
    assert rows[0]["sec_idx"] == 0 and rows[0]["level"] == 1
    assert rows[0]["content"] == "body"


def test_sections_heading_without_content(spark):
    html = "<h1>A</h1><h2>B</h2><p>tail</p>"
    rows = sorted(
        section_chunks(_pages(spark, [("u", html)])).collect(),
        key=lambda r: r["sec_idx"],
    )
    assert rows[0]["heading"] == "A" and rows[0]["content"] == ""
    assert rows[0]["n_chars"] == 0
    assert rows[1]["heading"] == "B" and rows[1]["content"] == "tail"


def test_binary_payload_and_determinism(spark):
    df = spark.createDataFrame(
        [("u", "<h1>T</h1><p>x</p>".encode())], "url string, html binary"
    )
    assert markdown_export(df).collect()[0]["markdown"] == "# T\n\nx"
    a = section_chunks(df).collect()
    b = section_chunks(df.repartition(4)).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
