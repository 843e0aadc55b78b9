"""hreflang alternate extraction (functions/html_meta.py)."""

from pyspark.sql import functions as F

from invoice_ocr_reconciler_spark.functions.html_meta import (
    hreflang_clusters,
    hreflang_pairs_col,
)


def _pairs(spark, html):
    df = spark.createDataFrame([(html,)], "html string")
    got = df.select(hreflang_pairs_col(F.col("html")).alias("p")).collect()
    return [(p.hreflang, p.href) for p in got[0].p]


def test_quote_styles_order_and_case(spark):
    html = (
        '<head>'
        '<link rel="alternate" hreflang="en" href="https://e/en">'
        "<link href='https://e/de' hreflang='de' rel=alternate>"
        '<LINK REL="ALTERNATE" HREFLANG="FR" HREF="https://e/fr">'
        '</head>'
    )
    assert _pairs(spark, html) == [
        ("en", "https://e/en"),
        ("de", "https://e/de"),
        ("fr", "https://e/fr"),  # hreflang lowercased
    ]


def test_non_alternate_and_incomplete_links_dropped(spark):
    html = (
        '<link rel="stylesheet" href="a.css">'
        '<link rel="alternate" hreflang="en">'       # no href
        '<link rel="alternate" href="https://e/x">'  # no hreflang
        '<link rel="alternate" hreflang="es" href="https://e/es">'
    )
    assert _pairs(spark, html) == [("es", "https://e/es")]


def test_cluster_key_prefers_x_default(spark):
    rows = [
        ("u1",
         '<link rel="alternate" hreflang="de" href="https://e/de">'
         '<link rel="alternate" hreflang="x-default" href="https://e/en">'),
        ("u2",
         '<link rel="alternate" hreflang="zz" href="https://e/zz">'
         '<link rel="alternate" hreflang="aa" href="https://e/aa">'),
    ]
    df = spark.createDataFrame(rows, "url string, html string")
    got = {(r.url, r.hreflang): r for r in hreflang_clusters(df).collect()}
    assert got[("u1", "de")].cluster_key == "https://e/en"
    assert got[("u1", "x-default")].is_default
    # no x-default -> min href
    assert got[("u2", "zz")].cluster_key == "https://e/aa"


def test_no_declarations_absent(spark):
    df = spark.createDataFrame(
        [("u", "<html><head></head></html>")], "url string, html string"
    )
    assert hreflang_clusters(df).count() == 0
