"""HTML head-metadata + table extraction as pure codegen column exprs.

Structured complements to the mapInPandas main-content extractor
(extraction/html_extract.py): head metadata drives crawl/curation
decisions the text alone can't — ``canonical`` feeds URL dedup
(functions/urls.py:canonicalize_url_col collapses mirrors; the page's own
canonical link collapses share-URL duplicates), ``noindex/nofollow``
gate what a polite corpus may keep, ``charset``/``lang`` feed decode and
language routing — and ``extract_tables`` lifts the reference's
line-item idea (tabular invoice data inside documents) to arbitrary
HTML tables, the classic structured-data harvest over a web corpus.

Everything here stays inside whole-stage codegen: regexp_extract_all
over the raw html (one JVM pass per pattern), array filter/transform for
attribute-order-robust tag selection, no Python crossing. The parse is
the standard regex fast path with documented limits: attribute values
quoted with ' or " (or unquoted single tokens), entity decoding covers
the named basics (&amp; &lt; &gt; &quot; &#39; &apos; &nbsp;), and a
table nested inside a cell is swallowed into that cell's text (regex
table lifting — the usual trade for never shipping a DOM parser across
the corpus; route pathological pages to the Python extractor instead).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def decode_entities_col(col: Column) -> Column:
    """Named-basic HTML entity decode. &amp; decodes LAST so '&amp;lt;'
    yields the literal '&lt;' (single-pass semantics, no double decode)."""
    c = col
    for ent, rep in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&apos;", "'"),
        ("&nbsp;", " "),
        ("&amp;", "&"),
    ):
        c = F.replace(c, F.lit(ent), F.lit(rep))
    return c


def strip_tags_col(col: Column) -> Column:
    """Tags -> space, whitespace collapsed, entities decoded — the cell/
    title text cleaner."""
    no_tags = F.regexp_replace(col, r"<[^>]*>", " ")
    return F.trim(F.regexp_replace(decode_entities_col(no_tags), r"\s+", " "))


def _attr(tag: Column, name: str) -> Column:
    """Value of attribute ``name`` in one tag string: "v", 'v', or an
    unquoted token; NULL if absent or empty."""
    dq = F.regexp_extract(tag, rf"(?i)\b{name}\s*=\s*\"([^\"]*)\"", 1)
    sq = F.regexp_extract(tag, rf"(?i)\b{name}\s*=\s*'([^']*)'", 1)
    # unquoted values: HTML5 permits '/' inside them ('href=/a/>' is the
    # value '/a/'); they end only at whitespace, quotes, or '>'
    uq = F.regexp_extract(tag, rf"(?i)\b{name}\s*=\s*([^\s\"'>]+)", 1)
    return F.nullif(F.coalesce(F.nullif(dq, F.lit("")), F.nullif(sq, F.lit("")), uq), F.lit(""))


def _first_tag_where(tags: Column, attr: str, value: str) -> Column:
    """First tag in the array whose ``attr`` equals ``value``
    (case-insensitive, quote-style-agnostic)."""
    pat = rf"(?i)\b{attr}\s*=\s*[\"']?{value}\b"
    return F.try_element_at(
        F.filter(tags, lambda t: F.regexp_like(t, F.lit(pat))), F.lit(1)
    )


def metadata_cols(html: Column) -> dict[str, Column]:
    """The head-metadata column map; apply via ``extract_metadata``."""
    metas = F.regexp_extract_all(html, F.lit(r"(?i)<meta\b[^>]*>"), 0)
    links = F.regexp_extract_all(html, F.lit(r"(?i)<link\b[^>]*>"), 0)

    title_raw = F.regexp_extract(html, r"(?is)<title[^>]*>(.*?)</title>", 1)
    desc_tag = _first_tag_where(metas, "name", "description")
    og_tag = _first_tag_where(metas, "property", "og:title")
    robots_tag = _first_tag_where(metas, "name", "robots")
    canonical_tag = _first_tag_where(links, "rel", "canonical")
    base_tag = F.regexp_extract(html, r"(?i)(<base\b[^>]*>)", 1)
    html_tag = F.regexp_extract(html, r"(?i)(<html\b[^>]*>)", 1)

    # <meta charset=X> wins; else the http-equiv content-type's charset=
    charset_direct = F.regexp_extract(
        html, r"(?i)<meta\s+charset\s*=\s*[\"']?([A-Za-z0-9_.:-]+)", 1
    )
    ct_tag = _first_tag_where(metas, "http-equiv", "content-type")
    charset_equiv = F.regexp_extract(
        F.coalesce(_attr(ct_tag, "content"), F.lit("")),
        r"(?i)charset\s*=\s*([A-Za-z0-9_.:-]+)",
        1,
    )
    robots_content = F.lower(F.coalesce(_attr(robots_tag, "content"), F.lit("")))

    return {
        "title": F.nullif(strip_tags_col(title_raw), F.lit("")),
        "description": _attr(desc_tag, "content"),
        "canonical": _attr(canonical_tag, "href"),
        "charset": F.lower(
            F.coalesce(
                F.nullif(charset_direct, F.lit("")), F.nullif(charset_equiv, F.lit(""))
            )
        ),
        "og_title": _attr(og_tag, "content"),
        "noindex": robots_content.contains("noindex"),
        "nofollow": robots_content.contains("nofollow"),
        "base_href": _attr(base_tag, "href"),
        "html_lang": _attr(html_tag, "lang"),
    }


def extract_metadata(
    df: DataFrame, html_col: str = "html", prefix: str = ""
) -> DataFrame:
    """+ (title, description, canonical, charset, og_title, noindex,
    nofollow, base_href, html_lang) — one codegen pass, no shuffle.

    ``html_col`` may be string or binary (cast to string — the charset
    column is extracted BEFORE any transcode decision, which is its
    point). NULL where a page lacks the element."""
    html = F.col(html_col).cast("string")
    out = df
    for name, col in metadata_cols(html).items():
        out = out.withColumn(prefix + name, col)
    return out


def extract_tables(
    df: DataFrame,
    html_col: str = "html",
    keep_cols: tuple[str, ...] = ("url",),
) -> DataFrame:
    """One row per <tr> across all <table>s: (keep_cols..., table_idx,
    row_idx, is_header, cells array<string>).

    Shape: two posexplodes (tables, then rows) over codegen
    regexp_extract_all — fan-out is the page's own table volume, no
    shuffle, no Python. Cells are <td>/<th> bodies tag-stripped and
    entity-decoded; is_header marks rows containing any <th>. A nested
    table's markup collapses into the enclosing cell's text (documented
    regex-lift limit)."""
    html = F.col(html_col).cast("string")
    tables = F.regexp_extract_all(html, F.lit(r"(?is)<table\b.*?</table>"), 0)
    t = df.select(
        *keep_cols, F.posexplode(tables).alias("table_idx", "_tbl")
    )
    rows = F.regexp_extract_all(F.col("_tbl"), F.lit(r"(?is)<tr\b.*?</tr>"), 0)
    r = t.select(
        *keep_cols, "table_idx", F.posexplode(rows).alias("row_idx", "_row")
    )
    cells_raw = F.regexp_extract_all(
        F.col("_row"), F.lit(r"(?is)<t[dh]\b[^>]*>(.*?)</t[dh]>"), 1
    )
    return r.select(
        *keep_cols,
        "table_idx",
        "row_idx",
        F.regexp_like(F.col("_row"), F.lit(r"(?i)<th\b")).alias("is_header"),
        F.transform(cells_raw, strip_tags_col).alias("cells"),
    )


def extract_jsonld(
    pages: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    fields: tuple[str, ...] = ("@type", "name", "datePublished"),
) -> DataFrame:
    """Harvest schema.org JSON-LD blocks from page markup -> one row per
    block with requested fields lifted to columns.

    JSON-LD (`<script type="application/ld+json">`) is the richest
    structured layer of the public web (articles, products, orgs —
    Common Crawl ships it as a dedicated extract) and the natural
    web-scale generalization of the reference's field extraction: typed
    key/value facts per page instead of regex spans.

    Plan: ONE regexp_extract_all lifts every ld+json script body
    (case-insensitive, non-greedy to the matching close tag), posexplode
    keeps block order, get_json_object pulls each requested field — all
    whole-stage codegen, no Python, no shuffle. Malformed JSON yields
    NULL fields (get_json_object semantics) rather than dropping the row,
    so coverage metrics stay honest. A block holding a JSON *array* of
    entities is kept as one row with NULL lifted fields (documented regex
    trade-off; route those to a mapInPandas json.loads pass if they
    matter — same split as extract_tables vs the DOM parser).
    """
    if isinstance(html_col, str):
        html = F.col(html_col)
    else:
        html = html_col
    html = html.cast("string")
    blocks = F.expr(
        f"regexp_extract_all(CAST({html_col} AS STRING), "
        r"'(?is)<script[^>]*type\\s*=\\s*.application/ld\\+json.[^>]*>(.*?)</script>', 1)"
    )
    ex = pages.select(
        F.col(url_col).alias("url"),
        F.posexplode(blocks).alias("block_idx", "block"),
    )
    cols = [
        F.get_json_object(F.col("block"), f"$['{f}']").alias(
            f.lstrip("@").replace(":", "_")
        )
        for f in fields
    ]
    return ex.select("url", "block_idx", *cols)


def extract_outline(
    pages: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    max_level: int = 3,
) -> DataFrame:
    """Heading outline per page -> (url, pos, level, heading).

    The h1-h{max_level} skeleton in document order — what section-aware
    chunking wants (split training chunks at heading boundaries instead
    of mid-section; pair with operators/chunking) and the cheapest
    at-scale summary of what a page is ABOUT after the title.

    One regexp_extract_all lifts whole heading elements (case-
    insensitive, attribute-tolerant, non-greedy to the matching close
    tag — a backreference pins </hN> to the opening level, so an h2
    inside nonsense markup can't close an h1); per-element level and
    tag-stripped entity-decoded text come from codegen array transforms;
    posexplode keeps document order. Zero Python, zero exchanges.
    """
    html = F.col(html_col).cast("string")
    tags = F.expr(
        f"regexp_extract_all(CAST({html_col} AS STRING), "
        rf"'(?is)<h([1-{max_level}])[^>]*>(.*?)</h\\1\\s*>', 0)"
    )
    ex = pages.select(
        F.col(url_col).alias("url"),
        F.posexplode(tags).alias("pos", "_tag"),
    )
    level = F.substring(F.col("_tag"), 3, 1).cast("int")
    inner = F.regexp_replace(
        F.col("_tag"), r"(?is)^<h[0-9][^>]*>|</h[0-9]\s*>$", ""
    )
    return ex.select(
        "url",
        "pos",
        level.alias("level"),
        strip_tags_col(inner).alias("heading"),
    )


def ai_optout_cols(html: Column, xrobots: Column) -> dict[str, Column]:
    """Page-level opt-out directives a compliant training pipeline must
    honor before a document may enter a corpus: ``<meta name="robots">``
    tokens (noindex / nofollow / noai / noimageai), the ``X-Robots-Tag``
    response header (same token vocabulary, header-delivered), and the
    TDM Reservation Protocol meta (``tdm-reservation`` content "1").

    ``train_ok`` is the release decision: False when noai is asserted in
    either channel or the TDM reservation is set. ``noindex`` gates
    search-index use separately (a page may be indexable but opted out
    of training, and vice versa).

    Pure codegen: the same one-pass meta-tag harvest as metadata_cols
    (first matching tag wins, attribute-order/quote-style agnostic),
    token tests as substring checks over the lowercased directive
    string. No shuffle, no Python.
    """
    metas = F.regexp_extract_all(html, F.lit(r"(?i)<meta\b[^>]*>"), 0)
    robots_tag = _first_tag_where(metas, "name", "robots")
    tdm_tag = _first_tag_where(metas, "name", "tdm-reservation")
    meta_directives = F.lower(F.coalesce(_attr(robots_tag, "content"), F.lit("")))
    header_directives = F.lower(F.coalesce(xrobots, F.lit("")))
    directives = F.concat_ws(",", meta_directives, header_directives)
    tdm_reserved = (
        F.coalesce(_attr(tdm_tag, "content"), F.lit("")) == F.lit("1")
    )
    noai = directives.contains("noai")
    return {
        "noindex": directives.contains("noindex"),
        "nofollow": directives.contains("nofollow"),
        "noai": noai,
        "noimageai": directives.contains("noimageai"),
        "tdm_reserved": tdm_reserved,
        "train_ok": ~(noai | tdm_reserved),
    }


def hreflang_pairs_col(html: Column) -> Column:
    """Array of (hreflang, href) structs from the page's
    ``<link rel="alternate" hreflang=...>`` tags — the i18n alternate
    declarations that tie translated versions of a page together (Google
    'localized versions' protocol; 'x-default' marks the fallback).

    Same parsing contract as metadata_cols: tag harvest by one
    regexp_extract_all, per-tag attribute extraction through _attr
    (quote-style/order/case agnostic), entries missing either attribute
    dropped. Pure codegen.
    """
    tags = F.regexp_extract_all(
        F.coalesce(html, F.lit("")), F.lit(r"(?i)(<link\b[^>]*>)"), 1
    )
    alts = F.filter(
        tags,
        lambda t: F.regexp_like(
            t, F.lit(r"(?i)\brel\s*=\s*[\"']?alternate\b")
        )
        & _attr(t, "hreflang").isNotNull()
        & _attr(t, "href").isNotNull(),
    )
    return F.transform(
        alts,
        lambda t: F.struct(
            F.lower(_attr(t, "hreflang")).alias("hreflang"),
            _attr(t, "href").alias("href"),
        ),
    )


def hreflang_clusters(
    pages: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
) -> DataFrame:
    """Exploded, cluster-keyed hreflang pairs: every (page, hreflang,
    href) declaration plus the page's cluster_key — the x-default href
    when declared, else the lexicographic min alternate href (both
    derivable from the page's OWN array: no join, no shuffle beyond the
    final order). Pages without declarations are absent (they cluster as
    themselves trivially downstream).

    Output: (url, hreflang, href, is_default, cluster_key).
    """
    arr = hreflang_pairs_col(F.col(html_col))
    xd = F.try_element_at(
        F.filter(arr, lambda p: p["hreflang"] == "x-default"), F.lit(1)
    )["href"]
    ck = F.coalesce(
        xd, F.array_min(F.transform(arr, lambda p: p["href"]))
    )
    return (
        pages.select(
            F.col(url_col).alias("url"),
            F.explode(arr).alias("p"),
            ck.alias("cluster_key"),
        )
        .select(
            "url",
            F.col("p.hreflang").alias("hreflang"),
            F.col("p.href").alias("href"),
            (F.col("p.hreflang") == "x-default").alias("is_default"),
            "cluster_key",
        )
        .orderBy("url", "hreflang", "href")
    )
