"""robots.txt politeness rules as DataFrame operators (RFC 9309).

The crawl tier's missing-piece next to crawl_frontier/fetch_schedule
(operators/graph.py): which frontier targets is the crawler ALLOWED to
fetch, and at what per-host delay? The reference pipeline fetches invoice
pages it is handed (no crawler, so no direct reference analog); this is
the standard Robots Exclusion Protocol semantics every polite web-scale
crawler applies between frontier derivation and scheduling.

Semantics implemented (RFC 9309 + the de-facto Google extensions):

  - line grammar: ``key: value``, ``#`` comments stripped, keys matched
    case-insensitively, blank/unknown lines skipped.
  - ``Sitemap`` lines are group-independent (RFC 9309 §2.3) and surface
    as ``rule='sitemap'`` rows regardless of agent selection — the crawl
    seeding signal.
  - groups: one or more consecutive ``User-agent`` lines followed by
    rule lines form a group; rules before any User-agent line are
    ignored.
  - group selection: groups naming the crawler's token (case-insensitive
    exact match) take precedence; only if NO group names it do the ``*``
    groups apply. All selected groups' rules merge.
  - rule matching: a rule path matches a URL path by prefix; ``*`` is a
    wildcard, a terminal ``$`` anchors the end. Longest (most-specific)
    match wins; at equal specificity ``Allow`` wins. No matching rule =>
    allowed. An empty ``Disallow:`` is a no-op (allow all).
  - ``Crawl-delay`` (non-RFC but ubiquitous): per selected group; the
    minimum across selected groups is reported.

Scale shape: parse_robots is per-host-local (posexplode of a bounded
robots file + windows partitioned by host — one exchange at HOST
cardinality, ~10^7 rows for the whole web, never corpus-sized);
``rules_cap`` bounds adversarial megabyte robots files the same way
HOT_BUCKET_CAP bounds degenerate dedup buckets. robots_filter collapses
the rules to ONE sorted array row per host and broadcast-joins it to the
frontier: the corpus-sized side sees a map-side join plus a per-row
array scan — no shuffle, no explode, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from invoice_ocr_reconciler_spark.functions.urls import host_of_url_col

# An adversarial/broken robots.txt can hold millions of rules; past this
# cap the tail is dropped (rules are order-capped, so the file's leading
# rules — the ones human-authored files put first — survive).
ROBOTS_RULES_CAP = 512

_KEYS = ("user-agent", "allow", "disallow", "crawl-delay", "sitemap")


def parse_robots(
    robots: DataFrame,
    host_col: str = "host",
    text_col: str = "robots_txt",
    agent: str = "*",
    rules_cap: int = ROBOTS_RULES_CAP,
) -> DataFrame:
    """Parse per-host robots.txt bodies into the rule rows that apply to
    ``agent``.

    -> (host, pos, rule in ('allow','disallow','crawl-delay','sitemap'),
        path, spec_len, anchored, wild, rx, crawl_delay)

    ``path`` is the verbatim rule value; ``rx`` is a precompiled regex
    (NULL for plain-prefix rules) so the apply step never rebuilds
    patterns per frontier row; ``spec_len`` is the specificity used for
    longest-match. crawl-delay rows carry path='' and the parsed delay.
    Everything is codegen column expressions — no Python crossing.
    """
    host = F.col(host_col)
    lines = robots.select(
        host.alias("host"),
        F.posexplode(F.split(F.col(text_col), r"\r?\n")).alias("pos", "raw"),
    )
    line = F.trim(F.regexp_replace(F.col("raw"), r"#.*$", ""))
    key = F.lower(F.trim(F.regexp_extract(line, r"^([^:]+):", 1)))
    val = F.trim(F.regexp_extract(line, r"^[^:]+:(.*)$", 1))
    parsed = (
        lines.select("host", "pos", key.alias("key"), val.alias("val"))
        .filter(F.col("key").isin(*_KEYS))
    )

    w_host = Window.partitionBy("host").orderBy("pos")
    is_ua = F.col("key") == "user-agent"
    run_start = is_ua & ~F.coalesce(F.lag(is_ua).over(w_host), F.lit(False))
    grouped = parsed.withColumn(
        "group_id",
        F.sum(run_start.cast("int")).over(
            w_host.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )

    ua_tok = F.when(is_ua, F.lower(F.col("val")))
    named = (ua_tok == agent.lower()).cast("int")
    star = (ua_tok == "*").cast("int")
    w_grp = Window.partitionBy("host", "group_id")
    w_all = Window.partitionBy("host")
    flagged = (
        grouped.withColumn(
            "grp_named", F.max(F.coalesce(named, F.lit(0))).over(w_grp)
        )
        .withColumn("grp_star", F.max(F.coalesce(star, F.lit(0))).over(w_grp))
        .withColumn("host_named", F.max(F.coalesce(named, F.lit(0))).over(w_all))
    )
    selected = (F.col("group_id") > 0) & (
        (F.col("grp_named") == 1)
        | ((F.col("host_named") == 0) & (F.col("grp_star") == 1))
    )
    # Sitemap lines are group-INDEPENDENT per RFC 9309 §2.3 (they may sit
    # outside any group and apply regardless of agent selection)
    is_map = F.col("key") == "sitemap"
    rules = flagged.filter((selected & ~is_ua) | is_map)

    is_delay = F.col("key") == "crawl-delay"
    # empty Allow/Disallow/Sitemap values are explicit no-ops per RFC 9309
    rules = rules.filter(is_delay | (F.col("val") != ""))
    rules = rules.withColumn(
        "_rn", F.row_number().over(Window.partitionBy("host").orderBy("pos"))
    ).filter(F.col("_rn") <= int(rules_cap))

    is_rule = ~is_delay & ~is_map
    anchored = is_rule & F.col("val").endswith("$")
    base = F.when(
        anchored, F.expr("substring(val, 1, length(val) - 1)")
    ).otherwise(F.col("val"))
    wild = is_rule & base.contains("*")
    # regex-escape the literal portion, then '*' -> '.*'; anchor start
    esc = F.regexp_replace(base, r"([.^$+?(){}\[\]\\|])", r"\\$1")
    rx = F.when(
        wild,
        F.concat(
            F.lit("^"),
            F.regexp_replace(esc, r"\*", ".*"),
            F.when(anchored, F.lit("$")).otherwise(F.lit("")),
        ),
    )
    return rules.select(
        "host",
        "pos",
        F.col("key").alias("rule"),
        F.when(is_delay, F.lit("")).otherwise(F.col("val")).alias("path"),
        F.when(is_rule, F.length(base)).otherwise(F.lit(0)).alias("spec_len"),
        F.coalesce(anchored, F.lit(False)).alias("anchored"),
        F.coalesce(wild, F.lit(False)).alias("wild"),
        F.when(is_rule, base).alias("base"),
        rx.alias("rx"),
        F.when(is_delay, F.expr("try_cast(val AS DOUBLE)")).alias("crawl_delay"),
    )


def url_path_col(url) -> "F.Column":
    """Path+query of a URL ('' fragment cut, '/' when absent) — the
    string robots rules match against."""
    p = F.regexp_extract(url, r"^(?i)https?://[^/?#]+([^#]*)", 1)
    return F.when(p == "", F.lit("/")).otherwise(p)


def robots_filter(
    frontier: DataFrame,
    rules: DataFrame,
    url_col: str = "link",
    keep_denied: bool = False,
    broadcast_rules: bool = True,
) -> DataFrame:
    """Apply parse_robots output to a frontier: + (allowed, matched_path,
    crawl_delay).

    The rules frame is collapsed to one row per host holding the rule
    array pre-sorted by (specificity desc, allow-before-disallow, file
    order) and (by default) BROADCAST — the frontier side is a map-side
    join plus a per-row scan of a <=rules_cap array: zero exchanges on
    the corpus-sized side. Matching picks the array's first hit, which by
    the sort order IS the RFC winner (longest match, Allow on ties).
    keep_denied=True annotates instead of filtering.

    ``broadcast_rules``: the collapsed frame is HOST-cardinality; for a
    crawl restricted to thousands-to-millions of hosts it broadcasts in
    megabytes, but a full-web rules table (10^8+ hosts x capped arrays)
    exceeds broadcast limits — pass False to degrade both joins to
    shuffle hash joins on host (the frontier is already skew-managed per
    host downstream, so the host key is safe to exchange on).
    """
    path_rules = rules.filter(F.col("rule").isin("allow", "disallow"))
    arr = (
        path_rules.withColumnRenamed("host", "_arr_host")
        .groupBy("_arr_host")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        (-F.col("spec_len")).alias("neg_len"),
                        F.col("rule").alias("rule"),  # 'allow' < 'disallow'
                        F.col("pos").alias("pos"),
                        F.col("path").alias("path"),
                        F.col("base").alias("base"),
                        F.col("anchored").alias("anchored"),
                        F.col("wild").alias("wild"),
                        F.col("rx").alias("rx"),
                    )
                )
            ).alias("rules")
        )
    )
    delays = (
        rules.filter(F.col("rule") == "crawl-delay")
        .withColumnRenamed("host", "_dly_host")
        .groupBy("_dly_host")
        .agg(F.min("crawl_delay").alias("crawl_delay"))
    )

    if broadcast_rules:
        arr, delays = F.broadcast(arr), F.broadcast(delays)

    url = F.col(url_col)
    annotated = (
        frontier.withColumn("_rf_host", host_of_url_col(url))
        .withColumn("_rf_path", url_path_col(url))
        .join(arr, F.col("_rf_host") == F.col("_arr_host"), "left")
        .join(delays, F.col("_rf_host") == F.col("_dly_host"), "left")
    )
    p = F.col("_rf_path")
    match = F.try_element_at(
        F.filter(
            F.coalesce(F.col("rules"), F.array()),
            lambda x: F.when(x["wild"], F.regexp_like(p, x["rx"])).otherwise(
                F.when(x["anchored"], p == x["base"]).otherwise(
                    F.startswith(p, x["base"])
                )
            ),
        ),
        F.lit(1),
    )
    out = annotated.withColumn(
        "allowed", match.isNull() | (match["rule"] == "allow")
    ).withColumn("matched_path", match["path"])
    if not keep_denied:
        out = out.filter(F.col("allowed"))
    return out.drop("rules", "_rf_host", "_rf_path", "_arr_host", "_dly_host")


def parse_sitemaps(
    sitemaps: DataFrame,
    source_col: str = "sitemap_url",
    text_col: str = "body",
    urls_cap: int = 50_000,
) -> DataFrame:
    """Sitemap XML -> seed URLs: one row per <url> entry (or per nested
    <sitemap> index entry) across all fetched sitemap bodies.

    -> (source, kind in ('url','index'), loc, lastmod, priority)

    The crawl-seeding closure over parse_robots' Sitemap directives:
    fetch each advertised sitemap, run its body through this, feed 'url'
    rows to the frontier and 'index' rows back to the fetch queue
    (sitemap index files nest one level, per the sitemaps.org protocol).

    Codegen shape: regexp_extract_all of the <url>/<sitemap> blocks
    (``<url\b`` cannot match the <urlset> container), one posexplode
    bounded by ``urls_cap`` per file — the protocol itself caps a sitemap
    at 50,000 entries, so larger files are violations and get their tail
    dropped (the rules_cap contract) — then per-block tag pulls. <loc>
    values decode the named-basic entity set (sitemaps.org requires
    entity-escaped URLs; &amp; is the common one). Entries without a
    <loc> are protocol violations and are dropped. No Python, no shuffle.
    """
    from invoice_ocr_reconciler_spark.functions.html_meta import (
        decode_entities_col,
    )

    body = F.col(text_col).cast("string")

    def blocks(tag_name: str, kind: str):
        arr = F.regexp_extract_all(
            body, F.lit(rf"(?is)<{tag_name}\b[^>]*>(.*?)</{tag_name}>"), 1
        )
        return F.transform(
            F.slice(arr, 1, int(urls_cap)),
            lambda b: F.struct(F.lit(kind).alias("kind"), b.alias("blk")),
        )

    tagged = F.concat(blocks("url", "url"), blocks("sitemap", "index"))
    exploded = sitemaps.select(
        F.col(source_col).alias("source"), F.posexplode(tagged).alias("_i", "t")
    )

    def tag(name: str):
        return F.nullif(
            F.trim(
                decode_entities_col(
                    F.regexp_extract(
                        F.col("t")["blk"], rf"(?is)<{name}[^>]*>(.*?)</{name}>", 1
                    )
                )
            ),
            F.lit(""),
        )

    return (
        exploded.select(
            "source",
            F.col("t")["kind"].alias("kind"),
            tag("loc").alias("loc"),
            tag("lastmod").alias("lastmod"),
            tag("priority").alias("_p"),
        )
        .withColumn("priority", F.expr("try_cast(_p AS DOUBLE)"))
        .filter(F.col("loc").isNotNull())
        .drop("_p")
    )


def parse_feeds(
    feeds: DataFrame,
    source_col: str = "feed_url",
    text_col: str = "body",
    items_cap: int = 10_000,
) -> DataFrame:
    """RSS 2.0 / Atom feed XML -> discovered entries: one row per
    <item> (RSS) or <entry> (Atom) across all fetched feed bodies.

    -> (source, kind in ('rss','atom'), item_idx, link, title, published)

    The third crawl-seeding channel next to robots Sitemap directives and
    sitemap files: feeds surface NEW urls hours before sitemaps regenerate,
    so freshness-sensitive crawls poll them. Field mapping:
      RSS:  <link>L</link>, <title>T</title>, <pubDate>D</pubDate>
      Atom: <link href="L"/> (any attr order/quoting), <title>, <updated>

    Codegen shape (the parse_sitemaps contract): regexp_extract_all of
    item/entry blocks (``<item\\b``/``<entry\\b`` cannot match container
    tags), per-feed cap (items_cap — feeds past it are violations, tail
    dropped), posexplode with the within-feed index, per-block tag pulls
    with named-basic entity decode. Entries without a link are dropped
    (nothing to crawl). No Python, no shuffle.
    """
    from invoice_ocr_reconciler_spark.functions.html_meta import (
        _attr,
        decode_entities_col,
    )

    body = F.col(text_col).cast("string")

    def blocks(tag_name: str, kind: str):
        arr = F.regexp_extract_all(
            body, F.lit(rf"(?is)<{tag_name}\b[^>]*>(.*?)</{tag_name}>"), 1
        )
        return F.transform(
            F.slice(arr, 1, int(items_cap)),
            lambda b: F.struct(F.lit(kind).alias("kind"), b.alias("blk")),
        )

    tagged = F.concat(blocks("item", "rss"), blocks("entry", "atom"))
    ex = feeds.select(
        F.col(source_col).alias("source"),
        F.posexplode(tagged).alias("item_idx", "t"),
    ).select("source", "item_idx", F.col("t.kind").alias("kind"), F.col("t.blk").alias("blk"))

    blk = F.col("blk")
    rss_link = F.regexp_extract(blk, r"(?is)<link[^>]*>(.*?)</link>", 1)
    atom_link_tag = F.regexp_extract(blk, r"(?is)<link\b[^>]*/?>", 0)
    link = F.when(F.col("kind") == "rss", rss_link).otherwise(
        _attr(atom_link_tag, "href")
    )
    title = F.regexp_extract(blk, r"(?is)<title[^>]*>(.*?)</title>", 1)
    published = F.when(
        F.col("kind") == "rss",
        F.regexp_extract(blk, r"(?is)<pubDate[^>]*>(.*?)</pubDate>", 1),
    ).otherwise(F.regexp_extract(blk, r"(?is)<updated[^>]*>(.*?)</updated>", 1))
    out = ex.select(
        "source",
        "kind",
        "item_idx",
        F.trim(decode_entities_col(link)).alias("link"),
        F.trim(decode_entities_col(title)).alias("title"),
        F.when(F.trim(published) != "", F.trim(published)).alias("published"),
    )
    return out.filter(F.col("link") != "")
