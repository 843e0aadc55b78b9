"""RFC 9309 robots.txt parser + filter semantics (operators/robots.py)."""

from pyspark.sql import functions as F

from invoice_ocr_reconciler_spark.operators.robots import (
    parse_robots,
    robots_filter,
)


def _robots(spark, *pairs):
    return spark.createDataFrame(
        list(pairs), "host string, robots_txt string"
    )


def _apply(spark, rules, links):
    fr = spark.createDataFrame([(u,) for u in links], "link string")
    rows = (
        robots_filter(fr, rules, keep_denied=True)
        .orderBy("link")
        .collect()
    )
    return {r["link"]: r for r in rows}


class TestParseRobots:
    def test_consecutive_ua_lines_share_rules(self, spark):
        txt = "User-agent: abot\nUser-agent: bbot\nDisallow: /x/"
        for agent in ("abot", "bbot"):
            got = parse_robots(_robots(spark, ("h", txt)), agent=agent).collect()
            assert [(r["rule"], r["path"]) for r in got] == [("disallow", "/x/")]

    def test_rules_before_any_group_ignored(self, spark):
        txt = "Disallow: /orphan/\nUser-agent: *\nDisallow: /x/"
        got = parse_robots(_robots(spark, ("h", txt))).collect()
        assert [r["path"] for r in got] == ["/x/"]

    def test_named_group_precedence_over_star(self, spark):
        txt = "User-agent: *\nDisallow: /a/\nCrawl-delay: 9\n\nUser-agent: GraftBot\nDisallow: /b/"
        got = parse_robots(_robots(spark, ("h", txt)), agent="graftbot").collect()
        assert [(r["rule"], r["path"]) for r in got] == [("disallow", "/b/")]

    def test_star_fallback_when_agent_unnamed(self, spark):
        txt = "User-agent: other\nDisallow: /o/\n\nUser-agent: *\nDisallow: /s/"
        got = parse_robots(_robots(spark, ("h", txt)), agent="graftbot").collect()
        assert [r["path"] for r in got] == ["/s/"]

    def test_comments_blanks_unknown_keys_skipped(self, spark):
        txt = "# hi\nUser-agent: * # star\n\nDisallow: /x/ # tail\nHost: h"
        got = parse_robots(_robots(spark, ("h", txt))).collect()
        assert [r["path"] for r in got] == ["/x/"]

    def test_sitemap_lines_group_independent(self, spark):
        # before any group, and inside a non-matching group: both surface
        txt = (
            "Sitemap: https://h/s1.xml\nUser-agent: other\nDisallow: /o/\n"
            "Sitemap: https://h/s2.xml\nUser-agent: *\nDisallow: /x/"
        )
        got = parse_robots(_robots(spark, ("h", txt)), agent="graftbot").collect()
        by_rule = {}
        for r in got:
            by_rule.setdefault(r["rule"], []).append(r["path"])
        assert sorted(by_rule["sitemap"]) == [
            "https://h/s1.xml", "https://h/s2.xml"
        ]
        assert by_rule["disallow"] == ["/x/"]  # group selection unaffected

    def test_empty_disallow_is_noop_and_bad_delay_null(self, spark):
        txt = "User-agent: *\nDisallow:\nCrawl-delay: soon"
        got = parse_robots(_robots(spark, ("h", txt))).collect()
        assert len(got) == 1
        assert got[0]["rule"] == "crawl-delay"
        assert got[0]["crawl_delay"] is None

    def test_rules_cap_keeps_leading_rules(self, spark):
        txt = "User-agent: *\n" + "\n".join(
            f"Disallow: /p{i}/" for i in range(10)
        )
        got = parse_robots(_robots(spark, ("h", txt)), rules_cap=3).collect()
        assert [r["path"] for r in got] == ["/p0/", "/p1/", "/p2/"]

    def test_wildcard_and_anchor_compile(self, spark):
        txt = "User-agent: *\nDisallow: /a/*/b$\nDisallow: /c.d/"
        got = {r["path"]: r for r in parse_robots(_robots(spark, ("h", txt))).collect()}
        assert got["/a/*/b$"]["wild"] and got["/a/*/b$"]["anchored"]
        assert got["/a/*/b$"]["rx"] == "^/a/.*/b$"
        assert not got["/c.d/"]["wild"] and got["/c.d/"]["rx"] is None


class TestRobotsFilter:
    def test_longest_match_allow_wins_and_defaults(self, spark):
        txt = (
            "User-agent: *\nDisallow: /tmp\nAllow: /tmp/public/\n"
            "Disallow: /*.pdf$\nCrawl-delay: 2"
        )
        rules = parse_robots(_robots(spark, ("h.example", txt)))
        got = _apply(
            spark,
            rules,
            [
                "https://h.example/tmp",
                "https://h.example/tmp/public/a",
                "https://h.example/x.pdf",
                "https://h.example/x.pdfz",
                "https://h.example/free",
                "https://other.example/tmp",
            ],
        )
        assert not got["https://h.example/tmp"]["allowed"]
        assert got["https://h.example/tmp/public/a"]["allowed"]
        assert got["https://h.example/tmp/public/a"]["matched_path"] == "/tmp/public/"
        assert not got["https://h.example/x.pdf"]["allowed"]
        assert got["https://h.example/x.pdfz"]["allowed"]  # $ anchor
        assert got["https://h.example/free"]["allowed"]
        assert got["https://h.example/free"]["crawl_delay"] == 2.0
        # unknown host: allowed, no delay
        assert got["https://other.example/tmp"]["allowed"]
        assert got["https://other.example/tmp"]["crawl_delay"] is None

    def test_allow_wins_exact_tie(self, spark):
        txt = "User-agent: *\nDisallow: /p/\nAllow: /p/"
        rules = parse_robots(_robots(spark, ("h.example", txt)))
        got = _apply(spark, rules, ["https://h.example/p/x"])
        assert got["https://h.example/p/x"]["allowed"]

    def test_keep_denied_false_filters(self, spark):
        txt = "User-agent: *\nDisallow: /no/"
        rules = parse_robots(_robots(spark, ("h.example", txt)))
        fr = spark.createDataFrame(
            [("https://h.example/no/1",), ("https://h.example/yes",)],
            "link string",
        )
        got = robots_filter(fr, rules).select("link").collect()
        assert [r["link"] for r in got] == ["https://h.example/yes"]

    def test_query_string_matched_and_root_path(self, spark):
        txt = "User-agent: *\nDisallow: /search?q="
        rules = parse_robots(_robots(spark, ("h.example", txt)))
        got = _apply(
            spark,
            rules,
            ["https://h.example/search?q=x", "https://h.example", "https://h.example/search"],
        )
        assert not got["https://h.example/search?q=x"]["allowed"]
        assert got["https://h.example"]["allowed"]
        assert got["https://h.example/search"]["allowed"]

    def test_no_python_udfs_in_plan(self, spark):
        txt = "User-agent: *\nDisallow: /x/"
        rules = parse_robots(_robots(spark, ("h.example", txt)))
        fr = spark.createDataFrame([("https://h.example/x/1",)], "link string")
        plan = (
            robots_filter(fr, rules, keep_denied=True)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert "BroadcastHashJoin" in plan

    def test_shuffle_fallback_same_results(self, spark):
        txt = "User-agent: *\nDisallow: /no/\nCrawl-delay: 2"
        rules = parse_robots(_robots(spark, ("h.example", txt)))
        fr = spark.createDataFrame(
            [("https://h.example/no/1",), ("https://h.example/yes",)],
            "link string",
        )
        a = robots_filter(fr, rules, keep_denied=True).orderBy("link").collect()
        b = (
            robots_filter(fr, rules, keep_denied=True, broadcast_rules=False)
            .orderBy("link")
            .collect()
        )
        assert [tuple(r) for r in a] == [tuple(r) for r in b]


class TestParseSitemaps:
    def test_urlset_index_entities_trim_violations(self, spark):
        from invoice_ocr_reconciler_spark.operators.robots import (
            parse_sitemaps,
        )

        sm = (
            '<?xml version="1.0" encoding="UTF-8"?>'
            '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
            "<url><loc>https://a.example/p?x=1&amp;y=2</loc>"
            "<lastmod>2026-01-02</lastmod><priority>0.8</priority></url>"
            "<url><loc> https://a.example/q </loc></url>"
            "<url><lastmod>2026-01-03</lastmod></url></urlset>"
        )
        smi = (
            "<sitemapindex><sitemap><loc>https://a.example/s1.xml</loc>"
            "</sitemap><sitemap><loc>https://a.example/s2.xml</loc>"
            "<lastmod>2026-02-01</lastmod></sitemap></sitemapindex>"
        )
        df = spark.createDataFrame(
            [("https://a.example/sitemap.xml", sm),
             ("https://a.example/sitemap_index.xml", smi)],
            "sitemap_url string, body string",
        )
        got = [
            (r["kind"], r["loc"], r["lastmod"], r["priority"])
            for r in parse_sitemaps(df).orderBy("source", "loc").collect()
        ]
        assert got == [
            ("url", "https://a.example/p?x=1&y=2", "2026-01-02", 0.8),
            ("url", "https://a.example/q", None, None),
            ("index", "https://a.example/s1.xml", None, None),
            ("index", "https://a.example/s2.xml", "2026-02-01", None),
        ]

    def test_urls_cap_drops_tail(self, spark):
        from invoice_ocr_reconciler_spark.operators.robots import (
            parse_sitemaps,
        )

        body = "<urlset>" + "".join(
            f"<url><loc>https://h/{i}</loc></url>" for i in range(10)
        ) + "</urlset>"
        df = spark.createDataFrame([("s", body)], "sitemap_url string, body string")
        got = parse_sitemaps(df, urls_cap=4).collect()
        assert [r["loc"] for r in got] == [f"https://h/{i}" for i in range(4)]


def test_parse_feeds_rss_and_atom(spark):
    from invoice_ocr_reconciler_spark.operators.robots import parse_feeds

    rss = (
        "<rss><channel><title>chan</title><link>https://h/chan</link>"
        "<item><title>A &amp; B</title><link>https://h/p1</link>"
        "<pubDate>01 Jan 2026</pubDate></item>"
        "<item><title>two</title><link> https://h/p2 </link></item>"
        "<item><title>linkless violation</title></item>"
        "</channel></rss>"
    )
    atom = (
        '<feed><title>f</title>'
        '<entry><title>E1</title><link rel="alternate" href="https://a/e1"/>'
        "<updated>2026-02-01</updated></entry>"
        "<entry><title>E2</title><link href='https://a/e2'/></entry>"
        "</feed>"
    )
    feeds = spark.createDataFrame(
        [("https://h/feed", rss), ("https://a/feed", atom)],
        "feed_url string, body string",
    )
    got = {(r["source"], r["item_idx"]): r for r in parse_feeds(feeds).collect()}
    r0 = got[("https://h/feed", 0)]
    assert r0["kind"] == "rss" and r0["link"] == "https://h/p1"
    assert r0["title"] == "A & B" and r0["published"] == "01 Jan 2026"
    r1 = got[("https://h/feed", 1)]
    assert r1["link"] == "https://h/p2" and r1["published"] is None
    # channel-level link never leaks in; the linkless item is dropped
    assert ("https://h/feed", 2) not in got
    a0 = got[("https://a/feed", 0)]
    assert a0["kind"] == "atom" and a0["link"] == "https://a/e1"
    assert a0["published"] == "2026-02-01"
    assert got[("https://a/feed", 1)]["link"] == "https://a/e2"


def test_parse_feeds_cap_and_empty(spark):
    from invoice_ocr_reconciler_spark.operators.robots import parse_feeds

    body = "<rss><channel>" + "".join(
        f"<item><title>t{j}</title><link>https://h/{j}</link></item>"
        for j in range(6)
    ) + "</channel></rss>"
    feeds = spark.createDataFrame(
        [("f", body), ("empty", "<rss><channel></channel></rss>"), ("junk", "not xml")],
        "feed_url string, body string",
    )
    got = parse_feeds(feeds, items_cap=4).collect()
    assert len(got) == 4  # tail dropped by the cap
    assert {r["source"] for r in got} == {"f"}
