"""WARC record splitting (sources/warc.py): cursor walker + Spark surface."""

import hashlib

from pyspark.sql import functions as F

from invoice_ocr_reconciler_spark.sources.warc import (
    _split_http,
    _walk_records,
    parse_warc_records,
)


def _rec(rtype: str, body: bytes, extra: str = "") -> bytes:
    return (
        f"WARC/1.0\r\nWARC-Type: {rtype}\r\n{extra}"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + body + b"\r\n\r\n"


class TestWalker:
    def test_walks_records_in_order(self):
        data = _rec("warcinfo", b"software: x") + _rec(
            "response", b"HTTP/1.1 200 OK\r\n\r\n<html>",
            extra="WARC-Target-URI: https://a/1\r\n",
        )
        got = list(_walk_records("s", data))
        assert [r["record_idx"] for r in got] == [0, 1]
        assert got[0]["warc_type"] == "warcinfo"
        assert got[1]["target_uri"] == "https://a/1"
        assert got[1]["body"].endswith(b"<html>")

    def test_header_names_case_insensitive(self):
        data = b"WARC/1.0\r\ncontent-length: 2\r\nwArC-tYpE: response\r\n\r\nok\r\n\r\n"
        (got,) = _walk_records("s", data)
        assert got["warc_type"] == "response" and got["body"] == b"ok"

    def test_binary_body_with_fake_magic_not_rescanned(self):
        # a body CONTAINING 'WARC/' bytes must not confuse the cursor:
        # splitting walks Content-Length, never regex-scans
        body = b"xxWARC/1.0\r\n\r\nyy"
        data = _rec("resource", body) + _rec("resource", b"tail")
        got = list(_walk_records("s", data))
        assert [r["body"] for r in got] == [body, b"tail"]

    def test_torn_tail_yields_good_prefix_plus_marker(self):
        data = _rec("resource", b"good") + b"WARC/1.0\r\nContent-Length: 99\r\n\r\nxx"
        got = list(_walk_records("s", data))
        assert got[0]["body"] == b"good"
        assert got[-1]["_malformed_flag"] == 1 and got[-1]["record_idx"] == -1

    def test_garbage_and_bad_length_malformed(self):
        for data in (b"NOTWARC", b"WARC/1.0\r\nContent-Length: zz\r\n\r\nx"):
            got = list(_walk_records("s", data))
            assert len(got) == 1 and got[0]["_malformed_flag"] == 1

    def test_empty_input_yields_nothing(self):
        assert list(_walk_records("s", b"")) == []


class TestSplitHttp:
    def test_status_and_entity(self):
        s, b = _split_http(b"HTTP/1.1 301 Moved\r\nLocation: /x\r\n\r\nbody")
        assert s == 301 and b == b"body"

    def test_non_http_passthrough(self):
        s, b = _split_http(b"GET / HTTP/1.1\r\n\r\n")
        assert s is None and b == b"GET / HTTP/1.1\r\n\r\n"


class TestSparkSurface:
    def _segments(self, spark):
        html = b"<html><body>hi</body></html>"
        seg = (
            _rec("warcinfo", b"software: x")
            + _rec(
                "response",
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html,
                extra="WARC-Target-URI: https://a/1\r\n",
            )
            + _rec("request", b"GET /1 HTTP/1.1",
                   extra="WARC-Target-URI: https://a/1\r\n")
        )
        return spark.createDataFrame(
            [("seg-0", seg), ("seg-1", b"torn")],
            "source string, content binary",
        ), html

    def test_parse_strip_and_malformed(self, spark):
        segments, html = self._segments(spark)
        rows = {
            (r["source"], r["record_idx"]): r
            for r in parse_warc_records(segments, source_col="source").collect()
        }
        resp = rows[("seg-0", 1)]
        assert resp["http_status"] == 200 and bytes(resp["payload"]) == html
        # request record: non-HTTP-response body passes through verbatim
        assert bytes(rows[("seg-0", 2)]["payload"]) == b"GET /1 HTTP/1.1"
        assert rows[("seg-1", -1)]["n_malformed"] == 1

    def test_record_type_filter_and_no_strip(self, spark):
        segments, html = self._segments(spark)
        got = parse_warc_records(
            segments,
            source_col="source",
            record_types=("response",),
            strip_http_headers=False,
        ).collect()
        # the torn seg-1 marker survives the type filter (health signal)
        assert sorted((r["warc_type"], r["n_malformed"]) for r in got) == [
            ("", 1), ("response", 0)
        ]
        resp = next(r for r in got if r["warc_type"] == "response")
        assert bytes(resp["payload"]).startswith(b"HTTP/1.1 200 OK")

    def test_oracle_constants_hold(self, spark):
        # the warc_ingest oracle hard-codes envelope lengths; pin them
        env = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
        assert len(env) == 44
        assert len("GET / HTTP/1.1\r\nHost: w.example") == 31
        assert len("software: graft-crawler") == 23
        assert 44 + 12 + 32 + 14 == 102  # envelope + md5-html body


class TestWalkerProperties:
    def test_build_walk_round_trip(self):
        # driver-side property: arbitrary binary bodies (including fake
        # 'WARC/' magic and CRLFs inside) round-trip exactly through the
        # cursor walker — no Spark needed, the walker is pure
        from hypothesis import given, settings
        from hypothesis import strategies as st

        body = st.binary(max_size=200)
        types = st.sampled_from(["response", "resource", "metadata"])

        @settings(max_examples=150, deadline=None)
        @given(st.lists(st.tuples(types, body), min_size=0, max_size=6))
        def prop(records):
            blob = b"".join(_rec(t, b) for t, b in records)
            got = list(_walk_records("s", blob))
            assert [(r["warc_type"], r["body"]) for r in got] == records
            assert [r["record_idx"] for r in got] == list(range(len(records)))

        prop()


def test_sniff_content_type_magics(spark):
    from pyspark.sql import functions as F

    from invoice_ocr_reconciler_spark.sources.warc import sniff_content_type_col

    rows = [
        (0, b"%PDF-1.7 stuff"),
        (1, b"PK\x03\x04archive"),
        (2, b"\x1f\x8b\x08gz"),
        (3, b"GIF87aimg"),
        (4, b"\x89PNG\r\n\x1a\nimg"),
        (5, b"\xff\xd8\xff\xe0jfif"),
        (6, b"RIFF\x00\x00\x00\x00WEBPVP8 "),
        (7, b"  <!DOCTYPE HTML><html>"),
        (8, b"\xef\xbb\xbf<html lang=en>"),
        (9, b"\xff\xfep\x00l\x00"),
        (10, b"just some text"),
        (11, b""),
        (12, b"RIFF\x00\x00\x00\x00WAVEfmt "),  # RIFF but not WEBP
    ]
    df = spark.createDataFrame(rows, "i int, payload binary")
    out = df.select("i", sniff_content_type_col(F.col("payload")).alias("s"))
    got = {r["i"]: (r["s"]["content_type"], r["s"]["bom"]) for r in out.collect()}
    assert got[0] == ("pdf", "")
    assert got[1] == ("zip", "")
    assert got[2] == ("gzip", "")
    assert got[3] == ("gif", "")
    assert got[4] == ("png", "")
    assert got[5] == ("jpeg", "")
    assert got[6] == ("webp", "")
    assert got[7] == ("html", "")       # leading whitespace tolerated
    assert got[8] == ("html", "utf-8")  # BOM stripped before doctype check
    assert got[9] == ("text", "utf-16le")
    assert got[10] == ("text", "")
    assert got[11] == ("empty", "")
    assert got[12] == ("text", "")      # RIFF container that is not WEBP
