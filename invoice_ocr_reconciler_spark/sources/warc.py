"""WARC (ISO 28500) record splitting — the Common-Crawl ingestion step.

The engine's tables are "Common-Crawl-style web pages"; upstream of any
such table sits the WARC container format CC actually publishes. This
source turns a frame of raw WARC segment bytes (e.g. a
``spark.read.format('binaryFile')`` scan, one row per .warc segment)
into one row per WARC record, from which the pages table is a select.

Format essentials (ISO 28500 / WARC 1.0+, the subset CC emits):

  - a record = ``WARC/<ver>\\r\\n`` + header lines (``Name: value``) +
    ``\\r\\n`` + a Content-Length-byte block + ``\\r\\n\\r\\n``.
  - header names are case-insensitive; Content-Length is the BODY byte
    count (authoritative — bodies are arbitrary binary and may contain
    anything, so splitting MUST walk lengths, never regex-scan).
  - ``response`` records hold an HTTP response (status line + headers +
    entity body) as their block; the page payload is the entity body.

Why ``mapInPandas``: record walking is inherently cursor-based binary
parsing (read headers, jump Content-Length, repeat) — exactly the
"genuinely imperative per-partition logic" case. The crossing is
Arrow-batched; each task walks its own files independently (parallelism
= WARC segments, which is how CC shards its crawls: ~1 GB segments,
64k files per crawl — ample partitions). Malformed tails degrade to a
truncated-record drop with a per-file ``n_malformed`` count, never an
exception (a 100 TB crawl ALWAYS contains torn segments).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame

RECORD_SCHEMA = (
    "source string, record_idx int, warc_type string, target_uri string, "
    "warc_date string, content_length bigint, http_status int, "
    "payload binary, n_malformed int"
)

_MAX_HEADER_BYTES = 64 * 1024  # a sane WARC header block is < 1 KB


def _parse_headers(block: bytes) -> dict[str, str]:
    out: dict[str, str] = {}
    for raw in block.split(b"\r\n"):
        if b":" not in raw:
            continue
        k, _, v = raw.partition(b":")
        out[k.strip().lower().decode("latin-1")] = v.strip().decode(
            "latin-1", "replace"
        )
    return out


def _walk_records(source: str, data: bytes) -> Iterator[dict]:
    """Cursor walk over one WARC segment; yields record dicts.

    Bad bytes at the cursor (no WARC/ magic, unparsable Content-Length,
    or a body running past EOF) terminate the walk — everything already
    yielded is kept and the remainder is counted malformed.
    """
    pos, idx, malformed = 0, 0, 0
    n = len(data)
    while pos < n:
        # skip inter-record CRLFs
        while data.startswith(b"\r\n", pos):
            pos += 2
        if pos >= n:
            break
        if not data.startswith(b"WARC/", pos):
            malformed = 1
            break
        hdr_end = data.find(b"\r\n\r\n", pos, pos + _MAX_HEADER_BYTES)
        if hdr_end < 0:
            malformed = 1
            break
        headers = _parse_headers(data[pos:hdr_end])
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            malformed = 1
            break
        body_start = hdr_end + 4
        body_end = body_start + length
        if body_end > n:
            malformed = 1
            break
        yield {
            "source": source,
            "record_idx": idx,
            "warc_type": headers.get("warc-type", ""),
            "target_uri": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "content_length": length,
            "body": data[body_start:body_end],
            "_malformed_flag": 0,
        }
        idx += 1
        pos = body_end
    if malformed:
        yield {
            "source": source,
            "record_idx": -1,
            "warc_type": "",
            "target_uri": None,
            "warc_date": None,
            "content_length": 0,
            "body": b"",
            "_malformed_flag": 1,
        }


def _split_http(body: bytes) -> tuple[int | None, bytes]:
    """(status, entity body) of an HTTP response block; (None, body) if
    the block is not HTTP."""
    if not body.startswith(b"HTTP/"):
        return None, body
    sep = body.find(b"\r\n\r\n")
    if sep < 0:
        return None, body
    head = body[:sep]
    line = head.split(b"\r\n", 1)[0].split(b" ")
    status = None
    if len(line) >= 2 and line[1].isdigit():
        status = int(line[1])
    return status, body[sep + 4 :]


def parse_warc_records(
    segments: DataFrame,
    content_col: str = "content",
    source_col: str = "path",
    strip_http_headers: bool = True,
    record_types: tuple[str, ...] | None = None,
) -> DataFrame:
    """One row per WARC record across all segments.

    -> (source, record_idx, warc_type, target_uri, warc_date,
        content_length, http_status, payload, n_malformed)

    ``payload`` is the record block; for ``response`` records with
    ``strip_http_headers`` the HTTP envelope is removed so payload IS the
    page bytes (feed straight to the extraction stage). ``record_types``
    filters (e.g. ('response',)) INSIDE the walker — filtered records
    never cross Arrow. A torn segment yields its good prefix plus one
    record_idx=-1 marker row carrying n_malformed=1 (select it out or
    aggregate it for crawl-health metrics; entirely-good files carry 0).
    """
    wanted = {t.lower() for t in record_types} if record_types else None

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "source", "record_idx", "warc_type", "target_uri", "warc_date",
            "content_length", "http_status", "payload", "n_malformed",
        ]
        for pdf in batches:
            rows = []
            for src, blob in zip(pdf[source_col], pdf[content_col]):
                data = bytes(blob) if blob is not None else b""
                for rec in _walk_records(str(src), data):
                    if rec["_malformed_flag"]:
                        rows.append(
                            (rec["source"], -1, "", None, None, 0, None, b"", 1)
                        )
                        continue
                    if wanted and rec["warc_type"].lower() not in wanted:
                        continue
                    status, payload = (None, rec["body"])
                    if rec["warc_type"].lower() == "response":
                        status, entity = _split_http(rec["body"])
                        if strip_http_headers:
                            payload = entity
                    rows.append(
                        (
                            rec["source"], rec["record_idx"], rec["warc_type"],
                            rec["target_uri"], rec["warc_date"],
                            rec["content_length"], status, payload, 0,
                        )
                    )
            yield pd.DataFrame(rows, columns=cols)

    pruned = segments.select(source_col, content_col)
    return pruned.mapInPandas(gen, schema=RECORD_SCHEMA)


def sniff_content_type_col(payload):
    """Magic-byte content-type sniff as a pure codegen expression.

    Crawl payloads lie about their Content-Type headers constantly; the
    ingest router (html -> extractor, pdf -> layout parser, images ->
    multimodal, archives -> skip) must trust the BYTES. One hex-prefix
    comparison chain — no Python, no shuffle, fuses into the ingest scan:

      %PDF            -> pdf          PK\\x03\\x04     -> zip
      \\x1f\\x8b        -> gzip         GIF87a/GIF89a  -> gif
      \\x89PNG         -> png          \\xff\\xd8\\xff    -> jpeg
      RIFF....WEBP    -> webp         <!doctype/<html (case-insens,
      leading whitespace/BOM tolerated) -> html;  else text/unknown

    Returns a struct(content_type, bom) — bom is 'utf-8'/'utf-16le'/
    'utf-16be'/'' from the byte-order-mark, which decode routing needs
    BEFORE any charset meta tag can be read.
    """
    from pyspark.sql import functions as F

    hx = F.upper(F.hex(F.substring(payload, 1, 16)))
    # tolerate a BOM and leading whitespace/control bytes before the doctype
    head = F.regexp_replace(
        F.substring(payload, 1, 64).cast("string"),
        "^[\ufeff\u0000-\u0020]+",
        "",
    )
    ct = (
        F.when(hx.startswith("255044462D"), F.lit("pdf"))          # %PDF-
        .when(hx.startswith("504B0304"), F.lit("zip"))
        .when(hx.startswith("1F8B"), F.lit("gzip"))
        .when(hx.startswith("474946383761"), F.lit("gif"))         # GIF87a
        .when(hx.startswith("474946383961"), F.lit("gif"))         # GIF89a
        .when(hx.startswith("89504E47"), F.lit("png"))
        .when(hx.startswith("FFD8FF"), F.lit("jpeg"))
        .when(
            hx.startswith("52494646")
            & (F.substring(payload, 9, 4).cast("string") == "WEBP"),
            F.lit("webp"),
        )
        .when(
            F.lower(head).startswith("<!doctype")
            | F.lower(head).startswith("<html"),
            F.lit("html"),
        )
        .when(F.length(payload) == 0, F.lit("empty"))
        .otherwise(F.lit("text"))
    )
    bom = (
        F.when(hx.startswith("EFBBBF"), F.lit("utf-8"))
        .when(hx.startswith("FFFE"), F.lit("utf-16le"))
        .when(hx.startswith("FEFF"), F.lit("utf-16be"))
        .otherwise(F.lit(""))
    )
    return F.struct(ct.alias("content_type"), bom.alias("bom"))


def wet_export(pages, url_col="url", ts_col="warc_ts", text_col="text"):
    """Render WET-style conversion records from extracted pages.

    The WET sibling of a WARC crawl is the standard interchange format for
    extracted text (what downstream consumers of a Common-Crawl-style
    corpus actually read); exporting it closes the loop opened by
    parse_warc_records (ingest) above. One record per page:

        WARC/1.0
        WARC-Type: conversion
        WARC-Target-URI: <url>
        WARC-Date: <ISO-8601 UTC>
        WARC-Block-Digest: md5:<hex md5 of the utf-8 text>
        Content-Length: <utf-8 OCTET length of the text>
        <blank line>
        <text>

    -> (url, warc_date, digest, content_length, record). Pure codegen
    string/concat/hash expressions — no UDF, no shuffle; the sink is a
    plain text write of `record` partitioned however the caller wants.
    Digest is md5 (engine-portable) rather than the spec's sha1-b32:
    documented deviation so the DuckDB oracle can replay records
    byte-for-byte.
    """
    from pyspark.sql import functions as F

    text = F.coalesce(F.col(text_col), F.lit(""))
    # session timeZone is UTC (session.py), so date_format renders UTC
    warc_date = F.date_format(F.col(ts_col), "yyyy-MM-dd'T'HH:mm:ss'Z'")
    digest = F.md5(F.encode(text, "utf-8"))
    clen = F.octet_length(text)
    record = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: "),
        F.col(url_col),
        F.lit("\r\nWARC-Date: "),
        warc_date,
        F.lit("\r\nWARC-Block-Digest: md5:"),
        digest,
        F.lit("\r\nContent-Length: "),
        clen.cast("string"),
        F.lit("\r\n\r\n"),
        text,
        F.lit("\r\n\r\n"),
    )
    return pages.select(
        F.col(url_col).alias("url"),
        warc_date.alias("warc_date"),
        digest.alias("digest"),
        clen.alias("content_length"),
        record.alias("record"),
    )
