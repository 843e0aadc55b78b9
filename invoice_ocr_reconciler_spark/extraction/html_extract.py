"""Main-content extraction: HTML boilerplate stripping + PDF-like layout parse.

This is the re-targeted analog of the reference's OCR text stage (reference:
backend/server.js:110-134 runs one Tesseract worker per process and produces a
raw text column). Here the input is a Common-Crawl-style ``html: binary``
payload and the output is ``extracted_text: string`` with a **byte-identical
per url** contract: every function in this module is a pure function of the
single payload's bytes — no batch-level state, no wall-clock, no randomness —
so results are identical across Arrow batch boundaries and parallelism levels.

Heuristics (classic DOM text-density / link-density boilerplate removal):

1. drop <script>/<style>/<noscript>/<template> subtrees and comments;
2. turn line-level boundaries (p, li, tr, h1-6, br) into newlines and table
   cell boundaries (td/th) into two-space column separators — preserving the
   OCR-like columnar layout downstream field parsing keys on;
3. segment the document into blocks at *container* boundaries (div, article,
   section, table, nav, ...);
4. per block compute visible-text length and link density (anchor chars /
   total chars); keep blocks with >= MIN_BLOCK_CHARS chars and link density
   <= MAX_LINK_DENSITY (kills nav bars, footers, link farms);
5. join kept blocks with newlines.

PDF-like payloads (magic ``%PDF``) go through a minimal layout parse that
reads text-show operators ``(...) Tj`` in stream order — enough for the
deterministic synthetic corpus; a pdfplumber-grade parser is a drop-in
replacement behind the same pure-function contract.
"""

from __future__ import annotations

import html as _html
import re

MIN_BLOCK_CHARS = 20
MAX_LINK_DENSITY = 0.5

# subtrees that carry no visible text
_DROP_SUBTREE_RE = re.compile(
    r"<(script|style|noscript|template)\b[^>]*>.*?</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)

# line-level boundaries -> newline; cell boundaries -> 2-space column gap
_CELL_END_RE = re.compile(r"</t[dh]\s*>", re.IGNORECASE)
_LINE_BREAK_RE = re.compile(
    r"</?(?:p|li|h[1-6])\b[^>]*>|</tr\s*>|<br\s*/?>", re.IGNORECASE
)

# container-level boundaries: splitting here yields candidate content blocks
_BLOCK_SPLIT_RE = re.compile(
    r"</?(?:div|article|section|main|nav|aside|header|footer|table|ul|ol|"
    r"form|blockquote|pre|body|html)\b[^>]*>|<hr\s*/?>",
    re.IGNORECASE,
)

_ANCHOR_RE = re.compile(r"<a\b[^>]*>(.*?)</a\s*>", re.IGNORECASE | re.DOTALL)
_TAG_RE = re.compile(r"<[^>]+>")
# [\t\r\f\v] -> ' ' as a C-speed translate table (byte-identical to the
# former per-char regex sub; each class char maps to one space)
_CTRL_WS_TABLE = str.maketrans({"\t": " ", "\r": " ", "\f": " ", "\v": " "})
_WIDE_GAP_RE = re.compile(r" {3,}")

# PDF text-show operators: '(s) Tj' and '[(s1) kern (s2)] TJ' arrays
_PDF_TJ_RE = re.compile(rb"\(((?:[^()\\]|\\.)*)\)\s*Tj")
_PDF_TJ_ARRAY_RE = re.compile(rb"\[((?:[^\[\]\\]|\\.)*)\]\s*TJ")
_PDF_STR_RE = re.compile(rb"\(((?:[^()\\]|\\.)*)\)")


def _visible_text(fragment: str) -> str:
    """Strip residual tags, decode entities, normalize whitespace.

    Runs of >= 2 spaces are preserved as exactly two spaces — they encode
    table/column layout that the line-item parser keys on (the analog of
    OCR column whitespace); single spaces pass through untouched.
    """
    txt = _TAG_RE.sub("", fragment)
    txt = _html.unescape(txt)
    txt = txt.translate(_CTRL_WS_TABLE)
    lines = []
    for ln in txt.split("\n"):
        # substring gate: ' {3,}' can only match where three literal spaces
        # occur, and the C-level check is far cheaper than the regex scan
        if "   " in ln:
            ln = _WIDE_GAP_RE.sub("  ", ln)
        ln = ln.strip()
        if ln:
            lines.append(ln)
    return "\n".join(lines)


def _link_chars(fragment: str) -> int:
    total = 0
    for m in _ANCHOR_RE.finditer(fragment):
        total += len(_visible_text(m.group(1)))
    return total


def extract_main_text(html_text: str) -> str:
    """Boilerplate-stripped main content of one HTML document (pure)."""
    doc = _COMMENT_RE.sub(" ", html_text)
    doc = _DROP_SUBTREE_RE.sub(" ", doc)
    doc = _CELL_END_RE.sub("  ", doc)
    doc = _LINE_BREAK_RE.sub("\n", doc)

    kept: list[str] = []
    for raw_block in _BLOCK_SPLIT_RE.split(doc):
        # every _visible_text transform is non-lengthening (tag strip, entity
        # decode, whitespace collapse, trim), so a fragment shorter than the
        # block minimum can never survive the length filter — skip the regex
        # work entirely. Most split fragments are the empty/near-empty gaps
        # between adjacent container tags.
        if len(raw_block) < MIN_BLOCK_CHARS:
            continue
        text = _visible_text(raw_block)
        if len(text) < MIN_BLOCK_CHARS:
            continue
        n_link = _link_chars(raw_block)
        n_text = len(text)
        if n_text > 0 and (n_link / n_text) > MAX_LINK_DENSITY:
            continue
        kept.append(text)
    return "\n".join(kept)


def _pdf_unescape(raw: bytes) -> str:
    out = []
    i = 0
    while i < len(raw):
        b = raw[i]
        if b == 0x5C and i + 1 < len(raw):  # backslash escape
            nxt = raw[i + 1]
            mapped = {0x6E: "\n", 0x74: "\t", 0x72: "\r", 0x28: "(", 0x29: ")", 0x5C: "\\"}
            out.append(mapped.get(nxt, chr(nxt)))
            i += 2
        else:
            out.append(chr(b))
            i += 1
    return "".join(out)


def extract_pdf_text(payload: bytes) -> str:
    """Text of a PDF-like payload in stream order.

    Handles both show-op forms: '(s) Tj' single strings and
    '[(s1) -250 (s2)] TJ' kerned arrays (array elements join into one line).
    """
    pieces: list[tuple[int, str]] = []
    for m in _PDF_TJ_RE.finditer(payload):
        pieces.append((m.start(), _pdf_unescape(m.group(1))))
    for m in _PDF_TJ_ARRAY_RE.finditer(payload):
        parts = [_pdf_unescape(s.group(1)) for s in _PDF_STR_RE.finditer(m.group(1))]
        pieces.append((m.start(), "".join(parts)))
    pieces.sort(key=lambda t: t[0])
    return "\n".join(text for _pos, text in pieces)


def extract_payload(payload: bytes | None) -> str:
    """Dispatch on magic bytes; utf-8 decode with replacement for HTML."""
    if not payload:
        return ""
    if payload[:4] == b"%PDF":
        return extract_pdf_text(payload)
    return extract_main_text(payload.decode("utf-8", errors="replace"))
