"""Extraction unit tests: boilerplate stripping, PDF parse, purity/edge cases."""

from invoice_ocr_reconciler_spark.extraction.html_extract import (
    extract_main_text,
    extract_payload,
    extract_pdf_text,
)


def _page(body: str) -> str:
    return f"<!DOCTYPE html><html><body>{body}</body></html>"


def test_scripts_styles_comments_dropped():
    html = _page(
        "<script>var boilerplate_marker_text_here = 1;</script>"
        "<style>.x{color:red;background:blue}</style>"
        "<!-- a very long comment that would otherwise be a block -->"
        "<div><p>The actual main content sentence lives here.</p></div>"
    )
    out = extract_main_text(html)
    assert out == "The actual main content sentence lives here."


def test_link_farm_blocks_removed_content_kept():
    nav = "<nav>" + "".join(f'<a href="/{i}">navigation link number {i}</a>' for i in range(8)) + "</nav>"
    html = _page(nav + "<article><p>Substantial article text with no links at all, long enough to keep.</p></article>")
    out = extract_main_text(html)
    assert "navigation link" not in out
    assert out.startswith("Substantial article text")


def test_short_blocks_dropped():
    html = _page("<div>tiny</div><div><p>This block is comfortably longer than twenty characters.</p></div>")
    out = extract_main_text(html)
    assert "tiny" not in out and out.startswith("This block")


def test_line_structure_and_column_gaps_preserved():
    html = _page(
        "<article><p>Invoice # A-100</p><p>Widget thing  2  $5.00  $10.00</p></article>"
    )
    out = extract_main_text(html)
    assert out == "Invoice # A-100\nWidget thing  2  $5.00  $10.00"


def test_table_cells_become_column_gaps():
    html = _page(
        "<table><tr><td>Line item description</td><td>3</td><td>$4.00</td><td>$12.00</td></tr></table>"
    )
    out = extract_main_text(html)
    assert out == "Line item description  3  $4.00  $12.00"


def test_entities_unescaped():
    html = _page("<div><p>Gekko &amp; Co — fianc&eacute;e caf&#233; rendezvous</p></div>")
    assert extract_main_text(html) == "Gekko & Co — fiancée café rendezvous"


def test_empty_and_garbage_payloads():
    assert extract_payload(None) == ""
    assert extract_payload(b"") == ""
    assert extract_payload(b"\xff\xfe\x00<<<garbage") == ""


def test_pdf_text_show_ops_in_order():
    pdf = b"%PDF-1.4\nstream\nBT\n(First line) Tj\n(Second \\(escaped\\)) Tj\nET\nendstream"
    assert extract_pdf_text(pdf) == "First line\nSecond (escaped)"
    assert extract_payload(pdf) == "First line\nSecond (escaped)"


def test_purity_repeated_calls_identical():
    html = _page("<div><p>Determinism check content block, repeated.</p></div>").encode()
    assert extract_payload(html) == extract_payload(html)


def test_adversarial_inputs_bounded_time():
    """Web-scale executor protection: pathological pages must parse in
    bounded time (the reference's unbounded quantifiers hang on these)."""
    import time

    from invoice_ocr_reconciler_spark.functions.parse_fields import parse_invoice_text

    bombs = [
        b"<html><body><p>" + b"A" * 1_000_000 + b"</p></body></html>",
        b"<html><body><p>" + b"a " * 200_000 + b"</p></body></html>",
        b"<html><body><p>From: " + b"b,&.'- " * 50_000 + b"</p></body></html>",
        b"<html><body><p>" + b"# " * 100_000 + b"</p></body></html>",
        b"<html><body><p>" + b"Z" * 400_000 + b" 12, 2024</p></body></html>",
    ]
    for payload in bombs:
        t0 = time.monotonic()
        parse_invoice_text(extract_payload(payload), "https://x/y")
        assert time.monotonic() - t0 < 5.0


def test_bounded_monthname_date_still_matches():
    from invoice_ocr_reconciler_spark.functions.parse_fields import parse_invoice_text

    assert parse_invoice_text("shipped September 10, 2024")["invoice_date"] == "September 10, 2024"


def test_pdf_tj_array_ops():
    pdf = b"%PDF-1.4\nstream\nBT\n(Line one) Tj\n[(Kerned ) -250 (pieces)] TJ\n(Line three) Tj\nET"
    assert extract_pdf_text(pdf) == "Line one\nKerned pieces\nLine three"
