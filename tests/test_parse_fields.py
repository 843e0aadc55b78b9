"""Unit tests for the field-parsing cascades (reference: backend/invoiceParser.js:5-128).

Every pattern branch, cascade precedence, and faithful JS quirk is pinned here;
these are the canonical semantics goldens enforce downstream (SURVEY.md §5.2-1).
"""

import math

import pytest

from invoice_ocr_reconciler_spark.functions.parse_fields import (
    parse_amount,
    parse_invoice_text,
    parse_line_items,
)


# --- P1 invoice number cascade (invoiceParser.js:7-12) ---

def test_invoice_number_labeled():
    assert parse_invoice_text("Invoice # ABC-123")["invoice_number"] == "ABC-123"
    assert parse_invoice_text("invoice no: XYZ/9")["invoice_number"] == "XYZ/9"
    assert parse_invoice_text("Invoice Number 778899")["invoice_number"] == "778899"


def test_invoice_number_inv_and_bill():
    assert parse_invoice_text("INV: Q-42XY")["invoice_number"] == "Q-42XY"
    assert parse_invoice_text("Bill No. B-777")["invoice_number"] == "B-777"


def test_invoice_number_bare_hash_needs_4_chars():
    assert parse_invoice_text("# ABCD")["invoice_number"] == "ABCD"
    # 3 chars: too short for the bare-# pattern -> deterministic fallback
    out = parse_invoice_text("# ABC", url="https://h/x")
    assert out["invoice_number"].startswith("INV-")


def test_invoice_number_inv_quirk_captures_oice():
    """Faithful JS quirk: 'inv' matches inside 'Invoice Date' and captures
    'oice' when no stronger pattern fires first (invoiceParser.js:9)."""
    assert parse_invoice_text("Invoice Date: 01/02/2024")["invoice_number"] == "oice"


def test_fallback_invoice_number_is_deterministic():
    a = parse_invoice_text("", url="https://h/x")["invoice_number"]
    b = parse_invoice_text("", url="https://h/x")["invoice_number"]
    c = parse_invoice_text("", url="https://h/y")["invoice_number"]
    assert a == b and a != c and a.startswith("INV-")


# --- P2 vendor cascade (invoiceParser.js:14-17) ---

def test_vendor_from_label_stops_at_suffix():
    # lazy capture halts at ltd|inc|llc|corp (case-insensitive), not included
    assert parse_invoice_text("From: Acme Widgets Inc")["vendor_name"] == "Acme Widgets"
    assert parse_invoice_text("Billed by: Tyrell Corporation")["vendor_name"] == "Tyrell"


def test_vendor_from_label_stops_at_newline():
    assert parse_invoice_text("From: Gekko & Partners\nTotal: 5")["vendor_name"] == "Gekko & Partners"


def test_vendor_line_anchored_pattern():
    txt = "Wonka Industries Ltd\nmore text"
    assert parse_invoice_text(txt)["vendor_name"] == "Wonka Industries Ltd"


def test_vendor_anchored_pattern_spans_newlines_quirk():
    """Faithful quirk: the char class includes \\s, which matches newlines in
    both JS and Python — the capture can span lines (invoiceParser.js:16)."""
    txt = "Something first\nWonka Industries Ltd\nmore text"
    assert parse_invoice_text(txt)["vendor_name"] == "Something first\nWonka Industries Ltd"


def test_vendor_fallback():
    assert parse_invoice_text("no vendor here")["vendor_name"] == "Unknown Vendor"


# --- P3/P4 dates stay raw strings (invoiceParser.js:19-29) ---

def test_date_labeled_numeric_and_monthname():
    assert parse_invoice_text("Invoice Date: 3/4/24")["invoice_date"] == "3/4/24"
    assert parse_invoice_text("Date of issue: 12-31-2024")["invoice_date"] == "12-31-2024"
    assert parse_invoice_text("Invoice Date: March 4, 2024")["invoice_date"] == "March 4, 2024"


def test_date_bare_numeric_requires_4_digit_year():
    assert parse_invoice_text("shipped 01/02/2024 ok")["invoice_date"] == "01/02/2024"
    assert parse_invoice_text("shipped 01/02/24 ok")["invoice_date"] is None


def test_due_date():
    assert parse_invoice_text("Due Date: 5/5/2025")["due_date"] == "5/5/2025"
    assert parse_invoice_text("pay by May 5, 2025")["due_date"] == "May 5, 2025"
    assert parse_invoice_text("nothing")["due_date"] is None


# --- P5-P7 amounts; P9 parseAmount (invoiceParser.js:31-44,54-59) ---

def test_total_cascade_and_subtotal_quirk():
    assert parse_invoice_text("Grand Total: $1,234.56")["total_amount"] == 1234.56
    assert parse_invoice_text("Amount Due: 99")["total_amount"] == 99.0
    # faithful quirk: 'total' alternation matches inside 'Subtotal' when it
    # appears first in the document
    out = parse_invoice_text("Subtotal: $10.00\nTotal Due: $18.00")
    assert out["total_amount"] == 10.0


def test_total_with_currency_code():
    assert parse_invoice_text("Total: USD 2,500.00")["total_amount"] == 2500.0


def test_tax_with_percent_prefix_and_usd_quirk():
    assert parse_invoice_text("Tax: 8% $2,118.28")["tax"] == 2118.28
    # quirk: with a currency code the $-pattern backtracks and captures the
    # percentage digits instead (JS does the same)
    assert parse_invoice_text("Tax: 8% USD 2,118.28")["tax"] == 8.0


def test_parse_amount_js_parsefloat_semantics():
    assert parse_amount("1,234.50") == 1234.50
    assert parse_amount("12.34.56") == 12.34  # numeric-prefix parse
    assert parse_amount("abc") is None
    assert parse_amount("") is None
    assert parse_amount(None) is None


# --- P8 currency (invoiceParser.js:46-52,99-103) ---

def test_currency_code_symbol_and_default():
    assert parse_invoice_text("Total: EUR 5")["currency"] == "EUR"
    assert parse_invoice_text("usd mentioned")["currency"] == "USD"
    assert parse_invoice_text("price € 5")["currency"] == "EUR"
    assert parse_invoice_text("price ₹ 5")["currency"] == "INR"
    assert parse_invoice_text("no currency")["currency"] == "USD"


# --- P10 line items (invoiceParser.js:69-86) ---

def test_line_items_two_space_columns():
    txt = "Widget assembly  3  $10.50  $31.50\nnot an item line"
    items = parse_line_items(txt)
    assert items == [
        {"description": "Widget assembly", "quantity": 3.0, "unit_price": 10.5, "amount": 31.5}
    ]


def test_line_items_amount_bounds_filter():
    assert parse_line_items("Huge thing  1  2000000  2000000") == []
    assert parse_line_items("Free thing  1  0  0") == []


def test_line_items_defaults():
    # quantity 0 -> 1 (JS parseFloat(..)||1); unit 0 -> amount (||amount)
    items = parse_line_items("Odd row  0  0  25.00")
    assert items == [
        {"description": "Odd row", "quantity": 1.0, "unit_price": 25.0, "amount": 25.0}
    ]


# --- P11 confidence, P12 falsy-coalesce defaults (invoiceParser.js:111-127) ---

def test_confidence_quarters():
    assert parse_invoice_text("")["confidence"] == 0
    assert parse_invoice_text("Invoice # A1")["confidence"] == 25
    full = "From: Acme Inc\nInvoice # A1\nInvoice Date: 01/02/2024\nTotal: $5"
    assert parse_invoice_text(full)["confidence"] == 100


def test_subtotal_fallback_chain():
    # subtotal missing, total+tax present -> total - tax
    out = parse_invoice_text("Total Due: $100.00\nVAT: $20.00")
    assert math.isclose(out["subtotal"], 80.0)
    assert out["tax"] == 20.0
    # only total -> subtotal = total
    out2 = parse_invoice_text("Total Due: $100.00")
    assert out2["subtotal"] == 100.0
    # nothing -> zeros, not nulls
    out3 = parse_invoice_text("")
    assert out3["subtotal"] == 0.0 and out3["tax"] == 0.0 and out3["total_amount"] == 0.0


def test_total_falls_back_to_subtotal():
    out = parse_invoice_text("Subtotal: $42.00")
    assert out["total_amount"] == 42.0
