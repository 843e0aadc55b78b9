"""PII detection + redaction for web-scale text curation.

Emails, IPv4 addresses, and international-format phone numbers are counted
and replaced with typed placeholder tokens — the standard pre-training
scrub. All patterns are chosen to evaluate identically under Java regex
(Spark) and RE2 (the DuckDB oracle): no lookarounds, no backreferences,
greedy quantifiers only.

Order matters and is fixed: emails first (their local part can contain
digits), then IPv4 (dotted digit runs would otherwise feed the phone
pattern), then phones (required '+' country prefix keeps the pattern from
swallowing arbitrary numeric text).

Everything is `regexp_count` / `regexp_replace` — whole-stage codegen, no
Python crossing, trivially parallel at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PHONE_RE = r"\+[0-9][0-9 ().-]{6,}[0-9]"

EMAIL_TOKEN = "<EMAIL>"
IP_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"


def pii_count_cols(col: Column) -> dict[str, Column]:
    """Match counts per category, each counted on the SAME progressively-
    redacted text the redaction pass sees — counts and <TOKEN> occurrences
    in redacted_text must agree. Counting n_ips on the raw text would
    count an IPv4 inside an email domain ('admin@192.168.0.1.example.com')
    that redaction never tokenizes (the email consumed it first) — a
    phantom unredacted IP in any audit."""
    text = F.coalesce(col, F.lit(""))
    after_email = F.regexp_replace(text, EMAIL_RE, EMAIL_TOKEN)
    return {
        "n_emails": F.regexp_count(text, F.lit(EMAIL_RE)),
        "n_ips": F.regexp_count(after_email, F.lit(IPV4_RE)),
        "n_phones": F.regexp_count(
            F.regexp_replace(after_email, IPV4_RE, IP_TOKEN),
            F.lit(PHONE_RE),
        ),
    }


def redact_pii_col(col: Column) -> Column:
    """Replace every email -> <EMAIL>, IPv4 -> <IP>, phone -> <PHONE>,
    applied in that order on the progressively-redacted text."""
    text = F.coalesce(col, F.lit(""))
    step1 = F.regexp_replace(text, EMAIL_RE, EMAIL_TOKEN)
    step2 = F.regexp_replace(step1, IPV4_RE, IP_TOKEN)
    return F.regexp_replace(step2, PHONE_RE, PHONE_TOKEN)
