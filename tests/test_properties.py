"""Property tests (SURVEY.md §5.2-4) over the pure-Python kernels — fast,
no Spark session needed (the Spark column expressions mirror these and are
pinned by the oracle + idempotence tests)."""

import math
import re

from hypothesis import given, settings
from hypothesis import strategies as st

from invoice_ocr_reconciler_spark.functions.parse_fields import (
    parse_amount,
    parse_invoice_text,
)
from invoice_ocr_reconciler_spark.operators.dedup import (
    _minhash_signature,
    _shingle_hashes,
    _simhash,
)

# Python mirror of normalize_vendor_col (functions/normalize.py) used for the
# idempotence property; cross-checked against Spark in test_reconcile.py
_SUF = r"\b(ltd|limited|inc|incorporated|llc|corp|corporation|co|company|pvt|private)\b\.?"


def _norm(name: str) -> str:
    c = (name or "").lower()
    c = re.sub(_SUF, "", c)
    c = re.sub(r"[^a-z0-9\s]", "", c)
    c = re.sub(r"\s+", " ", c)
    return c.strip()


@given(st.text(max_size=80))
@settings(max_examples=300, deadline=None)
def test_normalize_stabilizes(s):
    """The reference's normalize is deliberately NOT idempotent: the legal-
    suffix strip runs BEFORE the punctuation strip (ref
    backend/reconciliationEngine.js:19-21), so removing punctuation can
    expose a fresh suffix token that only a second pass would strip —
    hypothesis found 'C\\x1bO' -> 'co' -> ''. We mirror the reference's
    single-pass order exactly; the true invariant is stabilization after
    the second application (a clean-alphabet input can never grow new
    suffix tokens)."""
    once = _norm(s)
    twice = _norm(once)
    assert _norm(twice) == twice


@given(
    st.text(
        alphabet=st.sampled_from(" abcdefghijklmnopqrstuvwxyz0123456789XYZQW"),
        max_size=80,
    )
)
@settings(max_examples=300, deadline=None)
def test_normalize_idempotent_on_clean_text(s):
    """On ascii-alphanumeric input the punctuation strip is a no-op, so no
    fresh suffix tokens can be exposed and one normalize pass IS idempotent.
    (A unicode letter INSIDE a word breaks this too: 'cÉo' is one word to
    the suffix regex but the punctuation strip exposes 'co'.)"""
    assert _norm(_norm(s)) == _norm(s)


@given(st.text(max_size=60))
@settings(max_examples=300, deadline=None)
def test_parse_amount_total(s):
    """parse_amount never raises and returns a finite float or None."""
    v = parse_amount(s)
    assert v is None or (isinstance(v, float) and math.isfinite(v))


@given(st.text(max_size=200))
@settings(max_examples=200, deadline=None)
def test_parse_invoice_total_function(s):
    """The parser is total: any text yields a complete struct with the
    falsy-coalesce invariants (ref backend/invoiceParser.js:116-127)."""
    out = parse_invoice_text(s, url="https://x/y")
    assert out["invoice_number"]  # never empty (fallback)
    assert out["vendor_name"]
    assert out["subtotal"] is not None and out["tax"] is not None
    assert out["total_amount"] is not None
    assert out["confidence"] in (0, 25, 50, 75, 100)
    assert out["currency"] == out["currency"].upper()


@given(st.floats(min_value=0, max_value=1e9, allow_nan=False),
       st.floats(min_value=0, max_value=1e9, allow_nan=False))
@settings(max_examples=300, deadline=None)
def test_amount_tolerance_symmetric(a, b):
    """abs/max tolerance predicate is symmetric (ref :25-35)."""
    def match(x, y):
        bigger = max(x, y)
        return True if bigger == 0 else abs(x - y) / bigger <= 0.01

    assert match(a, b) == match(b, a)


@given(st.text(max_size=300))
@settings(max_examples=100, deadline=None)
def test_minhash_deterministic_and_matches_self(s):
    sig1 = _minhash_signature(s)
    sig2 = _minhash_signature(s)
    assert sig1 == sig2 and len(sig1) == 64


@given(st.text(max_size=300))
@settings(max_examples=100, deadline=None)
def test_simhash_deterministic_int64(s):
    h = _simhash(s)
    assert h == _simhash(s)
    assert -(1 << 63) <= h < (1 << 63)


@given(st.lists(st.sampled_from("abc defg hi jklm nop".split()), max_size=30))
@settings(max_examples=200, deadline=None)
def test_shingles_permutation_sensitivity(tokens):
    """Shingle sets are a pure function of the token sequence."""
    text = " ".join(tokens)
    a = _shingle_hashes(text)
    b = _shingle_hashes(text)
    assert (a == b).all()


@given(st.text(alphabet=st.characters(min_codepoint=33, max_codepoint=126), max_size=24))
@settings(max_examples=300, deadline=None)
def test_bpe_encode_word_reconstructs(s):
    """Any merge table: concatenated output symbols == word + </w>."""
    from invoice_ocr_reconciler_spark.operators.bpe import _encode_word

    ranks = {("a", "b"): 0, ("ab", "c"): 1, ("c", "</w>"): 2, ("a", "a"): 3}
    out = _encode_word(s, ranks, {})
    assert "".join(out) == s + "</w>"
    # deterministic with and without a warm cache
    cache: dict = {}
    assert _encode_word(s, ranks, cache) == out
    assert _encode_word(s, ranks, cache) == out


# mirror of the prefix selection in operators/setjoin.py: rarest-first
# global order, prefix length = sz - ceil(tau*sz) + 1 (all-integer)
def _prefixes(sets, tau_num, tau_den):
    from collections import Counter

    freq = Counter(t for s in sets.values() for t in s)
    out = {}
    for k, s in sets.items():
        ordered = sorted(s, key=lambda t: (freq[t], t))
        sz = len(ordered)
        p = sz - (tau_num * sz + tau_den - 1) // tau_den + 1
        out[k] = set(ordered[:p])
    return out


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=12), min_size=1, max_size=12),
        min_size=2,
        max_size=12,
    ),
    st.sampled_from([(1, 2), (3, 5), (7, 10), (9, 10), (1, 1)]),
)
@settings(max_examples=200, deadline=None)
def test_prefix_filter_admits_no_false_negatives(raw, tau):
    """The prefix-filtering theorem as implemented (integer prefix-length
    formula in operators/setjoin.py): any pair with Jaccard >= tau MUST
    share at least one prefix token under the shared global ordering."""
    tau_num, tau_den = tau
    sets = {i: frozenset(s) for i, s in enumerate(raw)}
    pref = _prefixes(sets, tau_num, tau_den)
    ids = sorted(sets)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = sets[ids[ai]], sets[ids[bi]]
            inter = len(a & b)
            uni = len(a | b)
            if tau_den * inter >= tau_num * uni:
                assert pref[ids[ai]] & pref[ids[bi]], (
                    f"J>=tau pair with disjoint prefixes: {a} {b} tau={tau}"
                )
