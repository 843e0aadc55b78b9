"""Gale-Church sentence alignment over mined bitext page pairs.

Completes the bitext band: ``bitext_candidates`` (operators/bitext.py)
pairs parallel PAGES by URL slot; this module aligns their SENTENCES —
the step that turns page pairs into the (src, tgt) segment pairs a
translation-data pipeline actually trains on (the alignment pass of
ParaCrawl/CCAligned-style pipelines).

Algorithm: Gale & Church 1993 ("A Program for Aligning Sentences in
Bilingual Corpora", Computational Linguistics 19(1)) — the classic
length-based dynamic program. Per page pair, sentence character lengths
drive a DP over six bead types (1-1, 1-0, 0-1, 2-1, 1-2, 2-2) with the
paper's published penalties; the length-match cost is
``-100 * ln(2 * (1 - Phi(|delta|)))`` with ``delta = (l2 - l1*c) /
sqrt((l1 + l2/c) * s2 / 2)``, c=1.0, s2=6.8 (the paper's fitted
variance). The two-sided tail is ``erfc(|delta|/sqrt(2))`` via stdlib
``math.erfc`` — accurate to ~1e-300 (delta ~37), no scipy, identical on
every worker. A consequence of this cost worth documenting: 1-0/0-1
beads are *rare by construction* — an orphan's own tail delta
(sqrt(len/3.4)) always exceeds the delta of merging it into a
neighbouring bead, so deletions/insertions fire only when a side is
exhausted (unbalanced sentence counts) — exactly the published
behaviour of the original align program.

Extends the reference's two-stage match shape (candidate generation then
scored assignment, backend/reconciliationEngine.js:53-118) from records
to sentence sequences: the DP *is* the assignment, globally optimal for
the bead costs instead of greedy.

Scale shape:
  - sentence segmentation is the shared codegen splitter
    (functions/text.py:split_sentences_col) applied in ONE projection per
    side — no Python until the DP itself;
  - the docs side is column-pruned to (url, sents) BEFORE the two
    equi-joins that attach both sides' sentence arrays to the pair frame
    (pairs << corpus, so AQE broadcasts the pair side when small);
  - the DP crosses to Python ONCE, Arrow-batched over
    (url_a, url_b, sents_a, sents_b), and is O(n*m) per pair — bounded by
    ``max_sents`` (slice guard, same discipline as HOT_BUCKET_CAP): an
    adversarial 10^5-sentence page cannot take a worker hostage. Overlong
    sides are truncated and flagged, never dropped silently.
  - output is one row per aligned bead, deterministic under any
    partitioning (the DP reads only its own pair's arrays; ties in the
    DP break by a fixed move-evaluation order).

Correctness is pinned by pytest goldens against hand-checked alignments
(proportional 1-1 chains, planted insertions/deletions, 2-1 merges) AND,
as of round 5, a FULL DuckDB value oracle: the queries() corpus bounds
the DP at <=4x4 cells, so the oracle unrolls it cell-by-cell with the
exact tie rule and backtrace, feeding the erfc length cost in as a
finite integer-domain value table (__spark_entry__._align_sentences_
oracle — the same special-function-as-data shape as the fitted-centroid
tables). The general operator (unbounded n x m) remains non-SQL.
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from invoice_ocr_reconciler_spark.functions.text import split_sentences_col

# Gale & Church 1993 bead priors -> integer penalties (-100*ln(prior/p11)).
# (d_a, d_b, penalty): how many sentences each side consumes.
_BEADS = (
    (1, 1, 0),
    (1, 0, 450),
    (0, 1, 450),
    (2, 1, 230),
    (1, 2, 230),
    (2, 2, 440),
)
_C = 1.0  # expected tgt/src char-length ratio
_S2 = 6.8  # per-character length variance (paper's fit)

ALIGN_SCHEMA = (
    "url_a string, url_b string, bead int, "
    "a_lo int, a_hi int, b_lo int, b_hi int, "
    "text_a string, text_b string, cost int, truncated boolean"
)


def _match_cost(la: int, lb: int) -> int:
    """-100*ln(2*(1-Phi(|delta|))) as an int — the paper's length cost.

    2*(1-Phi(d)) == erfc(d/sqrt(2)); stdlib erfc stays accurate into the
    deep tail, so big mismatches keep their cost ORDERING instead of
    flattening onto a saturation plateau where only bead penalties would
    decide."""
    if la == 0 and lb == 0:
        return 0
    mean = (la + lb / _C) / 2.0
    delta = (lb - la * _C) / math.sqrt(mean * _S2)
    tail = math.erfc(abs(delta) / math.sqrt(2.0))
    if tail <= 0.0:  # erfc underflow: delta > ~38.6
        return 80000
    return min(80000, int(-100.0 * math.log(tail)))


def gale_church_align(
    lens_a: list[int], lens_b: list[int]
) -> list[tuple[int, int, int, int, int]]:
    """DP over sentence char lengths -> [(a_lo, a_hi, b_lo, b_hi, cost)].

    Ranges are half-open sentence-index spans; a 1-0 bead has an empty b
    span. Ties break by _BEADS order (strict < keeps the earlier move) —
    fully deterministic. O(n*m) time, O(n*m) int table.
    """
    n, m = len(lens_a), len(lens_b)
    inf = 1 << 60
    # cost[i][j] = best cost aligning first i of a with first j of b
    cost = [[inf] * (m + 1) for _ in range(n + 1)]
    back = [[None] * (m + 1) for _ in range(n + 1)]
    cost[0][0] = 0
    for i in range(n + 1):
        for j in range(m + 1):
            base = cost[i][j]
            if base >= inf:
                continue
            for da, db, pen in _BEADS:
                ni, nj = i + da, j + db
                if ni > n or nj > m:
                    continue
                la = sum(lens_a[i:ni])
                lb = sum(lens_b[j:nj])
                c = base + pen + _match_cost(la, lb)
                if c < cost[ni][nj]:
                    cost[ni][nj] = c
                    back[ni][nj] = (i, j, pen + _match_cost(la, lb))
    beads: list[tuple[int, int, int, int, int]] = []
    i, j = n, m
    while i > 0 or j > 0:
        step = back[i][j]
        if step is None:  # unreachable unless both sides empty
            break
        pi, pj, c = step
        beads.append((pi, i, pj, j, c))
        i, j = pi, pj
    beads.reverse()
    return beads


def align_sentences(
    pairs: DataFrame,
    docs: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    url_a_col: str = "url_a",
    url_b_col: str = "url_b",
    max_sents: int = 512,
) -> DataFrame:
    """Align the sentences of every (url_a, url_b) page pair.

    -> one row per bead: (url_a, url_b, bead, a_lo, a_hi, b_lo, b_hi,
    text_a, text_b, cost, truncated). text_a/text_b join the bead's
    sentences with a single space; empty spans render as ''.

    ``pairs`` is typically ``bitext_candidates`` output; ``docs`` is the
    corpus. Sentence arrays above ``max_sents`` are sliced (flagged via
    ``truncated``) so the per-pair DP stays bounded.
    """
    sents = split_sentences_col(F.col(text_col))
    sided = docs.select(F.col(url_col).alias("_u"), sents.alias("_s"))
    joined = (
        pairs.select(F.col(url_a_col).alias("url_a"), F.col(url_b_col).alias("url_b"))
        .join(sided.select(F.col("_u").alias("url_a"), F.col("_s").alias("_sa")), "url_a")
        .join(sided.select(F.col("_u").alias("url_b"), F.col("_s").alias("_sb")), "url_b")
        .select(
            "url_a",
            "url_b",
            F.slice("_sa", 1, max_sents).alias("sents_a"),
            F.slice("_sb", 1, max_sents).alias("sents_b"),
            ((F.size("_sa") > max_sents) | (F.size("_sb") > max_sents)).alias(
                "truncated"
            ),
        )
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "url_a": [], "url_b": [], "bead": [], "a_lo": [], "a_hi": [],
                "b_lo": [], "b_hi": [], "text_a": [], "text_b": [],
                "cost": [], "truncated": [],
            }
            for ua, ub, sa, sb, trunc in zip(
                pdf["url_a"], pdf["url_b"], pdf["sents_a"], pdf["sents_b"],
                pdf["truncated"],
            ):
                sa = list(sa)
                sb = list(sb)
                beads = gale_church_align(
                    [len(s) for s in sa], [len(s) for s in sb]
                )
                for k, (alo, ahi, blo, bhi, c) in enumerate(beads):
                    out["url_a"].append(ua)
                    out["url_b"].append(ub)
                    out["bead"].append(k)
                    out["a_lo"].append(alo)
                    out["a_hi"].append(ahi)
                    out["b_lo"].append(blo)
                    out["b_hi"].append(bhi)
                    out["text_a"].append(" ".join(sa[alo:ahi]))
                    out["text_b"].append(" ".join(sb[blo:bhi]))
                    out["cost"].append(c)
                    out["truncated"].append(bool(trunc))
            yield pd.DataFrame(out)

    return joined.mapInPandas(gen, schema=ALIGN_SCHEMA)
