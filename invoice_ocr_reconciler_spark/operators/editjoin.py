"""Edit-distance-1 similarity join via deletion neighborhoods (FastSS /
SymSpell blocking).

The vocabulary-cleanup pass of a web-scale corpus: find every pair of
distinct terms within Levenshtein distance 1 (typos, OCR slips, scanner
artifacts) WITHOUT an all-pairs comparison. Two terms are within edit
distance 1 only if they share a key in
``neighborhood(t) = {t} ∪ {t with one char deleted}`` — substitutions
share the deletion at the edited position, insertions/deletions share the
shorter string itself — so an equi-join on deletion keys is a complete
candidate generator and ``levenshtein(a, b) <= 1`` is the exact verifier
(the join also surfaces a few distance-2 pairs, e.g. transposition-like
``abc``/``bca`` sharing ``bc``; the verifier drops them).

Scale shape (10^9-term vocabularies):

- key fan-out is len(term)+1 per term — corpus-linear, never quadratic;
- pair generation happens INSIDE key groups that are collapsed to arrays
  (the MinHash group-to-array idiom, operators/dedup.py) so the shuffle
  carries one row per key, and HOT_KEY_CAP drops degenerate keys (a
  2-char deletion variant shared by an alphabet's worth of 3-char terms
  is bounded; a pathological key is not) — same contract as MinHash's
  HOT_BUCKET_CAP: a capped key contributes no pairs, by design;
- the verifier runs on candidates only, JVM-side `levenshtein` (codegen).

Pure DataFrame ops end to end — no Python crossing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# keys whose group exceeds this produce no pairs (degenerate-key guard;
# ~alphabet-sized groups are the legitimate maximum for real text)
HOT_KEY_CAP = 1024


def deletion_keys(term_col: str = "term") -> F.Column:
    """array of blocking keys for one term: the term itself + every
    single-character deletion, deduplicated (``aa`` deletes to ``a``
    twice). Pure codegen — substring bounds are column expressions."""
    return F.expr(
        f"""array_distinct(concat(
              array({term_col}),
              transform(sequence(1, length({term_col})), i ->
                concat(substring({term_col}, 1, i - 1),
                       substring({term_col}, i + 1,
                                 length({term_col}) - i)))))"""
    )


def typo_pairs(
    terms: DataFrame,
    *,
    term_col: str = "term",
    count_col: str | None = "cnt",
    min_len: int = 2,
    hot_key_cap: int = HOT_KEY_CAP,
) -> DataFrame:
    """All unordered pairs of distinct terms with levenshtein <= 1.

    `terms` must be distinct on `term_col`; `count_col` (optional) rides
    along as (c1, c2) for downstream canonical-form voting (the higher-
    count spelling wins). Terms shorter than `min_len` are dropped — a
    1-char term's deletion key is the empty string, which every other
    1-char term shares.

    Output: (t1, t2, c1, c2, lev) with t1 < t2, ordered.
    """
    cnt = (
        F.col(count_col).cast("long")
        if count_col is not None
        else F.lit(0).cast("long")
    )
    base = terms.where(F.length(term_col) >= int(min_len)).select(
        F.col(term_col).alias("term"), cnt.alias("cnt")
    )
    keyed = base.select(
        F.struct("term", "cnt").alias("m"),
        F.explode(deletion_keys("term")).alias("key"),
    )
    groups = (
        keyed.groupBy("key")
        .agg(F.sort_array(F.collect_list("m")).alias("members"))
        .where(F.size("members").between(2, int(hot_key_cap)))
    )
    pairs = groups.select(
        F.explode(
            F.expr(
                """flatten(transform(members, (m, i) ->
                     transform(slice(members, i + 2, size(members) - i - 1),
                               o -> struct(m AS a, o AS b))))"""
            )
        ).alias("p")
    ).select(
        F.col("p.a.term").alias("t1"),
        F.col("p.b.term").alias("t2"),
        F.col("p.a.cnt").alias("c1"),
        F.col("p.b.cnt").alias("c2"),
    )
    out = (
        pairs.distinct()
        .withColumn("lev", F.levenshtein("t1", "t2").cast("int"))
        .where(F.col("lev") <= 1)
    )
    return out.orderBy("t1", "t2")


def canonical_spelling(
    pairs: DataFrame,
    *,
    min_ratio: float = 4.0,
) -> DataFrame:
    """Correction map from typo_pairs(): a term is a misspelling of its
    edit-1 neighbor when the neighbor is at least `min_ratio`× more
    frequent; each typo maps to its single highest-count neighbor
    (count desc, term asc tie-break — one window, no self-join).
    """
    both = pairs.select(
        F.col("t1").alias("typo"),
        F.col("c1").alias("typo_cnt"),
        F.col("t2").alias("fix"),
        F.col("c2").alias("fix_cnt"),
    ).unionByName(
        pairs.select(
            F.col("t2").alias("typo"),
            F.col("c2").alias("typo_cnt"),
            F.col("t1").alias("fix"),
            F.col("c1").alias("fix_cnt"),
        )
    )
    elig = both.where(
        F.col("fix_cnt") >= F.col("typo_cnt") * F.lit(float(min_ratio))
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("typo")
        .orderBy(F.col("fix_cnt").desc(), F.col("fix"))
    )
    return (
        elig.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("typo", "typo_cnt", "fix", "fix_cnt")
        .orderBy("typo")
    )
