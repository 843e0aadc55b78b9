"""C4 line-level cleaning rules as one pure-codegen pass.

The exact published rule set from C4 (Raffel et al. 2020, "Exploring the
Limits of Transfer Learning...", §2.2 — the `c4_utils` cleaning in the
public TensorFlow-Datasets pipeline), the most-cited web-text cleaning
recipe and the baseline every later pipeline (Gopher, RefinedWeb, Dolma,
FineWeb) compares against:

  line level (applied to newline-split, trimmed lines):
    - keep only lines ending in a terminal punctuation mark
      (`.`, `!`, `?`, optionally followed by a closing quote);
    - keep only lines with >= `min_words_per_line` words (paper: 5);
    - drop any line containing the word "javascript" (case-insensitive) —
      the "please enable JavaScript" banner cut.
  page level (the whole document is dropped):
    - any curly brace `{` anywhere (code / templating leak);
    - the phrase "lorem ipsum" (placeholder text);
    - fewer than `min_kept_lines` surviving lines (paper: 3 sentences;
      the line-count form is the common implementation simplification).

  The paper's remaining page rules live in their own composable ops:
  the bad-words page filter is `wordlist_flags` (broadcast lexicon), the
  three-sentence-span dedup is `line_dedup` / `duplicated_spans`, and
  langid is `lang_id` — C4 composes them; this op is the line mechanics.

Everything is codegen column expressions over the line array (split,
transform, filter, array_join) — one projection, zero shuffles, zero
Python crossings: at 10^12 documents this pass is scan-bound, exactly
what a cleaning rule should be. Per-element work in the filter lambda
touches only the lambda variable (the functions/text.py HOF contract —
no captured-expression re-evaluation).

Output one row per input document (kept AND dropped — the audit trail a
curation pipeline logs before discarding):
  (id, kept, drop_reason in {brace, lorem_ipsum, too_few_lines} | NULL,
   n_lines_kept, n_lines_dropped, text_clean — NULL for dropped docs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# terminal punctuation, optional closing quote — basic character classes
# only, so Java regex (Spark) and RE2 (DuckDB oracle) agree
TERMINAL_PUNCT_RE = "[.!?][\"']?$"


def c4_clean(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words_per_line: int = 5,
    min_kept_lines: int = 3,
) -> DataFrame:
    """Apply the C4 line + page rules; see module docstring."""
    raw = F.coalesce(F.col(text_col), F.lit(""))
    # full \s strip per line, NOT trim(): trim removes only ASCII spaces,
    # so CRLF input would keep a trailing \r in every cleaned line and a
    # trailing tab would wrongly fail the terminal-punctuation rule —
    # the paper's reference implementation strip()s lines
    trimmed = F.transform(
        F.split(raw, "\n"),
        lambda l: F.regexp_replace(l, r"^\s+|\s+$", ""),
    )

    def _line_ok(l):
        words = F.size(F.filter(F.split(l, r"\s+"), lambda t: t != ""))
        return (
            (words >= F.lit(int(min_words_per_line)))
            & l.rlike(TERMINAL_PUNCT_RE)
            & ~F.contains(F.lower(l), F.lit("javascript"))
        )

    kept = F.filter(trimmed, _line_ok)
    n_total = F.size(F.filter(trimmed, lambda l: l != ""))
    n_kept = F.size(kept)
    lower_text = F.lower(raw)
    reason = (
        F.when(F.contains(raw, F.lit("{")), F.lit("brace"))
        .when(F.contains(lower_text, F.lit("lorem ipsum")), F.lit("lorem_ipsum"))
        .when(n_kept < F.lit(int(min_kept_lines)), F.lit("too_few_lines"))
    )
    return docs.select(
        F.col(id_col),
        reason.isNull().alias("kept"),
        reason.alias("drop_reason"),
        n_kept.cast("int").alias("n_lines_kept"),
        (n_total - n_kept).cast("int").alias("n_lines_dropped"),
        F.when(reason.isNull(), F.array_join(kept, "\n")).alias("text_clean"),
    )
