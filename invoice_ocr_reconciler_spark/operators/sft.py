"""SFT conversation-format QA: validate chat transcripts at corpus scale.

Instruction-tuning corpora are conversations — arrays of (role, content)
turns. Before training, every serious pipeline validates the format:
a malformed 0.1% (double user turns, empty assistant targets, roles
outside the schema, truncated conversations ending on the user) silently
corrupts loss masking. This operator emits one audit row per
conversation with every violation flag plus a single precedence-ordered
`first_violation`, so the curation pipeline can drop/repair and report
reconciling counts.

Checked rules (the common chat-template contract):
  * empty_conv     — zero turns;
  * bad_start      — first role not in {system, user};
  * late_system    — a system turn anywhere after position 1;
  * bad_role       — any role outside {system, user, assistant};
  * repeated_role  — two ADJACENT turns with the same role (broken
                     alternation);
  * empty_turn     — any turn whose content is blank/whitespace;
  * bad_end        — last role is not `assistant` (no training target).

`valid` is the conjunction; `first_violation` picks the first true flag
in the order above (NULL when valid).

Plan shape: pure codegen over the turns array — the roles/contents
projections happen in a PRIOR select (the functions/text.py HOF-capture
contract: adjacency is checked by zipping two aligned slices of the
roles array, never by per-element element_at over the upstream
expression), zero joins, zero shuffles, zero Python. At 10^12
conversations this pass is scan-bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROLES = ("system", "user", "assistant")


def validate_conversations(
    convs: DataFrame,
    turns_col: str = "turns",
    id_col: str = "conv_id",
) -> DataFrame:
    """One audit row per conversation; see module docstring.

    `turns_col` is array<struct<role:string, content:string>>.
    """
    # totality: a NULL turns array folds to an empty conversation and a
    # NULL role folds to '' (-> bad_role) — three-valued logic must never
    # leak NULL into the flags, or malformed rows escape BOTH
    # where(valid) and where(~valid)
    projected = convs.select(
        F.col(id_col).alias("conv_id"),
        F.coalesce(
            F.transform(
                F.col(turns_col),
                lambda t: F.coalesce(t["role"], F.lit("")),
            ),
            F.array().cast("array<string>"),
        ).alias("roles"),
        F.coalesce(
            F.transform(
                F.col(turns_col),
                lambda t: F.coalesce(t["content"], F.lit("")),
            ),
            F.array().cast("array<string>"),
        ).alias("contents"),
    )
    roles = F.col("roles")
    contents = F.col("contents")
    n = F.size(roles)
    empty_conv = n == 0
    first_role = F.try_element_at(roles, F.lit(1))
    bad_start = (n > 0) & ~first_role.isin("system", "user")
    late_system = F.exists(
        F.slice(roles, 2, F.greatest(n - 1, F.lit(0))),
        lambda r: r == "system",
    )
    bad_role = F.exists(roles, lambda r: ~r.isin(*ROLES))
    repeated_role = F.exists(
        F.zip_with(
            F.slice(roles, 1, F.greatest(n - 1, F.lit(0))),
            F.slice(roles, 2, F.greatest(n - 1, F.lit(0))),
            lambda a, b: a == b,
        ),
        lambda x: x,
    )
    empty_turn = F.exists(contents, lambda c: F.trim(c) == "")
    bad_end = (n > 0) & (F.try_element_at(roles, n) != F.lit("assistant"))

    flags = [
        ("empty_conv", empty_conv),
        ("bad_start", bad_start),
        ("late_system", late_system),
        ("bad_role", bad_role),
        ("repeated_role", repeated_role),
        ("empty_turn", empty_turn),
        ("bad_end", bad_end),
    ]
    out = projected.select(
        "conv_id",
        n.alias("n_turns"),
        *[cond.alias(name) for name, cond in flags],
    )
    valid = None
    first_violation = None
    for name, _ in flags:
        valid = ~F.col(name) if valid is None else (valid & ~F.col(name))
        first_violation = (
            F.when(F.col(name), F.lit(name))
            if first_violation is None
            else first_violation.when(F.col(name), F.lit(name))
        )
    return out.select(
        "*",
        valid.alias("valid"),
        first_violation.alias("first_violation"),
    )
