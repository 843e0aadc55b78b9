"""Probabilistic record linkage — the Fellegi–Sunter band.

The reference's reconciliation (`/root/reference/backend/server.js:500-560`)
scores extracted invoices against a ledger with ad-hoc fuzzy weights
(vendor similarity + amount tolerance). This module generalizes that into
the classical Fellegi–Sunter (1969) decision model every production
record-linkage system uses: per-field agreement weights
``w_agree = log2(m/u)`` / ``w_disagree = log2((1-m)/(1-u))`` summed into a
match score, with a three-way decision (match / possible / non-match)
against two thresholds. ``m`` = P(field agrees | true match), ``u`` =
P(field agrees | non-match).

Scale shape (10^12 rows):

- **Blocked equi-join only.** Candidate pairs come from a shuffle
  hash/sort-merge join on a caller-supplied block key — never a cross
  product. Skewed blocks are the caller's contract (compose with the
  repo's hot-key salting / capped blocking; see sources/pages.py).
- **Weights are literals.** m/u are fitted offline (EM in production;
  fixed published priors here, which keeps the whole score a codegen
  column expression — no Python crossing, no UDF).
- **Missing-data rule.** A NULL on either side contributes weight 0
  (standard FS practice: absence is evidence of nothing).
- ``blocking_metrics`` evaluates candidate-generation quality WITHOUT
  materializing candidate pairs: candidate counts come from block-size
  products (sum over blocks of n_a*n_b) and recall from whether a truth
  pair's two block keys are equal — two aggregate jobs total regardless
  of how many schemes are swept, which is what makes sweeping blocking
  schemes feasible at corpus scale.

Cross-engine contract: weights are Python-float literals embedded
identically in the Spark plan and the DuckDB oracle; scores are summed in
a fixed left-to-right chain and rounded on the 1e-6 grid (functions/
text.py:roundn), so value hashes match bit-for-bit.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from invoice_ocr_reconciler_spark.functions.text import roundn


@dataclass(frozen=True)
class FieldSpec:
    """One compared field: columns ``a_<name>`` / ``b_<name>`` must exist
    on the joined frame. m/u in (0,1), m > u."""

    name: str
    m: float
    u: float

    @property
    def w_agree(self) -> float:
        return math.log2(self.m / self.u)

    @property
    def w_disagree(self) -> float:
        return math.log2((1.0 - self.m) / (1.0 - self.u))


def agreement_col(name: str) -> Column:
    """The ONE missing-data-aware field-agreement contract shared by
    scoring (fs_linkage via _field_weight) and EM training (fs_em_fit
    callers): NULL on either side -> NULL (field unobserved), else
    equality. Train and score through this single definition or the two
    silently diverge."""
    a, b = F.col(f"a_{name}"), F.col(f"b_{name}")
    return F.when(
        a.isNull() | b.isNull(), F.lit(None).cast("boolean")
    ).otherwise(a == b)


def _field_weight(spec: FieldSpec) -> Column:
    agree = agreement_col(spec.name)
    return (
        F.when(agree.isNull(), F.lit(0.0))
        .when(agree, F.lit(spec.w_agree))
        .otherwise(F.lit(spec.w_disagree))
    )


def fs_linkage(
    a: DataFrame,
    b: DataFrame,
    *,
    fields: list[FieldSpec],
    block_col: str = "block",
    id_a: str = "id_a",
    id_b: str = "id_b",
    lower: float,
    upper: float,
    keep_non_matches: bool = False,
) -> DataFrame:
    """Fellegi–Sunter linkage of ``a`` against ``b``.

    ``a`` carries (id_a, block, a_<field>...), ``b`` carries
    (id_b, block, b_<field>...). Returns (id_a, id_b, score, decision)
    for every blocked pair, non-matches dropped unless
    ``keep_non_matches`` (at corpus scale the non-match mass is ~all
    pairs; dropping it pre-shuffle-out is the point).

    -> one shuffle (the block equi-join); score + decision are pure
    codegen; no Python crossing anywhere.
    """
    pairs = a.join(b, on=block_col)
    score: Column | None = None
    for spec in fields:
        w = _field_weight(spec)
        score = w if score is None else score + w
    assert score is not None, "fs_linkage requires at least one field"
    out = pairs.select(
        id_a,
        id_b,
        roundn(score, 6).alias("score"),
    ).withColumn(
        "decision",
        F.when(F.col("score") >= F.lit(upper), F.lit("match"))
        .when(F.col("score") <= F.lit(lower), F.lit("non_match"))
        .otherwise(F.lit("possible")),
    )
    if not keep_non_matches:
        out = out.where(F.col("decision") != "non_match")
    return out


def fs_weight_sql(spec: FieldSpec) -> str:
    """The DuckDB replay of one field's weight — identical literals,
    identical CASE order, so the summed score is bit-equal."""
    # explicit DOUBLE casts: DuckDB types bare numeric literals as DECIMAL,
    # which would silently switch the score to decimal arithmetic
    return (
        f"CASE WHEN a_{spec.name} IS NULL OR b_{spec.name} IS NULL "
        f"THEN CAST(0.0 AS DOUBLE) "
        f"WHEN a_{spec.name} = b_{spec.name} "
        f"THEN CAST({spec.w_agree!r} AS DOUBLE) "
        f"ELSE CAST({spec.w_disagree!r} AS DOUBLE) END"
    )


def blocking_metrics(
    records: DataFrame,
    truth_pairs: DataFrame,
    schemes: dict[str, Column],
    *,
    id_col: str = "rec_id",
    side_col: str = "side",
) -> DataFrame:
    """Blocking-scheme sweep: reduction ratio + pairs completeness per
    scheme, WITHOUT materializing a single candidate pair.

    ``records`` = union of both linkage sides with ``side`` in ('a','b');
    ``truth_pairs`` = (id_a, id_b) ground-truth matches; ``schemes`` maps
    scheme name -> block-key Column over ``records``.

    reduction_ratio   = 1 - sum_over_blocks(n_a*n_b) / (N_a*N_b)
    pairs_completeness = |truth pairs whose two block keys are equal| / |truth|

    Plan: ONE explode of the scheme array per record (rows x n_schemes),
    one groupBy (scheme, key) for block sizes -> per-scheme candidate
    mass as sum of products; truth coverage via two broadcast-sized joins
    of truth against the exploded keys. Aggregate-only — candidate pairs
    are never generated, which is the only way a blocking sweep is
    runnable over 10^12 records.
    """
    keyed = records.select(
        id_col,
        side_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("scheme"),
                        key.cast("string").alias("bkey"),
                    )
                    for name, key in schemes.items()
                ]
            )
        ).alias("sk"),
    ).select(id_col, side_col, "sk.scheme", "sk.bkey")
    # a NULL block key never joins in fs_linkage's equi-join, so the NULL
    # group contributes NO candidate mass and is not a block — but its
    # records still count in the totals (nulling records out IS reduction;
    # the completeness side already treats NULL keys as uncovered because
    # NULL == NULL is not true)
    sizes = keyed.groupBy("scheme", "bkey").agg(
        F.sum(F.when(F.col(side_col) == "a", 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col(side_col) == "b", 1).otherwise(0)).alias("n_b"),
    )
    joinable = F.col("bkey").isNotNull()
    cand = sizes.groupBy("scheme").agg(
        F.sum(
            F.when(joinable, F.col("n_a") * F.col("n_b")).otherwise(0)
        ).alias("cand_pairs"),
        F.sum("n_a").alias("total_a"),
        F.sum("n_b").alias("total_b"),
        F.sum(F.when(joinable, 1).otherwise(0)).alias("n_blocks"),
    )

    ka = keyed.where(F.col(side_col) == "a").select(
        F.col(id_col).alias("id_a"), "scheme", F.col("bkey").alias("bkey_a")
    )
    kb = keyed.where(F.col(side_col) == "b").select(
        F.col(id_col).alias("id_b"), "scheme", F.col("bkey").alias("bkey_b")
    )
    # truth total rides the lazy plan as a broadcast 1-row aggregate —
    # no driver-side count() job at plan-construction time
    truth_total = truth_pairs.groupBy().agg(
        F.count(F.lit(1)).cast("double").alias("truth_n")
    )
    covered = (
        truth_pairs.join(ka, "id_a")
        .join(kb, ["id_b", "scheme"])
        .groupBy("scheme")
        .agg(
            F.sum(
                F.when(F.col("bkey_a") == F.col("bkey_b"), 1).otherwise(0)
            ).alias("covered")
        )
    )

    return (
        cand.join(covered, "scheme", "left")
        .crossJoin(F.broadcast(truth_total))
        .select(
            "scheme",
            "n_blocks",
            "cand_pairs",
            roundn(
                F.lit(1.0)
                - F.col("cand_pairs") / (F.col("total_a") * F.col("total_b")),
                6,
            ).alias("reduction_ratio"),
            roundn(
                F.coalesce(F.col("covered"), F.lit(0)) / F.col("truth_n"),
                6,
            ).alias("pairs_completeness"),
        )
    )


def fs_em_fit(
    pairs: DataFrame,
    agree_cols: list[str],
    *,
    iters: int = 30,
    init_p: float = 0.1,
    init_m: float = 0.8,
    init_u: float = 0.2,
) -> DataFrame:
    """Unsupervised m/u estimation for Fellegi–Sunter weights via EM over
    the AGGREGATED agreement-pattern table (Winkler's classic recipe) —
    the production path for the priors ``fs_linkage`` consumes.

    ``pairs`` = blocked candidate pairs with one boolean agreement column
    per field (NULL = comparison not possible; contributes nothing to
    that field's likelihood or update). The corpus-scale trick is that EM
    never touches pairs: ONE groupBy over the agreement columns collapses
    10^12 candidate pairs to at most 3^k pattern rows, and the EM loop
    runs driver-side on those integer counts — exact, deterministic at
    any parallelism, and free (same counting-only shape as the NB
    classifier's training).

    Returns one row per field: (field, m, u, w_agree, w_disagree), plus
    the fitted match prevalence under field '__p__' (m holds p, the other
    columns NULL). Weights ride the 1e-6 grid. Conditional independence
    between fields is assumed, as in the original model.
    """
    counts = [
        (tuple(row[c] for c in agree_cols), row["n"])
        for row in pairs.groupBy(*agree_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    counts.sort(key=lambda t: tuple(-1 if v is None else int(v) for v in t[0]))
    k = len(agree_cols)
    p = init_p
    m = [init_m] * k
    u = [init_u] * k
    for _ in range(iters):
        # E-step: posterior match probability per pattern
        num_m_tot = 0.0
        tot = 0.0
        g_list = []
        for gamma, n in counts:
            lm = p
            lu = 1.0 - p
            for i, v in enumerate(gamma):
                if v is None:
                    continue
                lm *= m[i] if v else (1.0 - m[i])
                lu *= u[i] if v else (1.0 - u[i])
            g = lm / (lm + lu) if (lm + lu) > 0 else 0.0
            g_list.append(g)
            num_m_tot += n * g
            tot += n
        p = num_m_tot / tot if tot else init_p
        # M-step: per-field agreement rates among (non-null) comparisons
        for i in range(k):
            am = au = dm = du = 0.0
            for (gamma, n), g in zip(counts, g_list):
                v = gamma[i]
                if v is None:
                    continue
                if v:
                    am += n * g
                    au += n * (1.0 - g)
                dm += n * g
                du += n * (1.0 - g)
            # clamp away from {0,1} so weights stay finite (standard)
            if dm > 0:
                m[i] = min(max(am / dm, 1e-6), 1.0 - 1e-6)
            if du > 0:
                u[i] = min(max(au / du, 1e-6), 1.0 - 1e-6)

    # label-identifiability guard: the two latent classes are symmetric,
    # so under match-heavy candidate sets (tight blocking, prevalence >
    # 0.5) EM converges to the SWAPPED solution — m < u and every weight
    # inverted, which would make fs_linkage drop true matches silently.
    # The match class is by definition the minority/high-agreement one:
    # relabel when p lands above 0.5.
    if p > 0.5:
        p = 1.0 - p
        m, u = u, m

    spark = pairs.sparkSession
    rows = [
        (
            c,
            float(m[i]),
            float(u[i]),
            float(math.log2(m[i] / u[i])),
            float(math.log2((1.0 - m[i]) / (1.0 - u[i]))),
        )
        for i, c in enumerate(agree_cols)
    ] + [("__p__", float(p), None, None, None)]
    out = spark.createDataFrame(
        rows, "field string, m double, u double, w_agree double, w_disagree double"
    )
    return out.select(
        "field",
        roundn(F.col("m"), 6).alias("m"),
        roundn(F.col("u"), 6).alias("u"),
        roundn(F.col("w_agree"), 6).alias("w_agree"),
        roundn(F.col("w_disagree"), 6).alias("w_disagree"),
    )


def sorted_neighborhood_pairs(
    records: DataFrame,
    *,
    id_col: str = "id",
    key_col: str = "snm_key",
    bucket_cols: tuple[str, ...] = (),
    window: int = 4,
) -> DataFrame:
    """Sorted-neighborhood candidate generation (Hernández & Stolfo
    1995): sort all records by a compound key and pair every record with
    its w-1 successors — the classic complement to equi-blocking when
    keys are noisy (a typo'd join key still lands NEXT TO its duplicate
    in sort order even though it equi-blocks apart).

    Scale shape: the GLOBAL rank is never computed with a single-
    partition window. ``bucket_cols`` must be a PREFIX of the sort key
    (order-aligned), so rank = row_number within bucket + the cumulative
    count of earlier buckets — the bucket-offset frame is one row per
    bucket (driver-tiny) and rides a broadcast. Pair generation is an
    explode of offsets 1..w-1 plus an EQUI-join on rank+d: exactly
    n·(w-1) candidate rows, never quadratic, no range join.

    Output: (id_a, id_b, key_a, key_b, d) where d = rank distance.
    """
    if int(window) < 2:
        raise ValueError("window must be >= 2")
    order = [F.col(key_col), F.col(id_col)]
    if bucket_cols:
        w_in = Window.partitionBy(*bucket_cols).orderBy(*order)
        per = records.groupBy(*bucket_cols).agg(
            F.count(F.lit(1)).cast("long").alias("_n"),
            F.min(key_col).alias("_k0"),
        )
        # buckets are contiguous key ranges (prefix-aligned, the caller
        # contract), so ordering buckets by their MIN KEY reproduces the
        # pure global key order — tuple order of the bucket cols could
        # disagree with the concatenated-key string order ('src1' vs
        # 'src10' around the separator), min-key never does.
        w_off = Window.partitionBy(F.lit(1)).orderBy(
            "_k0"
        )  # one row per bucket — driver-sized by contract
        offsets = per.select(
            *bucket_cols,
            (
                F.coalesce(
                    F.sum("_n").over(
                        w_off.rowsBetween(
                            Window.unboundedPreceding, -1
                        )
                    ),
                    F.lit(0),
                )
            ).alias("_off"),
        )
        ranked = (
            records.join(F.broadcast(offsets), list(bucket_cols))
            .select(
                F.col(id_col).alias("rid"),
                F.col(key_col).alias("rkey"),
                (F.row_number().over(w_in) + F.col("_off")).alias("rank"),
            )
        )
    else:
        # explicit small-data escape hatch: one-partition window
        w_in = Window.partitionBy(F.lit(1)).orderBy(*order)
        ranked = records.select(
            F.col(id_col).alias("rid"),
            F.col(key_col).alias("rkey"),
            F.row_number().over(w_in).cast("long").alias("rank"),
        )
    probes = (
        ranked.select(
            "rid",
            "rkey",
            "rank",
            F.explode(
                F.sequence(F.lit(1), F.lit(int(window) - 1))
            ).alias("d"),
        )
        .select(
            F.col("rid").alias("id_a"),
            F.col("rkey").alias("key_a"),
            "d",
            (F.col("rank") + F.col("d")).alias("rank"),
        )
    )
    return (
        probes.join(
            ranked.select(
                F.col("rid").alias("id_b"),
                F.col("rkey").alias("key_b"),
                "rank",
            ),
            "rank",
        )
        .select("id_a", "id_b", "key_a", "key_b", F.col("d").cast("int").alias("d"))
        .orderBy("id_a", "d")
    )
