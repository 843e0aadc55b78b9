"""Training-data curation pipeline: the composition a 100 TB pretraining
corpus actually runs — annotate -> exact-dedup -> quality/language filter ->
near-dup drop -> curated table + audit stats.

All annotation and filtering stages are pure codegen column expressions
(functions/text.py); the only Python crossing is the MinHash signature pass
of the optional near-dup stage (operators/dedup.py, banded + hot-bucket
capped). Stage order matters at scale: exact dedup and the quality/lang cut
run FIRST so the (expensive) near-dup signatures are computed only for
survivors.

The SQL-expressible subset (annotate + exact-dedup + filter) is
DuckDB-oracled via the `curation_filter` queries() entry; the full pipeline
(+ near-dup) is `curation_pipeline` (rows-only: MinHash sketch semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from invoice_ocr_reconciler_spark.functions.text import (
    fingerprint_col,
    lang_id_cols,
    quality_score_cols,
    token_count_col,
)


def annotate_documents(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One codegen pass adding fingerprint, dup rank (first-wins on doc_id),
    quality score, language prediction, and token count."""
    q = quality_score_cols(F.col(text_col))
    lang = lang_id_cols(F.col(text_col))
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    return (
        docs.withColumn("fingerprint", fingerprint_col(F.col(text_col)))
        .withColumn("quality_score", q["quality_score"])
        .withColumn("lang_pred", lang["lang_pred"])
        .withColumn("n_tokens", token_count_col(F.col(text_col)))
        .withColumn("dup_rank", F.row_number().over(w))
    )


def curate_documents(
    docs: DataFrame,
    min_quality: float = 0.55,
    langs: tuple[str, ...] = ("en",),
    near_dup_threshold: float = 0.7,
    with_near_dup: bool = True,
    near_dup_exact: bool = False,
    text_col: str = "text",
    max_top2gram_frac: float | None = None,
    redact_pii: bool = False,
    sample_rates: dict[str, int] | None = None,
    sample_default_rate: int = 0,
    gopher: bool = False,
    benchmark: DataFrame | None = None,
    decontam_n: int = 13,
) -> dict[str, DataFrame]:
    """-> {'curated', 'stats'}.

    Keep rules, in order (each survivor set feeds the next stage):
    1. exact duplicates: first occurrence (min doc_id) wins;
    2. quality_score >= min_quality AND lang_pred in langs;
    3. repetition cut (optional, `max_top2gram_frac`): Gopher-style
       boilerplate/spam filter — drop docs whose most frequent word 2-gram
       exceeds the fraction (functions/text.py:repetition_cols; computed
       only when the stage is on);
    3b. Gopher rule filter (optional, `gopher=True`): drop docs failing
       functions/text.py:gopher_rules_cols' combined pass flag — pure
       codegen, computed only when on;
    3c. benchmark decontamination (optional, `benchmark` frame): drop docs
       sharing any `decontam_n`-gram with the benchmark set
       (operators/decontam.py; the small contaminated-id set joins back on
       doc_id — AQE broadcasts it);
    4. near-duplicates (MinHash est_jaccard >= threshold):
       - default (`near_dup_exact=False`): the LOWER doc_id of each
         candidate pair survives. doc_b is dropped whenever it pairs with
         ANY lower id, even if that id was itself dropped — deliberate:
         transitive chains collapse to their minimum representative without
         an iterative pass, the cheap approximation. It over-drops on
         chains (for pairs (5,9),(9,3) it keeps {3,5}; one doc per cluster
         would keep only {3}).
       - `near_dup_exact=True`: exact connected components over the pair
         graph (operators/cluster.py, large-star/small-star); exactly the
         cluster-min survives. Costs O(log n) extra rounds over the
         LSH-sized pair list — still tiny next to the corpus.
    5. stratified sampling (optional, `sample_rates` by lang_pred):
       deterministic md5-bucket keep decision (operators/sampling.py) —
       reproducible training-mix control as the LAST stage so rates apply
       to the deduped, filtered corpus;
    6. PII redaction (optional, `redact_pii`): curated rows gain
       `redacted_text` + `n_pii` — computed only for survivors (the
       expensive regex cascade never runs on dropped docs).

    'stats' is one row of audit counters (input / kept / dropped per
    stage; off stages report 0) — the batch analog of per-run lineage
    metrics. The counters always satisfy
    n_input = n_exact_dup + n_filtered_out + n_repetition_out
              + n_gopher_out + n_contaminated
              + n_near_dup + n_sampled_out + n_curated.
    """
    from pyspark.storagelevel import StorageLevel

    # persist: the annotated frame feeds the stage counters, the filter
    # chain, and (via survivors) the near-dup signature pass — without it
    # each action re-runs the annotation scan
    ann = annotate_documents(docs, text_col)
    qual_ok = (F.col("quality_score") >= min_quality) & F.col("lang_pred").isin(
        *langs
    )
    if max_top2gram_frac is not None:
        from invoice_ocr_reconciler_spark.functions.text import repetition_cols

        rep = repetition_cols(F.col(text_col))
        ann = ann.withColumn("top_2gram_frac", rep["top_2gram_frac"])
        rep_ok = F.col("top_2gram_frac") <= float(max_top2gram_frac)
    else:
        rep_ok = F.lit(True)
    if gopher:
        from invoice_ocr_reconciler_spark.functions.text import gopher_rules_cols

        ann = ann.withColumn(
            "gopher_pass", gopher_rules_cols(F.col(text_col))["gopher_pass"]
        )
        gopher_ok = F.col("gopher_pass") == 1
    else:
        gopher_ok = F.lit(True)
    if benchmark is not None:
        from invoice_ocr_reconciler_spark.operators.decontam import decontaminate

        # persist BEFORE fanning out: survivors and both decontaminate
        # scans would otherwise each replay the full annotation lineage
        # (fingerprint md5, quality/lang exprs, the dup_rank window
        # exchange) — three annotation passes in one job at corpus scale
        ann = ann.persist(StorageLevel.MEMORY_AND_DISK)
        # gram-explode only the docs that survived stages 1-3: the
        # n-gram expansion is the most expensive per-row blowup in the
        # pipeline, and the contamination counter/keep flag only reads
        # the flag conjoined with the earlier stages, so flags for
        # already-cut docs are never observed (left join -> False).
        survivors = ann.filter(
            (F.col("dup_rank") == 1) & qual_ok & rep_ok & gopher_ok
        )
        contam_ids = (
            decontaminate(survivors, benchmark, n=decontam_n, text_col=text_col)
            .filter(F.col("contaminated") == 1)
            .select("doc_id", F.lit(True).alias("is_contam"))
        )
        ann = ann.join(contam_ids, "doc_id", "left").withColumn(
            "is_contam", F.coalesce(F.col("is_contam"), F.lit(False))
        )
        contam_ok = ~F.col("is_contam")
    else:
        contam_ok = F.lit(True)
    ann = ann.persist(StorageLevel.MEMORY_AND_DISK)
    first = F.col("dup_rank") == 1
    keep = first & qual_ok & rep_ok & gopher_ok & contam_ok
    # ONE conditional agg for every pre-near-dup counter (no per-stage
    # count() jobs — the same discipline as the reconcile summary)
    base = ann.agg(
        F.count("*").alias("n_input"),
        F.coalesce(F.sum((~first).cast("long")), F.lit(0)).alias("n_exact_dup"),
        F.coalesce(
            F.sum((first & ~qual_ok).cast("long")), F.lit(0)
        ).alias("n_filtered_out"),
        F.coalesce(
            F.sum((first & qual_ok & ~rep_ok).cast("long")), F.lit(0)
        ).alias("n_repetition_out"),
        F.coalesce(
            F.sum((first & qual_ok & rep_ok & ~gopher_ok).cast("long")), F.lit(0)
        ).alias("n_gopher_out"),
        F.coalesce(
            F.sum(
                (first & qual_ok & rep_ok & gopher_ok & ~contam_ok).cast("long")
            ),
            F.lit(0),
        ).alias("n_contaminated"),
    ).collect()[0]
    filtered = ann.filter(keep)

    if with_near_dup:
        from invoice_ocr_reconciler_spark.operators.dedup import minhash_lsh_pairs

        pairs = minhash_lsh_pairs(
            filtered, text_col=text_col, threshold=near_dup_threshold
        )
        if near_dup_exact:
            from invoice_ocr_reconciler_spark.operators.cluster import (
                connected_components,
            )

            comp = connected_components(pairs)
            drop = comp.filter(F.col("component") != F.col("doc_id")).select(
                "doc_id"
            )
        else:
            drop = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
        deduped = filtered.join(drop, "doc_id", "left_anti")
    else:
        deduped = filtered

    if sample_rates is not None:
        from invoice_ocr_reconciler_spark.operators.sampling import (
            stratified_sample,
        )

        curated = stratified_sample(
            deduped,
            rates=sample_rates,
            default_rate=sample_default_rate,
            strata_col="lang_pred",
        )
        out_cols = [
            "doc_id", "fingerprint", "quality_score", "lang_pred",
            "n_tokens", "sample_bucket",
        ]
    else:
        curated = deduped
        out_cols = ["doc_id", "fingerprint", "quality_score", "lang_pred", "n_tokens"]

    if redact_pii:
        from invoice_ocr_reconciler_spark.functions.pii import (
            pii_count_cols,
            redact_pii_col,
        )

        pii = pii_count_cols(F.col(text_col))
        curated = curated.withColumn(
            "redacted_text", redact_pii_col(F.col(text_col))
        ).withColumn(
            "n_pii", pii["n_emails"] + pii["n_ips"] + pii["n_phones"]
        )
        out_cols += ["redacted_text", "n_pii"]

    curated = curated.select(*out_cols)
    cur_aggs = [
        F.count("*").alias("n"),
        F.coalesce(F.sum("n_tokens"), F.lit(0)).alias("t"),
    ]
    if sample_rates is not None:
        # the sampled_out counter needs the pre-sampling survivor count;
        # persist the deduped frame so the (expensive) near-dup stage runs
        # once, not once per downstream action
        if with_near_dup:
            deduped = deduped.persist(StorageLevel.MEMORY_AND_DISK)
        n_dedup = deduped.count()
    cur = curated.agg(*cur_aggs).collect()[0]
    n_kept_pre_neardup = (
        base["n_input"]
        - base["n_exact_dup"]
        - base["n_filtered_out"]
        - base["n_repetition_out"]
        - base["n_gopher_out"]
        - base["n_contaminated"]
    )
    if sample_rates is not None:
        n_near_dup = n_kept_pre_neardup - n_dedup
        n_sampled_out = n_dedup - cur["n"]
    else:
        n_near_dup = n_kept_pre_neardup - cur["n"]
        n_sampled_out = 0
    stats = curated.sparkSession.createDataFrame(
        [
            (
                base["n_input"],
                base["n_exact_dup"],
                base["n_filtered_out"],
                base["n_repetition_out"],
                base["n_gopher_out"],
                base["n_contaminated"],
                n_near_dup,
                n_sampled_out,
                cur["n"],
                int(cur["t"]),
            )
        ],
        "n_input bigint, n_exact_dup bigint, n_filtered_out bigint, "
        "n_repetition_out bigint, n_gopher_out bigint, n_contaminated bigint, "
        "n_near_dup bigint, n_sampled_out bigint, "
        "n_curated bigint, curated_tokens bigint",
    )
    return {"curated": curated, "stats": stats}
