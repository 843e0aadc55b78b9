"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)``   — flagship extract+reconcile pipeline on sf0.001.
``queries()``      — one entry per implemented operator (SURVEY.md §2 +
                     training-data ops), each (spark, sf_dir) -> DataFrame.
``oracle_sql()``   — DuckDB-runnable equivalents; omitted for genuinely
                     non-SQL ops (extraction UDFs, MinHash/SimHash/LSH,
                     greedy assignment) which get rows-only checks.

Column names/types are aligned between both sides (the driver hashes values
after sorting columns by name); money aggregates are rounded on both sides.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

# make the package importable regardless of the caller's cwd
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF0001 = "/root/testdata/sf0.001"


_LEDGER_CACHE: dict[str, object] = {}


def _pages_and_ledger(spark: SparkSession, sf_dir: str):
    from invoice_ocr_reconciler_spark import datagen

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # row count from parquet footers driver-side — avoids a Spark job just to
    # size the ledger dimension
    import duckdb

    n_docs = duckdb.sql(
        f"SELECT count(*) FROM '{sf_dir}/documents.parquet'"
    ).fetchone()[0]
    pages = datagen.pages_from_documents(docs)
    if sf_dir not in _LEDGER_CACHE:
        _LEDGER_CACHE[sf_dir] = datagen.ledger_pdf(max(30, n_docs // 8), n_docs)
    ledger = spark.createDataFrame(_LEDGER_CACHE[sf_dir], schema=datagen.LEDGER_SCHEMA)
    return pages, ledger


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: pages (from sf0.001 documents) -> extract -> parse ->
    blocked fuzzy reconcile; returns the reconciliation results frame."""
    from invoice_ocr_reconciler_spark.pipeline import run_pipeline

    pages, ledger = _pages_and_ledger(spark, SF0001)
    out = run_pipeline(pages, ledger)
    res = out["results"]
    return res.select(
        "invoice_url",
        "record_id",
        "match_status",
        F.round("discrepancy", 4).alias("discrepancy"),
        "flag_reason",
        "confidence_score",
    )


# ---------------------------------------------------------------------------
# pipeline queries (non-SQL-expressible unless noted)
# ---------------------------------------------------------------------------

def q_extract_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2: full extraction stage; rows-only check (UDF semantics)."""
    from invoice_ocr_reconciler_spark import datagen
    from invoice_ocr_reconciler_spark.extraction.udfs import extract_pages

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ex = extract_pages(datagen.pages_from_documents(docs))
    return ex.select("url", "n_blocks", "n_chars", F.md5("extracted_text").alias("text_md5"))


def q_extract_identity_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extraction oracle subset: kinds 6/8 wrap the raw document text as the
    single main-content block, so extracted_text must equal documents.text
    byte-for-byte (boilerplate nav/sidebar/footer stripped around it)."""
    from invoice_ocr_reconciler_spark import datagen
    from invoice_ocr_reconciler_spark.extraction.udfs import extract_pages

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        (F.col("doc_id") % 10 == 6) | (F.col("doc_id") % 10 == 8)
    )
    ex = extract_pages(datagen.pages_from_documents(docs))
    return ex.select(
        F.regexp_extract("url", r"/doc/0*(\d+)\.html", 1).cast("bigint").alias("doc_id"),
        F.col("extracted_text"),
    )


def q_parse_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1-P12 regex cascades; rows-only (Python re semantics)."""
    from invoice_ocr_reconciler_spark import datagen
    from invoice_ocr_reconciler_spark.pipeline import extract_and_parse

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    inv = extract_and_parse(datagen.pages_from_documents(docs))
    return inv.select(
        "url", "invoice_number", "vendor_name", "invoice_date", "due_date",
        "subtotal", "tax", "total_amount", "currency", "confidence",
        F.size("line_items").alias("n_items"),
    )


def q_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 full reconcile; rows-only (greedy 1:1 is order-sequential)."""
    from invoice_ocr_reconciler_spark.pipeline import run_pipeline

    pages, ledger = _pages_and_ledger(spark, sf_dir)
    res = run_pipeline(pages, ledger)["results"]
    return res.select(
        "invoice_url", "record_id", "match_status",
        F.round("discrepancy", 4).alias("discrepancy"), "confidence_score",
    )


def q_reconcile_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 summary counters; rows-only."""
    from invoice_ocr_reconciler_spark.pipeline import run_pipeline

    pages, ledger = _pages_and_ledger(spark, sf_dir)
    return run_pipeline(pages, ledger)["summary"]


# --- training-data ops over documents/embeddings ---

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from invoice_ocr_reconciler_spark.operators.dedup import exact_duplicates

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return exact_duplicates(docs).select(
        "doc_id", "fingerprint", "dup_rank", "group_size", "is_duplicate"
    )


def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs; rows-only (sketch semantics)."""
    from invoice_ocr_reconciler_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return minhash_lsh_pairs(docs, threshold=0.5)


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs; rows-only."""
    from invoice_ocr_reconciler_spark.operators.dedup import simhash_near_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return simhash_near_pairs(docs, max_hamming=8)


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard over LSH candidates; rows-only."""
    from invoice_ocr_reconciler_spark.operators.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_verify,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cands = minhash_lsh_pairs(docs, threshold=0.3)
    return ngram_jaccard_verify(cands.select("doc_a", "doc_b"), docs, threshold=0.3)


def q_ngram_jaccard_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard kernel over a deterministic candidate set
    (all pairs among doc_id < 80) — DuckDB-checked: the oracle rebuilds the
    shingle sets as gram STRINGS, which matches the engine's 64-bit-hashed
    sets exactly absent hash collisions. The LSH-fed pipeline composition of
    the same kernel is dedup_ngram_jaccard (rows-only: minhash candidates)."""
    from invoice_ocr_reconciler_spark.operators.dedup import ngram_jaccard_verify

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sub = docs.filter(F.col("doc_id") < 80)
    a = sub.select(F.col("doc_id").alias("doc_a"))
    b = sub.select(F.col("doc_id").alias("doc_b"))
    cands = a.crossJoin(b).filter(F.col("doc_a") < F.col("doc_b"))
    return ngram_jaccard_verify(cands, sub, threshold=0.0)


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from invoice_ocr_reconciler_spark.functions.text import (
        bpe_ish_token_count_col,
        token_count_col,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        "doc_id",
        token_count_col(F.col("text")).alias("n_tokens"),
        bpe_ish_token_count_col(F.col("text")).alias("n_subwords"),
    )


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from invoice_ocr_reconciler_spark.functions.text import quality_score_cols

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cols = quality_score_cols(F.col("text"))
    return docs.select(
        "doc_id",
        cols["n_chars"].alias("n_chars"),
        cols["punct_ratio"].alias("punct_ratio"),
        cols["stop_ratio"].alias("stop_ratio"),
        cols["quality_score"].alias("quality_score"),
    )


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from invoice_ocr_reconciler_spark.functions.text import lang_id_cols

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cols = lang_id_cols(F.col("text"))
    return docs.select(
        "doc_id",
        cols["hits_en"].cast("int").alias("hits_en"),
        cols["hits_fr"].cast("int").alias("hits_fr"),
        cols["hits_es"].cast("int").alias("hits_es"),
        cols["hits_de"].cast("int").alias("hits_de"),
        cols["lang_pred"].alias("lang_pred"),
    )


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from invoice_ocr_reconciler_spark.functions.text import fingerprint_col

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select("doc_id", fingerprint_col(F.col("text")).alias("fingerprint"))


def q_ann_brute_force(spark: SparkSession, sf_dir: str) -> DataFrame:
    from invoice_ocr_reconciler_spark.operators.similarity import brute_force_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries_df = emb.filter(F.col("vec_id") < 10)
    return brute_force_topk(emb, queries_df, k=5).withColumnRenamed("rank", "nb_rank")


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN; rows-only (recall < 1 by design)."""
    from invoice_ocr_reconciler_spark.operators.similarity import lsh_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries_df = emb.filter(F.col("vec_id") < 10)
    return lsh_topk(emb, queries_df, k=5).withColumnRenamed("rank", "nb_rank")


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-partitioned ANN (coarse quantize -> probe n nearest cells ->
    exact re-rank); rows-only (recall < 1 by design, like ann_lsh)."""
    from invoice_ocr_reconciler_spark.operators.similarity import ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries_df = emb.filter(F.col("vec_id") < 10)
    return ivf_topk(emb, queries_df, k=5).withColumnRenamed("rank", "nb_rank")


def q_embedding_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, exact pairwise mode (DuckDB-checked);
    the LSH-bucketed scale path of the same operator is ann_lsh/rows-only."""
    from invoice_ocr_reconciler_spark.operators.similarity import embedding_cosine_dedup

    # this corpus has no true near-dups (max pairwise cosine ~0.47), so the
    # demo threshold is set low enough to exercise the pair path end-to-end
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return embedding_cosine_dedup(emb, threshold=0.35, exact=True)


_REGISTER_CSV_PATH = "/tmp/spark_graft_register.csv"


def _ensure_register_csv() -> str:
    """Deterministic CSV fixture with aliased headers (Vendor/Amount/Due);
    written by both the Spark query and oracle_sql() so whichever side the
    driver runs first finds it. Written to a unique temp file in the same
    directory and os.replace()d into place — a concurrent reader (or a
    second driver) always sees either the old or the complete new content,
    never a truncated file (the content is deterministic, so either is
    correct)."""
    import os
    import tempfile

    from invoice_ocr_reconciler_spark import datagen

    pdf = datagen.ledger_pdf(200, 5000).rename(
        columns={"vendor_name": "Vendor", "expected_amount": "Amount", "due_date": "Due"}
    )
    fd, tmp = tempfile.mkstemp(
        prefix=".spark_graft_register.", suffix=".csv",
        dir=os.path.dirname(_REGISTER_CSV_PATH),
    )
    try:
        with os.fdopen(fd, "w") as fh:
            pdf.to_csv(fh, index=False)
        os.replace(tmp, _REGISTER_CSV_PATH)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise
    return _REGISTER_CSV_PATH


def q_register_csv_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 (backend/server.js:136-159): CSV register ingest — alias coalesce,
    [$,] strip + parseFloat, default status, deterministic content-hash ids.
    DuckDB-checked via read_csv over the same fixture."""
    from invoice_ocr_reconciler_spark.sources.registers import read_register_csv

    path = _ensure_register_csv()
    return read_register_csv(spark, path).orderBy("record_id")


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing over binary payloads derived from documents.
    The deterministic fake decoder derives dims/phash from md5(payload), so
    the distributed path IS DuckDB-checkable (the float feature vector stays
    unit-tested instead — float32 repr doesn't round-trip across engines)."""
    from invoice_ocr_reconciler_spark.operators.multimodal import image_features

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = docs.select(
        F.concat(F.lit("doc-"), F.col("doc_id").cast("string")).alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.create_map(F.lit("src"), F.col("source")).alias("meta"),
    )
    return image_features(media, fake=True).select(
        "media_id", "width", "height", "n_bytes", "phash"
    )


def q_multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-kind multimodal plumbing (md5-derived fake decode, SQL-replayed
    like the image path)."""
    from invoice_ocr_reconciler_spark.operators.multimodal import audio_features

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = docs.select(
        F.concat(F.lit("doc-"), F.col("doc_id").cast("string")).alias("media_id"),
        F.lit("audio").alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.create_map(F.lit("src"), F.col("source")).alias("meta"),
    )
    return audio_features(media, fake=True)


def q_salted_host_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew handling (SURVEY §4.3-2): hot-host detection + deterministic
    salting. DuckDB-checked invariant per host: url count preserved, hot
    hosts (>=1% share, top-8, count-desc/host-asc) get spread over salt
    buckets (is_salted), cold hosts keep salt 0 exactly."""
    from invoice_ocr_reconciler_spark import datagen
    from invoice_ocr_reconciler_spark.sources.pages import (
        detect_hot_hosts,
        salt_hot_hosts,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pages = datagen.pages_from_documents(docs).select("url")
    hot = detect_hot_hosts(pages)
    salted = salt_hot_hosts(pages, hot)
    return (
        salted.groupBy("host")
        .agg(
            F.count("*").alias("n_urls"),
            (F.max("salt") > 0).alias("is_salted"),
        )
        .orderBy("host")
    )


def q_paged_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 (backend/server.js:368): COUNT(*) under the page query's WHERE."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return orders.filter(F.col("o_orderstatus").isin("O", "P")).agg(
        F.count("*").alias("total")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from invoice_ocr_reconciler_spark.plans import relational as R

    return {
        # pipeline (UDF) operators
        "extract_pages": q_extract_pages,
        "extract_identity_docs": q_extract_identity_docs,
        "parse_fields": q_parse_fields,
        "reconcile": q_reconcile,
        "reconcile_summary": q_reconcile_summary,
        # relational surface (SURVEY.md §2) — DuckDB-checked
        "stats_overview": R.stats_overview,
        "monthly_agg": R.monthly_agg,
        "pagination": R.pagination,
        "status_filter": R.status_filter,
        "search_like": R.search_like,
        "key_lookup": R.key_lookup,
        "topk_per_group": R.topk_per_group,
        "recent_topn": R.recent_topn,
        "anti_join_missing": R.anti_join_missing,
        "left_join_enrich": R.left_join_enrich,
        "inner_join_agg": R.inner_join_agg,
        "amount_tolerance_join": R.amount_tolerance_join,
        "normalize_names": R.normalize_names,
        "fuzzy_block_join": R.fuzzy_block_join,
        "events_json": R.events_json,
        "dates_scalars": R.dates_scalars,
        "explode_lineitems": R.explode_lineitems,
        "skew_salted_agg": R.skew_salted_agg,
        "rollup_counts": R.rollup_counts,
        "pivot_status_by_month": R.pivot_status_by_month,
        # training-data ops
        "dedup_exact": q_dedup_exact,
        "dedup_minhash": q_dedup_minhash,
        "dedup_simhash": q_dedup_simhash,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "ngram_jaccard_exact": q_ngram_jaccard_exact,
        "token_count": q_token_count,
        "quality_score": q_quality_score,
        "lang_id": q_lang_id,
        "fingerprint": q_fingerprint,
        "ann_brute_force": q_ann_brute_force,
        "ann_lsh": q_ann_lsh,
        "ann_ivf": q_ann_ivf,
        "embedding_dedup": q_embedding_dedup,
        # sources / scale mechanics / misc
        "register_csv_scan": q_register_csv_scan,
        "multimodal_features": q_multimodal_features,
        "multimodal_audio": q_multimodal_audio,
        "salted_host_partitions": q_salted_host_partitions,
        "paged_count": q_paged_count,
    }


_FP_SQL = "md5(trim(regexp_replace(lower(coalesce(text, '')), '\\s+', ' ', 'g')))"
_STOP_EN = r"\b(the|and|of|to|is|with|that)\b"
_HITS = {
    "en": r"\b(the|and|of|to|is|with|that)\b",
    "fr": r"\b(le|la|les|des|est|une|dans)\b",
    "es": r"\b(el|los|las|una|por|que|para)\b",
    "de": r"\b(der|die|das|und|ist|nicht|mit)\b",
}


def oracle_sql() -> dict[str, str]:
    # the register_csv_scan oracle reads a generated CSV fixture; write it
    # here too so the oracle works regardless of which side runs first
    _ensure_register_csv()
    hits = {
        k: f"CAST(len(regexp_extract_all(lower(coalesce(text,'')), '{v}')) AS INT)"
        for k, v in _HITS.items()
    }
    return {
        "extract_identity_docs": """
            SELECT doc_id, text AS extracted_text
            FROM documents WHERE doc_id % 10 IN (6, 8)
        """,
        "stats_overview": """
            SELECT count(*) AS n_orders,
                   round(sum(o_totalprice), 2) AS total_amount,
                   CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
                   CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
                   CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_pending,
                   round(avg(o_totalprice), 2) AS avg_amount
            FROM orders
        """,
        "monthly_agg": """
            WITH m AS (
                SELECT strftime(o_orderdate, '%Y-%m') AS month,
                       count(*) AS n,
                       round(sum(o_totalprice), 2) AS total
                FROM orders GROUP BY 1 ORDER BY month DESC LIMIT 6
            ) SELECT * FROM m ORDER BY month
        """,
        "pagination": """
            SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
            FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20 OFFSET 10
        """,
        "status_filter": """
            SELECT o_orderkey, o_orderstatus, o_totalprice
            FROM orders WHERE o_orderstatus IN ('O', 'P')
        """,
        "search_like": """
            SELECT c_custkey, c_name, c_mktsegment FROM customer
            WHERE c_name LIKE '%0001%' OR c_mktsegment LIKE '%AUTO%'
        """,
        "key_lookup": """
            SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
            FROM orders WHERE o_orderkey IN (1, 7, 32, 4096)
        """,
        "topk_per_group": """
            SELECT o_orderpriority, o_orderkey, o_totalprice, rnk FROM (
                SELECT o_orderpriority, o_orderkey, o_totalprice,
                       CAST(row_number() OVER (
                           PARTITION BY o_orderpriority
                           ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rnk
                FROM orders) WHERE rnk <= 10
        """,
        "recent_topn": """
            SELECT o_orderkey, o_orderdate, o_totalprice
            FROM orders ORDER BY o_orderdate DESC, o_orderkey LIMIT 20
        """,
        "anti_join_missing": """
            SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                              WHERE l.l_orderkey = o.o_orderkey
                                AND l.l_returnflag = 'R')
        """,
        "left_join_enrich": """
            SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
            FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        """,
        "inner_join_agg": """
            SELECT n_name, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            WHERE o_orderstatus <> 'O'
            GROUP BY n_name
        """,
        "amount_tolerance_join": """
            WITH li AS (
                SELECT l_orderkey,
                       floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                                      * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
                                  AS DOUBLE) * 100 + 0.5) / 100 AS li_total
                FROM lineitem GROUP BY l_orderkey
            )
            SELECT o_orderkey, o_totalprice, li_total,
                   floor(abs(o_totalprice - li_total) * 100 + 0.5) / 100 AS discrepancy,
                   CASE WHEN greatest(o_totalprice, li_total) = 0 THEN TRUE
                        ELSE abs(o_totalprice - li_total) / greatest(o_totalprice, li_total) <= 0.01
                   END AS within_tolerance
            FROM orders JOIN li ON o_orderkey = l_orderkey
        """,
        "normalize_names": r"""
            SELECT s_suppkey, s_name,
                   trim(regexp_replace(regexp_replace(regexp_replace(
                        lower(coalesce(s_name, '')),
                        '\b(ltd|limited|inc|incorporated|llc|corp|corporation|co|company|pvt|private)\b\.?', '', 'g'),
                        '[^a-z0-9\s]', '', 'g'),
                        '\s+', ' ', 'g')) AS s_norm
            FROM supplier
        """,
        "fuzzy_block_join": """
            WITH p AS (SELECT p_partkey, p_size, lower(p_name) AS p_norm,
                              split_part(lower(p_name), ' ', 1) AS blk
                       FROM part)
            SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
                   CAST(levenshtein(a.p_norm, b.p_norm) AS INT) AS lev
            FROM p a JOIN p b ON a.blk = b.blk AND a.p_size = b.p_size
                              AND a.p_partkey < b.p_partkey
            WHERE levenshtein(a.p_norm, b.p_norm) <= 10
        """,
        "events_json": """
            SELECT event_type, count(*) AS n,
                   CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
                   round(avg(value), 4) AS avg_value
            FROM events GROUP BY event_type
        """,
        "dates_scalars": """
            SELECT o_orderkey,
                   strftime(o_orderdate, '%Y-%m') AS month,
                   substr(o_orderpriority, 1, 1) AS prio_code,
                   'ORD-' || CAST(o_orderkey AS VARCHAR) AS tag,
                   round(abs(o_totalprice - 1000.0), 2) AS abs_diff,
                   greatest(o_totalprice, 50000.0) AS floored,
                   upper(trim(o_orderstatus)) AS status_uc
            FROM orders
        """,
        "explode_lineitems": """
            SELECT l_orderkey, CAST(l_linenumber AS INT) AS line,
                   l_quantity AS qty, round(l_extendedprice, 2) AS price
            FROM lineitem
        """,
        "skew_salted_agg": """
            SELECT l_suppkey, sum(l_quantity) AS sum_qty, count(*) AS n_items
            FROM lineitem GROUP BY l_suppkey
        """,
        "rollup_counts": """
            SELECT o_orderstatus, o_orderpriority, count(*) AS n
            FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        """,
        "pivot_status_by_month": """
            SELECT strftime(o_orderdate, '%Y-%m') AS month,
                   CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS "O",
                   CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS "F",
                   CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS "P"
            FROM orders GROUP BY 1
        """,
        "dedup_exact": f"""
            SELECT doc_id, {_FP_SQL} AS fingerprint,
                   CAST(row_number() OVER (PARTITION BY {_FP_SQL} ORDER BY doc_id) AS INT) AS dup_rank,
                   count(*) OVER (PARTITION BY {_FP_SQL}) AS group_size,
                   row_number() OVER (PARTITION BY {_FP_SQL} ORDER BY doc_id) > 1 AS is_duplicate
            FROM documents
        """,
        "token_count": r"""
            SELECT doc_id,
                   CASE WHEN length(trim(coalesce(text, ''))) = 0 THEN 0
                        ELSE CAST(len(regexp_split_to_array(trim(coalesce(text, '')), '\s+')) AS INT)
                   END AS n_tokens,
                   CAST(len(regexp_extract_all(coalesce(text, ''), '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS INT) AS n_subwords
            FROM documents
        """,
        "quality_score": r"""
            WITH f AS (
                SELECT doc_id,
                       CAST(length(coalesce(text, '')) AS INT) AS n_chars,
                       len(regexp_extract_all(coalesce(text, ''), '[^\w\s]')) AS n_punct,
                       CASE WHEN length(trim(coalesce(text, ''))) = 0 THEN 0
                            ELSE len(regexp_split_to_array(trim(coalesce(text, '')), '\s+'))
                       END AS n_tokens,
                       len(regexp_extract_all(lower(coalesce(text, '')), '\b(the|and|of|to|is|with|that)\b')) AS n_stop
                FROM documents)
            SELECT doc_id, n_chars,
                   floor((CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0 END) * 10000.0 + 0.5) / 10000.0 AS punct_ratio,
                   floor((CASE WHEN n_tokens > 0 THEN n_stop / n_tokens ELSE 0 END) * 10000.0 + 0.5) / 10000.0 AS stop_ratio,
                   floor((least(n_chars / 500.0, 1.0) * 0.4
                          + (1.0 - CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0 END) * 0.3
                          + least(CASE WHEN n_tokens > 0 THEN n_stop / n_tokens ELSE 0 END * 5.0, 1.0) * 0.3)
                         * 10000.0 + 0.5) / 10000.0 AS quality_score
            FROM f
        """,
        "lang_id": f"""
            SELECT doc_id,
                   {hits['en']} AS hits_en,
                   {hits['fr']} AS hits_fr,
                   {hits['es']} AS hits_es,
                   {hits['de']} AS hits_de,
                   CASE WHEN {hits['de']} > greatest({hits['en']}, {hits['fr']}, {hits['es']}) THEN 'de'
                        WHEN {hits['es']} > greatest({hits['en']}, {hits['fr']}) THEN 'es'
                        WHEN {hits['fr']} > {hits['en']} THEN 'fr'
                        WHEN {hits['en']} > 0 THEN 'en'
                        ELSE 'unknown'
                   END AS lang_pred
            FROM documents
        """,
        "fingerprint": f"SELECT doc_id, {_FP_SQL} AS fingerprint FROM documents",
        "paged_count": "SELECT count(*) AS total FROM orders WHERE o_orderstatus IN ('O', 'P')",
        "ann_brute_force": """
            WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
                       FROM embeddings WHERE vec_id < 10),
                 c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
                       FROM embeddings),
                 s AS (SELECT query_id, neighbor_id,
                              round(list_cosine_similarity(qv, cv), 6) AS cosine
                       FROM q, c WHERE neighbor_id <> query_id),
                 r AS (SELECT query_id, neighbor_id, cosine,
                              CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS INT) AS nb_rank
                       FROM s)
            SELECT query_id, neighbor_id, cosine, nb_rank FROM r WHERE nb_rank <= 5
        """,
        # gram-string reconstruction of operators/dedup.py:_shingle_hashes:
        # tokens = lower().split(); <3 tokens collapse to one joined gram
        # (mirrors the short-text branch); else distinct 3-gram strings
        "ngram_jaccard_exact": r"""
            WITH d AS (
                SELECT doc_id,
                       list_filter(string_split_regex(lower(coalesce(text, '')), '\s+'),
                                   t -> t <> '') AS toks
                FROM documents WHERE doc_id < 80),
            g AS (
                SELECT doc_id,
                       CASE WHEN len(toks) = 0 THEN ['']
                            WHEN len(toks) < 3 THEN [array_to_string(toks, chr(1))]
                            ELSE list_distinct(list_transform(range(1, len(toks) - 1),
                                   i -> toks[i] || chr(1) || toks[i+1] || chr(1) || toks[i+2]))
                       END AS grams
                FROM d)
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   round(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                         / (len(a.grams) + len(b.grams)
                            - len(list_intersect(a.grams, b.grams))), 4) AS jaccard
            FROM g a JOIN g b ON a.doc_id < b.doc_id
        """,
        "embedding_dedup": """
            WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings)
            SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
                   round(list_cosine_similarity(a.vec, b.vec), 6) AS cosine
            FROM v a JOIN v b ON a.vec_id < b.vec_id
            WHERE round(list_cosine_similarity(a.vec, b.vec), 6) >= 0.35
        """,
        # the fake decoder derives everything from md5(payload) (operators/
        # multimodal.py:_FakeDecoder) — reproduced here byte-for-byte: b0/b1
        # of the digest -> dims, bytes 8..16 -> signed big-endian phash
        "multimodal_features": """
            WITH d AS (
                SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS media_id,
                       md5(coalesce(text, '')) AS dig,
                       CAST(octet_length(encode(coalesce(text, ''))) AS INT) AS n_bytes
                FROM documents)
            SELECT media_id,
                   CAST(64 + ('0x' || substr(dig, 1, 2))::INT % 192 AS INT) AS width,
                   CAST(64 + ('0x' || substr(dig, 3, 2))::INT % 192 AS INT) AS height,
                   n_bytes,
                   CAST(CASE WHEN ('0x' || substr(dig, 17, 16))::UBIGINT
                                  >= 9223372036854775808::HUGEINT
                             THEN ('0x' || substr(dig, 17, 16))::UBIGINT::HUGEINT
                                  - 18446744073709551616::HUGEINT
                             ELSE ('0x' || substr(dig, 17, 16))::UBIGINT::HUGEINT
                        END AS BIGINT) AS phash
            FROM d
        """,
        "multimodal_audio": """
            WITH d AS (
                SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS media_id,
                       md5(coalesce(text, '')) AS dig,
                       CAST(octet_length(encode(coalesce(text, ''))) AS INT) AS n_bytes
                FROM documents)
            SELECT media_id,
                   CAST(CASE ('0x' || substr(dig, 5, 2))::INT % 5
                            WHEN 0 THEN 8000 WHEN 1 THEN 16000 WHEN 2 THEN 22050
                            WHEN 3 THEN 44100 ELSE 48000 END AS INT) AS sample_rate,
                   CAST(1 + ('0x' || substr(dig, 7, 2))::INT % 2 AS INT) AS n_channels,
                   CAST(500 + ('0x' || substr(dig, 9, 4))::INT % 600000 AS INT) AS duration_ms,
                   CAST(('0x' || substr(dig, 13, 2))::INT % 101 AS INT) AS loudness,
                   n_bytes
            FROM d
        """,
        # datagen's host_for(i) (md5-derived Zipf head) replayed in SQL; hot
        # rule mirrors sources/pages.py:detect_hot_hosts (>=1% share, top 8,
        # count-desc/host-asc). is_salted: hot hosts spread over salt buckets
        # (max(salt)>0), cold hosts keep salt identically 0.
        "salted_host_partitions": """
            WITH h AS (
                SELECT doc_id,
                       ('0x' || substr(md5('host:' || CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT
                           % 100 AS r,
                       ('0x' || substr(md5('coldhost:' || CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT
                           % 50 AS c
                FROM documents),
            hosts AS (
                SELECT CASE WHEN r < 35 THEN
                            CASE WHEN r % 2 = 0 THEN 'portal.megacorp-billing.example'
                                 ELSE 'docs.archive-crawl.example' END
                       ELSE printf('site-%03d.example', CAST(c AS INT)) END AS host
                FROM h),
            agg AS (SELECT host, count(*) AS n_urls FROM hosts GROUP BY host),
            hot AS (SELECT host FROM agg
                    WHERE n_urls >= (SELECT sum(n_urls) FROM agg) * 0.01
                    ORDER BY n_urls DESC, host LIMIT 8)
            SELECT host, n_urls, host IN (SELECT host FROM hot) AS is_salted
            FROM agg ORDER BY host
        """,
        "register_csv_scan": f"""
            WITH raw AS (SELECT * FROM read_csv('{_REGISTER_CSV_PATH}',
                                                header=true, all_varchar=true)),
            norm AS (
                SELECT Vendor AS vendor_name,
                       coalesce(TRY_CAST(regexp_replace(Amount, '[$,]', '', 'g')
                                         AS DOUBLE), 0.0) AS expected_amount,
                       Due AS due_date,
                       reference_number,
                       coalesce(status, 'unpaid') AS status
                FROM raw)
            SELECT 'R-' || substr(md5(concat_ws('|', vendor_name,
                       CAST(expected_amount AS VARCHAR), due_date,
                       reference_number)), 1, 12) AS record_id,
                   vendor_name, expected_amount, due_date, reference_number, status
            FROM norm ORDER BY record_id
        """,
    }
