"""CDXJ-style capture index over a crawl pages table.

Common-Crawl-scale corpora are looked up through a CDX index: one row per
capture, keyed by SURT (Sort-friendly URI Reordering Transform) so that all
captures of a host — and of its subdomains — are lexicographically adjacent.
The reference pipeline walks its SQLite rows by url (backend/server.js:280
`SELECT ... ORDER BY created_at`); at 10^12 documents the equivalent random
url lookup needs a sorted index, which is exactly what CDX provides.

Design (Spark-first):
- `cdx_index` is pure codegen — host/path splitting, label reversal, digest
  and length all run as column expressions inside whole-stage codegen; no
  Python crossing, no shuffle beyond the final range sort.
- The index is range-sorted by (surt_key, ts): `sortWithinPartitions` after
  `repartitionByRange` writes run-length-friendly parquet where a host's
  captures land in one file span — partition pruning then serves prefix
  lookups without touching the rest of the corpus.
- `cdx_prefix_lookup` filters on `startswith(surt_key, prefix)` which Spark
  rewrites into a pushable StartsWith predicate (min/max pruning on the
  range-sorted files).

SURT convention implemented (documented subset of the public spec):
lowercase the host, drop a leading ``www.``, reverse the dot-labels and
join with commas, append ``)`` plus the raw path (query string kept,
fragment kept — synthetic urls carry neither). ``https://www.a.b.c/x?q=1``
-> ``c,b,a)/x?q=1``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from invoice_ocr_reconciler_spark.functions.urls import host_of_url_col

__all__ = ["surt_key_col", "cdx_index", "cdx_prefix_lookup"]


def surt_key_col(url: Column) -> Column:
    """SURT key of a URL as a single codegen expression."""
    host = host_of_url_col(url)
    host = F.regexp_replace(host, r"^www\.", "")
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    path = F.regexp_replace(url, r"^(?i)https?://[^/?#]*", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    return F.concat(rev, F.lit(")"), path)


def cdx_index(
    captures: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    payload_col: str = "html",
    sort: bool = True,
) -> DataFrame:
    """Build the capture index: (surt_key, ts14, digest, length, url).

    - ``ts14`` is the classic CDX 14-digit UTC timestamp (yyyyMMddHHmmss) —
      the session pins spark.sql.session.timeZone=UTC so formatting is
      deterministic.
    - ``digest`` is the md5 hex of the raw payload bytes (engine-portable;
      the public CDX uses sha1-b32, md5 keeps the same dedup/verify role
      with the repo-wide portable-hash convention).
    - ``length`` is the stored payload size in bytes.

    With ``sort=True`` the output is range-partitioned and sorted by
    (surt_key, ts14): the 100 TB shape, where a prefix lookup prunes to a
    handful of parquet files. Pass ``sort=False`` to keep the input
    partitioning when the caller does its own layout.
    """
    idx = captures.select(
        surt_key_col(F.col(url_col)).alias("surt_key"),
        F.date_format(F.col(ts_col), "yyyyMMddHHmmss").alias("ts14"),
        F.md5(F.col(payload_col)).alias("digest"),
        F.octet_length(F.col(payload_col)).cast("bigint").alias("length"),
        F.col(url_col).alias("url"),
    )
    if sort:
        idx = idx.repartitionByRange("surt_key", "ts14").sortWithinPartitions(
            "surt_key", "ts14"
        )
    return idx


def cdx_prefix_lookup(index: DataFrame, surt_prefix: str) -> DataFrame:
    """All captures under a SURT prefix (a host, a domain, or a path
    subtree). `startswith` compiles to a StartsWith predicate that prunes
    range-sorted files by min/max stats; no shuffle."""
    return index.filter(F.col("surt_key").startswith(surt_prefix))


def cdx_merge(existing: DataFrame, fresh: DataFrame) -> DataFrame:
    """Merge a new crawl's capture index into an existing one — the
    incremental maintenance step every monthly crawl runs.

    Identical re-captures (same surt_key, ts14, digest, length, url —
    the full CDX identity; re-fetching an unchanged page at the same
    second) collapse to one row; a changed page at a new timestamp is a
    NEW capture and both rows stay, which is what time-travel lookups
    need. The distinct + range re-sort shuffle on (surt_key, ts14) —
    exactly the layout both inputs already have, so AQE plans the merge
    as a cheap co-ranged exchange; output files stay prefix-prunable.
    """
    cols = ["surt_key", "ts14", "digest", "length", "url"]
    return (
        existing.select(cols)
        .unionByName(fresh.select(cols))
        .distinct()
        .repartitionByRange("surt_key", "ts14")
        .sortWithinPartitions("surt_key", "ts14")
    )


def cdx_latest(index: DataFrame) -> DataFrame:
    """Newest capture per SURT key — the index-side re-crawl collapse
    (operators/diff.latest_snapshot over page rows; this is the same cut
    where only the INDEX exists, which is how wayback-style 'current
    view' queries run).

    One window keyed (surt_key) ordered (ts14 desc, digest desc): the
    index is already range-partitioned by surt_key, so on a sorted
    index read this plans as a partition-local sort, not a fresh hash
    exchange of the corpus. digest desc tie-breaks equal-second
    re-captures deterministically.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("surt_key").orderBy(
        F.col("ts14").desc(), F.col("digest").desc()
    )
    return (
        index.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def revisit_stats(index: DataFrame) -> DataFrame:
    """Per-URL change-frequency estimate from capture history
    -> (surt_key, n_captures, n_versions, change_rate, last_ts14,
        last_digest).

    The adaptive-revisit input (Cho & Garcia-Molina: re-fetch pages in
    proportion to how often they actually change): a page captured 12
    times with 12 digests is volatile (news index) and worth frequent
    revisits; 12 captures with 1 digest is static and a waste of fetch
    budget. change_rate = (n_versions - 1) / (n_captures - 1) — the
    fraction of RE-fetches that observed a change — NULL for
    single-capture keys (no evidence yet; schedule by host prior
    instead).

    ONE partial-agg'd groupBy(surt_key): count, exact distinct digests
    (per-key capture counts are small — revisit history, not corpus
    rows), and a max-of-struct((ts14, digest)) picks the newest capture
    without a window. On the range-sorted index layout the groupBy is
    partition-local.
    """
    from invoice_ocr_reconciler_spark.functions.text import roundn

    last = F.max(F.struct(F.col("ts14"), F.col("digest")))
    agg = index.groupBy("surt_key").agg(
        F.count("*").alias("n_captures"),
        F.count_distinct("digest").alias("n_versions"),
        last.alias("_last"),
    )
    return agg.select(
        "surt_key",
        "n_captures",
        "n_versions",
        roundn(
            F.when(
                F.col("n_captures") >= 2,
                (F.col("n_versions") - 1).cast("double")
                / (F.col("n_captures") - 1),
            ),
            6,
        ).alias("change_rate"),
        F.col("_last.ts14").alias("last_ts14"),
        F.col("_last.digest").alias("last_digest"),
    )
