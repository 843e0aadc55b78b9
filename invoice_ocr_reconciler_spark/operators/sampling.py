"""Deterministic stratified sampling for training-data curation.

`sample(fraction)` is nondeterministic across retries/partitionings —
useless for reproducible corpus builds. This operator derives the sampling
decision from a cryptographic hash of the ROW KEY (md5, identical in every
engine and across runs), so the sample is: reproducible, partitioning- and
retry-invariant, joinable (the same ids are in or out everywhere), and
incrementally stable (new rows don't reshuffle old decisions — the property
reservoir/random sampling lacks).

Per-stratum rates give the usual training-mix control (e.g. upsample
low-resource languages): a row with hash-bucket b (uniform in [0,
n_buckets)) is kept iff b < rate[stratum].
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket_col(key: Column, n_buckets: int = 100) -> Column:
    """Uniform deterministic bucket in [0, n_buckets): first 8 hex chars of
    md5(key) as an integer, mod n_buckets. Engine-portable (md5 + base
    conversion only — no engine-specific hash)."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("long")
        % n_buckets
    )


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, int],
    default_rate: int = 0,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    n_buckets: int = 100,
) -> DataFrame:
    """Keep each row iff its hash bucket < rates[stratum] (percent when
    n_buckets=100). Strata missing from `rates` get `default_rate`.

    Pure per-row codegen filter — no shuffle, no state; pushes down past
    nothing but costs one md5 per row.
    """
    rate: Column = F.lit(int(default_rate))
    for stratum, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == stratum, F.lit(int(r))).otherwise(rate)
    return (
        docs.withColumn("sample_bucket", hash_bucket_col(F.col(id_col), n_buckets))
        .filter(F.col("sample_bucket") < rate)
    )
