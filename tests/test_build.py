"""End-to-end corpus build (operators/build.py): stage reconciliation,
blocklist/collapse behavior, export layout, determinism."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from invoice_ocr_reconciler_spark import datagen
from invoice_ocr_reconciler_spark.operators.build import build_corpus


@pytest.fixture(scope="module")
def built(spark):
    pages = datagen.pages_df(spark, 300)
    # re-crawl: 20 urls fetched AGAIN a day later -> collapse must keep
    # exactly one row per url (the newer fetch)
    recrawl = pages.limit(20).withColumn(
        "warc_ts", F.col("warc_ts") + F.expr("INTERVAL 1 DAY")
    )
    blocklist = spark.createDataFrame(
        [("portal.megacorp-billing.example",)], "domain string"
    )
    out = build_corpus(
        pages.unionByName(recrawl),
        blocklist=blocklist,
        min_quality=0.0,
        langs=("en", "fr", "es", "de", "unknown"),
        n_shards=8,
    )
    return out["docs"].collect(), out["stats"].collect()[0].asDict()


def test_build_counters_reconcile(built):
    docs, s = built
    assert s["n_pages_in"] == 320
    assert s["n_collapsed"] == 20          # the re-crawled urls collapse
    assert s["n_blocked"] > 0              # the hot host is blocklisted
    total = (
        s["n_collapsed"] + s["n_blocked"] + s["n_exact_dup"]
        + s["n_filtered_out"] + s["n_repetition_out"] + s["n_gopher_out"]
        + s["n_contaminated"] + s["n_near_dup"] + s["n_budget_out"]
        + s["n_final"]
    )
    assert total == s["n_pages_in"]
    assert s["n_final"] == len(docs) > 0


def test_build_export_layout(built):
    docs, s = built
    assert set(docs[0].asDict()) == {
        "doc_id", "url", "text", "quality_score", "lang_pred",
        "n_tokens", "shard", "pos",
    }
    shards = {r["shard"] for r in docs}
    assert shards <= set(range(8))
    # pos is 1..n contiguous within each shard
    for sh in shards:
        ps = sorted(r["pos"] for r in docs if r["shard"] == sh)
        assert ps == list(range(1, len(ps) + 1))
    # no blocked host survived
    assert not any("portal.megacorp-billing" in r["url"] for r in docs)


def test_build_token_budget_and_no_near_dup(spark):
    pages = datagen.pages_df(spark, 120)
    out = build_corpus(
        pages,
        min_quality=0.0,
        langs=("en", "fr", "es", "de", "unknown"),
        with_near_dup=False,
        token_budget=500,
        n_shards=4,
    )
    s = out["stats"].collect()[0].asDict()
    assert s["n_near_dup"] == 0
    assert s["n_budget_out"] > 0           # the budget genuinely cuts
    assert s["final_tokens"] <= 500
    docs = out["docs"]
    assert docs.count() == s["n_final"]


def test_build_deterministic_across_parallelism(spark):
    pages = datagen.pages_df(spark, 80)
    a = build_corpus(
        pages.repartition(1), min_quality=0.0,
        langs=("en", "fr", "es", "de", "unknown"), n_shards=4,
    )["docs"]
    b = build_corpus(
        pages.repartition(8), min_quality=0.0,
        langs=("en", "fr", "es", "de", "unknown"), n_shards=4,
    )["docs"]
    ra = sorted(tuple(r) for r in a.collect())
    rb = sorted(tuple(r) for r in b.collect())
    assert ra == rb


def test_resumable_build_kill_resume_matches_one_shot(spark, tmp_path):
    """build_corpus_resumable: a killed extract phase leaves exactly the
    committed buckets durable; the resume recomputes ONLY the incomplete
    ones (attempt counters stay 1), and the finished corpus is
    row-identical to the one-shot build_corpus on the same pages."""
    import json
    import glob

    from invoice_ocr_reconciler_spark.operators.build import (
        build_corpus_resumable,
    )
    from invoice_ocr_reconciler_spark.sources.pages import write_pages_bucketed

    langs = ("en", "fr", "es", "de", "unknown")
    pages = datagen.pages_df(spark, 300)
    path = str(tmp_path / "pages")
    write_pages_bucketed(pages, path, n_buckets=8)
    out_root = str(tmp_path / "out")

    # leg 1: killed after 3 buckets (fail_after simulates the kill at a
    # commit boundary; the SIGKILL variant is the 1.2M soak's job)
    r1 = build_corpus_resumable(
        spark, path, out_root, min_quality=0.0, langs=langs,
        n_shards=8, fail_after=3, phase="extract",
    )
    assert len(r1["run"]["processed"]) == 3

    # leg 2: resume + finish
    r2 = build_corpus_resumable(
        spark, path, out_root, min_quality=0.0, langs=langs,
        n_shards=8, phase="all",
    )
    done1, done2 = set(r1["run"]["processed"]), set(r2["run"]["processed"])
    assert done1.isdisjoint(done2)          # committed buckets NOT recomputed
    assert len(done1 | done2) == 8
    for mf in glob.glob(f"{out_root}/manifest/bucket-*.json"):
        with open(mf) as fh:
            assert json.load(fh)["attempt"] == 1  # no bucket ran twice

    ref = build_corpus(pages, min_quality=0.0, langs=langs, n_shards=8)
    got = sorted(tuple(r) for r in r2["docs"].collect())
    exp = sorted(tuple(r) for r in ref["docs"].collect())
    assert got == exp
    assert r2["stats"].collect()[0] == ref["stats"].collect()[0]


def test_resumable_finish_refuses_incomplete_extract(spark, tmp_path):
    """phase='finish' on a partially-extracted corpus must raise naming the
    uncommitted buckets — NOT silently build a corpus from whatever bucket
    dirs happen to exist (a mid-kill can leave a data-complete dir with no
    manifest commit, or omit buckets entirely)."""
    import pytest as _pytest

    from invoice_ocr_reconciler_spark.operators.build import (
        build_corpus_resumable,
    )
    from invoice_ocr_reconciler_spark.sources.pages import write_pages_bucketed

    pages = datagen.pages_df(spark, 120)
    path = str(tmp_path / "pages")
    write_pages_bucketed(pages, path, n_buckets=8)
    out_root = str(tmp_path / "out")

    r1 = build_corpus_resumable(
        spark, path, out_root, min_quality=0.0, n_shards=8,
        fail_after=3, phase="extract",
    )
    committed = set(r1["run"]["processed"])
    # simulate the worst case: a bucket dir fully written but never
    # committed (SIGKILL between parquet write and manifest record)
    import shutil

    orphan = min(set(range(8)) - committed)
    shutil.copytree(
        f"{out_root}/cleaned/url_bucket={min(committed)}",
        f"{out_root}/cleaned/url_bucket={orphan}",
        dirs_exist_ok=True,
    )
    with _pytest.raises(RuntimeError, match="incomplete.*manifest"):
        build_corpus_resumable(
            spark, path, out_root, min_quality=0.0, n_shards=8,
            phase="finish",
        )
