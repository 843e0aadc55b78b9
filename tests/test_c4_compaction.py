"""c4_clean line/page rules and parquet small-file compaction."""

import os

from invoice_ocr_reconciler_spark.operators.c4 import c4_clean
from invoice_ocr_reconciler_spark.operators.compaction import (
    compact_table,
    plan_compaction,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# --------------------------------------------------------------- c4_clean


def test_c4_line_rules(spark):
    text = "\n".join(
        [
            "this line has five words.",  # kept
            "short line here.",  # < 5 words -> dropped
            "this line has no terminal punctuation at all",  # dropped
            "please enable JavaScript to view the comments.",  # dropped
            'he said "five words are here."',  # kept (closing quote)
            "another good line with words enough!",  # kept
            "and one more question line works fine?",  # kept
        ]
    )
    r = c4_clean(_docs(spark, [(1, text)])).collect()[0]
    assert r["kept"] and r["drop_reason"] is None
    assert r["n_lines_kept"] == 4 and r["n_lines_dropped"] == 3
    assert r["text_clean"].startswith("this line has five words.")
    assert "JavaScript" not in r["text_clean"]


def test_c4_page_rules(spark):
    good = "one fine line with enough words.\n" * 3
    rows = [
        (1, good + "a { appears here somewhere."),  # brace
        (2, good + "Lorem Ipsum dolor sit amet today."),  # lorem (ci)
        (3, "only one good line right here."),  # too few kept
        (4, good),
        (5, None),  # null text -> too_few_lines, not a crash
    ]
    got = {r["doc_id"]: r for r in c4_clean(_docs(spark, rows)).collect()}
    assert got[1]["drop_reason"] == "brace" and not got[1]["kept"]
    assert got[2]["drop_reason"] == "lorem_ipsum"
    assert got[3]["drop_reason"] == "too_few_lines"
    assert got[4]["kept"] and got[4]["n_lines_kept"] == 3
    assert got[5]["drop_reason"] == "too_few_lines"
    assert got[1]["text_clean"] is None


def test_c4_brace_beats_other_reasons(spark):
    r = c4_clean(_docs(spark, [(1, "x {")])).collect()[0]
    assert r["drop_reason"] == "brace"  # reason precedence is fixed


# ------------------------------------------------------------- compaction


def _write_fragmented(spark, path, parts=16, rows=400):
    df = spark.range(rows).selectExpr("id", "id % 7 AS k")
    df.repartition(parts).write.mode("overwrite").parquet(path)


def _parquet_files(path):
    out = []
    for root, _d, files in os.walk(path):
        out += [f for f in files if f.endswith(".parquet")]
    return out


def test_plan_compaction_bins_and_determinism(spark, tmp_path):
    p = str(tmp_path / "t")
    _write_fragmented(spark, p)
    plan = plan_compaction(spark, p, target_bytes=1 << 30).collect()
    assert len(plan) == len(_parquet_files(p))
    # everything fits one bin at a huge target
    assert {r["bin"] for r in plan} == {0}
    assert all(r["needs_rewrite"] for r in plan)
    plan2 = plan_compaction(spark, p, target_bytes=1 << 30).collect()
    assert sorted(map(tuple, plan)) == sorted(map(tuple, plan2))


def test_plan_compaction_oversized_file_gets_own_bin(spark, tmp_path):
    p = str(tmp_path / "t2")
    _write_fragmented(spark, p, parts=3)
    sizes = [os.path.getsize(os.path.join(r, f))
             for r, _d, fs in os.walk(p) for f in fs if f.endswith(".parquet")]
    # target below the largest file: every file is its own bin
    plan = plan_compaction(spark, p, target_bytes=min(sizes) - 1).collect()
    assert len({r["bin"] for r in plan}) == 3
    assert not plan[0]["needs_rewrite"]


def test_compact_table_roundtrip_and_skip(spark, tmp_path):
    p = str(tmp_path / "t3")
    _write_fragmented(spark, p, parts=12, rows=500)
    before = spark.read.parquet(p).orderBy("id").collect()
    res = compact_table(spark, p, target_bytes=1 << 30)
    assert res["files_before"] == 12 and res["files_after"] < 12
    assert res["rewritten_dirs"] == [""]
    after = spark.read.parquet(p).orderBy("id").collect()
    assert before == after  # byte-for-byte row content preserved
    # second run: already compact -> no-op
    res2 = compact_table(spark, p, target_bytes=1 << 30)
    assert res2["rewritten_dirs"] == [] and res2["skipped_dirs"] == [""]


def test_compact_table_partitioned_untouched_dirs(spark, tmp_path):
    p = str(tmp_path / "t4")
    df = spark.range(300).selectExpr("id", "CAST(id % 2 AS INT) AS part")
    df.repartition(8).write.partitionBy("part").mode("overwrite").parquet(p)
    before = spark.read.parquet(p).orderBy("id").collect()
    res = compact_table(spark, p, target_bytes=1 << 30)
    assert sorted(res["rewritten_dirs"]) == ["part=0", "part=1"]
    after = spark.read.parquet(p).orderBy("id").collect()
    assert before == after  # partition column survives the rewrite
