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


def test_c4_crlf_and_tab_whitespace(spark):
    # CRLF endings and a trailing tab must be stripped like the paper's
    # strip(), not survive trim()'s ASCII-space-only semantics
    text = (
        "a good line with five words.\r\n"
        "another good line ends with tab here.\t\r\n"
        "third fine line has enough words!\r"
    )
    r = c4_clean(_docs(spark, [(1, text)]), min_kept_lines=3).collect()[0]
    assert r["kept"] and r["n_lines_kept"] == 3
    assert "\r" not in r["text_clean"] and "\t" not in r["text_clean"]


def test_compact_table_nested_dirs_are_left_alone(spark, tmp_path):
    # a dir holding BOTH files and a data-bearing subdir must not be
    # rewritten (partition discovery would suck the child into it)
    p = str(tmp_path / "t5")
    spark.range(50).repartition(4).write.mode("overwrite").parquet(p)
    spark.range(50, 80).repartition(3).write.mode("overwrite").parquet(
        p + "/child"
    )
    before_child = spark.read.parquet(p + "/child").orderBy("id").collect()
    res = compact_table(spark, p, target_bytes=1 << 30)
    assert "" in res["skipped_dirs"]  # root is non-leaf now
    assert res["rewritten_dirs"] == ["child"]
    assert spark.read.parquet(p + "/child").orderBy("id").collect() == before_child


def test_compaction_ignores_spark_internal_dirs(spark, tmp_path):
    p = str(tmp_path / "t6")
    _write_fragmented(spark, p, parts=3)
    os.makedirs(p + "/_temporary/0", exist_ok=True)
    junk = os.path.join(p, "_temporary", "0", "part-junk.parquet")
    with open(junk, "wb") as fh:
        fh.write(b"not parquet")
    plan = plan_compaction(spark, p, target_bytes=1 << 30).collect()
    assert all("_temporary" not in r["partition_dir"] for r in plan)
    res = compact_table(spark, p, target_bytes=1 << 30)
    assert res["rewritten_dirs"] == [""]
    assert os.path.exists(junk)  # internal dir untouched
    assert spark.read.parquet(p).count() == 400


def test_compact_table_recovers_interrupted_swap(spark, tmp_path):
    # simulate a crash between swap-out and swap-in: the partition dir is
    # missing and only the hidden old dir exists -> next run restores it
    p = str(tmp_path / "t7")
    df = spark.range(100).selectExpr("id", "CAST(id % 2 AS INT) AS part")
    df.repartition(4).write.partitionBy("part").mode("overwrite").parquet(p)
    before = spark.read.parquet(p).orderBy("id").collect()
    os.replace(
        os.path.join(p, "part=0"), os.path.join(p, ".part=0.__cold_deadbeef")
    )
    res = compact_table(spark, p, target_bytes=1 << 30)
    assert res["recovered_dirs"] == ["part=0"]
    assert sorted(res["rewritten_dirs"]) == ["part=0", "part=1"]
    assert spark.read.parquet(p).orderBy("id").collect() == before


def test_compact_table_cleans_dead_temps_and_leftover_old(spark, tmp_path):
    p = str(tmp_path / "t8")
    _write_fragmented(spark, p, parts=4, rows=100)
    before = spark.read.parquet(p).orderBy("id").collect()
    # dead temp (crash mid-write) + leftover old (crash before rmtree,
    # swap completed: visible target exists)
    os.makedirs(os.path.join(tmp_path, ".t8.__ctmp_aaaa"), exist_ok=True)
    spark.range(5).write.parquet(str(tmp_path / ".t8.__cold_bbbb"))
    res = compact_table(spark, p, target_bytes=1 << 30)
    assert res["recovered_dirs"] == []
    assert not os.path.exists(str(tmp_path / ".t8.__ctmp_aaaa"))
    assert not os.path.exists(str(tmp_path / ".t8.__cold_bbbb"))
    assert spark.read.parquet(p).orderBy("id").collect() == before
