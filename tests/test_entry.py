"""Driver-contract regression test: entry() + every queries() entry executes
at sf0.001 with a stable schema and sane row counts; oracle keys are a
subset of query keys. (The full value-level oracle comparison runs via
tools/check_oracles.py at sf0.01 — this is the fast guard between rounds.)"""

import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {
        "invoice_url", "record_id", "match_status", "discrepancy",
        "flag_reason", "confidence_score",
    }


def test_oracle_keys_subset_of_queries():
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(osql) >= 25  # oracle coverage floor — don't regress


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_executes(spark, name):
    df = entrymod.queries()[name](spark, SF)
    n = df.count()
    assert n >= 0
    assert len(df.columns) > 0
    # non-SQL pipeline queries must still return rows on the smoke corpus
    if name in ("extract_pages", "parse_fields", "reconcile", "dedup_exact",
                "token_count", "quality_score", "lang_id", "fingerprint"):
        assert n > 0
