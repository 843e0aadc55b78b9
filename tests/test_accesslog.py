"""CLF access-log parsing + subnet rollup (functions/accesslog.py)."""

from pyspark.sql import functions as F

from invoice_ocr_reconciler_spark.functions.accesslog import (
    clf_cols,
    subnet24,
    subnet_traffic,
)


def _parse(spark, lines):
    df = spark.createDataFrame([(l,) for l in lines], "line string")
    c = clf_cols(F.col("line"))
    return df.select(
        *[v.alias(k) for k, v in c.items()]
    ).collect()


def test_clf_happy_path(spark):
    r = _parse(
        spark,
        ['10.2.3.4 - frank [10/Oct/2000:13:55:36 +0000] '
         '"GET /a.html HTTP/1.1" 200 2326'],
    )[0]
    assert (r.ip, r.remote_user, r.method, r.path) == (
        "10.2.3.4", "frank", "GET", "/a.html"
    )
    assert (r.status, r.n_bytes, r.parsed_ok) == (200, 2326, True)
    assert r.ts_raw == "10/Oct/2000:13:55:36 +0000"


def test_clf_dash_bytes_and_anon_user(spark):
    r = _parse(
        spark,
        ['1.2.3.4 - - [01/Jan/2024:00:00:00 +0000] '
         '"POST /x HTTP/1.1" 204 -'],
    )[0]
    assert r.n_bytes == 0
    assert r.remote_user == "-"  # CLF anonymous marker passes through
    assert r.status == 204


def test_clf_malformed_is_null_not_dropped(spark):
    r = _parse(spark, ["this is not a log line"])[0]
    assert not r.parsed_ok
    assert r.ip is None and r.status is None and r.n_bytes is None


def test_subnet24(spark):
    got = (
        spark.createDataFrame([("203.0.113.77",), (None,)], "ip string")
        .select(subnet24(F.col("ip")).alias("s"))
        .collect()
    )
    assert got[0].s == "203.0.113" and got[1].s is None


def test_subnet_traffic_rollup(spark):
    lines = [
        '10.0.0.1 - - [01/Jan/2024:00:00:00 +0000] "GET /a HTTP/1.1" 200 100',
        '10.0.0.2 - - [01/Jan/2024:00:00:01 +0000] "GET /b HTTP/1.1" 503 50',
        '10.0.1.1 - - [01/Jan/2024:00:00:02 +0000] "GET /a HTTP/1.1" 200 -',
        "garbage",
    ]
    df = spark.createDataFrame([(l,) for l in lines], "line string")
    got = {r.subnet: r for r in subnet_traffic(df).collect()}
    assert got["10.0.0"].n_req == 2 and got["10.0.0"].n_errors == 1
    assert got["10.0.0"].error_rate == 0.5
    assert got["10.0.0"].total_bytes == 150 and got["10.0.0"].n_paths == 2
    assert got["10.0.1"].total_bytes == 0
    assert got[None].n_req == 1 and got[None].n_paths == 0
