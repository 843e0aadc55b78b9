"""HyperBall sketch contract: determinism, growth, saturation."""

from pyspark.sql import functions as F

from invoice_ocr_reconciler_spark.operators.hyperball import hyperball


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long")


def _chain(spark, n):
    return _edges(spark, [(i, i + 1) for i in range(n - 1)])


def test_hyperball_monotone_growth_on_chain(spark):
    # on a directed chain the t-ball of node 0 is exactly t+1 nodes:
    # registers (hence s_scaled) must improve monotonically with t
    e = _chain(spark, 10)
    s = {}
    for t in (1, 2, 3):
        row = hyperball(e, n_iter=t).filter(F.col("node") == 0).collect()[0]
        s[t] = (row["n_regs"], row["s_scaled"])
    assert s[1][0] <= s[2][0] <= s[3][0]
    assert s[1][1] >= s[2][1] >= s[3][1]  # more/larger regs shrink the sum
    assert s[3] != s[1]  # the 3-ball genuinely saw more nodes


def test_hyperball_sink_has_singleton_ball(spark):
    # the chain's last node reaches only itself at every t: its sketch
    # never changes, and its estimate equals the 1-element raw estimate
    e = _chain(spark, 6)
    r1 = hyperball(e, n_iter=1).filter(F.col("node") == 5).collect()[0]
    r3 = hyperball(e, n_iter=3).filter(F.col("node") == 5).collect()[0]
    assert r1["n_regs"] == 1
    assert (r1["s_scaled"], r1["ball_est"]) == (r3["s_scaled"], r3["ball_est"])


def test_hyperball_saturation_on_complete_graph(spark):
    # K5 with self-reachability via merges: every node's 1-ball is all 5
    # nodes -> all sketches identical after one round
    e = _edges(spark, [(a, b) for a in range(5) for b in range(5) if a != b])
    out = hyperball(e, n_iter=1).collect()
    assert len({(r["n_regs"], r["s_scaled"]) for r in out}) == 1
    out2 = hyperball(e, n_iter=3).collect()
    assert {r["s_scaled"] for r in out} == {r["s_scaled"] for r in out2}


def test_hyperball_partition_invariance(spark):
    e = _chain(spark, 24)
    a = sorted(map(tuple, hyperball(e, n_iter=2).collect()))
    b = sorted(map(tuple, hyperball(e.repartition(7), n_iter=2).collect()))
    assert a == b


def test_hyperball_empty_edges(spark):
    e = _edges(spark, []).filter(F.lit(False))
    assert hyperball(e).count() == 0


def test_hyperball_curve_monotone_and_consistent(spark):
    from invoice_ocr_reconciler_spark.operators.hyperball import (
        hyperball,
        hyperball_curve,
    )
    from pyspark.sql import functions as F

    e = _chain(spark, 12)
    curve = {r["t"]: r for r in hyperball_curve(e, n_iter=3).collect()}
    assert sorted(curve) == [0, 1, 2, 3]
    assert all(r["n_nodes"] == 12 for r in curve.values())
    # register sum decreases (balls grow), register count increases
    assert curve[0]["total_s_scaled"] > curve[3]["total_s_scaled"]
    assert curve[0]["total_regs"] <= curve[3]["total_regs"]
    # final-round totals agree with the per-node frame
    per = hyperball(e, n_iter=3).agg(
        F.sum("n_regs").alias("r"), F.sum("s_scaled").alias("s")
    ).collect()[0]
    assert curve[3]["total_regs"] == per["r"]
    assert curve[3]["total_s_scaled"] == per["s"]


def test_hyperball_curve_empty(spark):
    from pyspark.sql import functions as F
    from invoice_ocr_reconciler_spark.operators.hyperball import hyperball_curve

    e = _edges(spark, []).filter(F.lit(False))
    rows = hyperball_curve(e, n_iter=2).collect()
    assert [r["n_nodes"] for r in rows] == [0, 0, 0]
    assert all(r["total_s_scaled"] == 0 for r in rows)
