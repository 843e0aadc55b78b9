"""bpe_encode, decontaminate_semantic, hits."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------------- bpe_encode


def _py_encode(word: str, ranks: dict) -> list:
    """Independent reference: greedy lowest-rank merge, leftmost
    non-overlapping per pass."""
    syms = list(word) + ["</w>"]
    while len(syms) > 1:
        cands = [
            (ranks[(syms[i], syms[i + 1])], (syms[i], syms[i + 1]))
            for i in range(len(syms) - 1)
            if (syms[i], syms[i + 1]) in ranks
        ]
        if not cands:
            break
        _, (l, r) = min(cands)
        out, i = [], 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == l and syms[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_bpe_encode_matches_python_reference(spark):
    from invoice_ocr_reconciler_spark.operators.bpe import bpe_encode, bpe_learn

    docs = spark.createDataFrame(
        [(i, "low lower lowest newer new news " * 3) for i in range(6)]
        + [(6, "Mixed CASE words"), (7, ""), (8, None)],
        "doc_id long, text string",
    )
    merges = bpe_learn(docs, n_merges=6)
    ranks = {
        (r["left"], r["right"]): r["merge_rank"]
        for r in merges.collect()
    }
    got = {r["doc_id"]: r for r in bpe_encode(docs, merges).collect()}
    # parity on a normal doc
    expect = []
    for w in ("low lower lowest newer new news " * 3).lower().split():
        expect.extend(_py_encode(w, ranks))
    assert got[0]["tokens"] == expect
    assert got[0]["n_tokens"] == len(expect)
    # lowercasing shared with tokens_col
    mixed = []
    for w in "mixed case words".split():
        mixed.extend(_py_encode(w, ranks))
    assert got[6]["tokens"] == mixed
    # empty/null -> zero tokens, rows kept
    assert got[7]["tokens"] == [] and got[7]["n_tokens"] == 0
    assert got[8]["tokens"] == [] and got[8]["n_tokens"] == 0


def test_bpe_encode_reproduces_training_segmentation(spark):
    """Encoding the training corpus applies exactly the learned merges:
    every output token is either a learned merged symbol or a raw char
    (+</w>), and frequent pairs got merged."""
    from invoice_ocr_reconciler_spark.operators.bpe import bpe_encode, bpe_learn

    docs = spark.createDataFrame(
        [(i, "aaab aaab aaab cd") for i in range(4)], "doc_id long, text string"
    )
    merges = bpe_learn(docs, n_merges=4)
    toks = bpe_encode(docs, merges).select(F.explode("tokens").alias("t")).distinct()
    vocab = {r["t"] for r in toks.collect()}
    # 'aaab</w>' is the dominant word: with 4 merges it must have collapsed
    # into a single token or at most two symbols
    enc = [r["tokens"] for r in bpe_encode(docs, merges).limit(1).collect()][0]
    # the dominant word absorbed all 4 merges -> single token; the rare
    # word 'cd' never earned a merge and stays as raw chars
    assert enc[0] == "aaab</w>"
    assert enc[-3:] == ["c", "d", "</w>"]
    assert all(isinstance(t, str) and t for t in vocab)


def test_bpe_encode_partitioning_invariance(spark):
    from invoice_ocr_reconciler_spark.operators.bpe import bpe_encode, bpe_learn

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta {i % 3}") for i in range(40)],
        "doc_id long, text string",
    )
    merges = bpe_learn(docs, n_merges=5)
    a = sorted(
        (r["doc_id"], tuple(r["tokens"]))
        for r in bpe_encode(docs, merges).collect()
    )
    b = sorted(
        (r["doc_id"], tuple(r["tokens"]))
        for r in bpe_encode(docs.repartition(13), merges).collect()
    )
    assert a == b


# -------------------------------------------------- decontaminate_semantic


def test_decontaminate_semantic_planted(spark):
    from invoice_ocr_reconciler_spark.operators.decontam import (
        decontaminate_semantic,
    )

    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),       # exact benchmark copy
            (2, [0.999, 0.04, 0.0]),    # near-benchmark paraphrase
            (3, [0.0, 1.0, 0.0]),       # orthogonal
            (4, [-1.0, 0.0, 0.0]),      # opposite
        ],
        "vec_id long, embedding array<float>",
    )
    bench = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    got = {r["vec_id"]: r for r in decontaminate_semantic(corpus, bench, 0.95).collect()}
    assert got[1]["contaminated"] and got[1]["max_sim"] == 1.0
    assert got[2]["contaminated"] and got[2]["n_bench_hits"] == 1
    assert not got[3]["contaminated"] and got[3]["max_sim"] == 0.0
    assert not got[4]["contaminated"] and got[4]["max_sim"] == -1.0
    # every corpus row gets a verdict (flag-don't-drop)
    assert set(got) == {1, 2, 3, 4}


def test_decontaminate_semantic_broadcast_and_shuffle_agree(spark):
    from invoice_ocr_reconciler_spark.operators.decontam import (
        decontaminate_semantic,
    )

    import numpy as np

    rng = np.random.default_rng(3)
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(0, 1, 6)]) for i in range(50)],
        "vec_id long, embedding array<float>",
    )
    bench = corpus.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1000).alias("vec_id"), "embedding"
    )
    a = sorted(map(tuple, decontaminate_semantic(corpus, bench, 0.99).collect()))
    b = sorted(
        map(
            tuple,
            decontaminate_semantic(
                corpus, bench, 0.99, broadcast_benchmark=False
            ).collect(),
        )
    )
    assert a == b
    flagged = [t for t in a if t[1]]
    assert len(flagged) == 5  # the 5 copied vectors hit themselves at 1.0


def test_decontaminate_semantic_plan_broadcasts(spark):
    from invoice_ocr_reconciler_spark.operators.decontam import (
        decontaminate_semantic,
    )

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    plan = (
        decontaminate_semantic(corpus, corpus)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


# ------------------------------------------------------------------ hits


def _numpy_hits(edges, n_iter=2):
    import numpy as np

    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    hub = np.full(n, 1.0 / n)
    auth = np.zeros(n)

    def rnd(x, p):
        return np.floor(x * 10.0**p + 0.5) / 10.0**p

    for _ in range(n_iter):
        auth = np.zeros(n)
        for u, v in edges:
            auth[idx[v]] += rnd(hub[idx[u]], 12)
        auth = rnd(auth / auth.sum(), 9)
        hub = np.zeros(n)
        for u, v in edges:
            hub[idx[u]] += rnd(auth[idx[v]], 12)
        hub = rnd(hub / hub.sum(), 9)
    return {nodes[i]: (auth[i], hub[i]) for i in range(n)}


def test_hits_matches_numpy_reference(spark):
    from invoice_ocr_reconciler_spark.operators.graph import hits

    edges = [(1, 2), (1, 3), (4, 2), (4, 3), (2, 5), (3, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: (r["authority"], r["hub"]) for r in hits(df, n_iter=2).collect()}
    ref = _numpy_hits(edges, n_iter=2)
    assert set(got) == set(ref)
    for k in ref:
        assert got[k][0] == pytest.approx(ref[k][0], abs=2e-9)
        assert got[k][1] == pytest.approx(ref[k][1], abs=2e-9)
    # structure: 1 and 4 are the hubs (point at both authorities 2,3)
    top_hub = max(got, key=lambda k: got[k][1])
    assert top_hub in (1, 4)
    top_auth = max(got, key=lambda k: got[k][0])
    assert top_auth in (2, 3, 5)


def test_hits_l1_mass_and_zero_fill(spark):
    from invoice_ocr_reconciler_spark.operators.graph import hits

    df = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    rows = hits(df, n_iter=2).collect()
    auth_sum = sum(r["authority"] for r in rows)
    hub_sum = sum(r["hub"] for r in rows)
    assert auth_sum == pytest.approx(1.0, abs=1e-6)
    assert hub_sum == pytest.approx(1.0, abs=1e-6)
    by = {r["node"]: r for r in rows}
    assert by[1]["authority"] == 0.0  # nothing points at 1
    assert by[3]["hub"] == 0.0  # 3 points at nothing


def test_hits_empty_graph(spark):
    from invoice_ocr_reconciler_spark.operators.graph import hits

    df = spark.createDataFrame([], "src long, dst long")
    assert hits(df, n_iter=2).count() == 0


def test_hits_partitioning_invariance(spark):
    from invoice_ocr_reconciler_spark.operators.graph import hits

    edges = [(i, (i * 7 + 1) % 40) for i in range(40)] + [
        (i, (i * 3 + 2) % 40) for i in range(0, 40, 2)
    ]
    a = sorted(map(tuple, hits(
        spark.createDataFrame(edges, "src long, dst long"), n_iter=2).collect()))
    b = sorted(map(tuple, hits(
        spark.createDataFrame(edges, "src long, dst long").repartition(11),
        n_iter=2).collect()))
    assert a == b


# ------------------------------------------------------ resolve_redirects


def test_resolve_redirects_chains_and_loops(spark):
    from invoice_ocr_reconciler_spark.operators.graph import resolve_redirects

    rows = [
        ("a", "b"), ("b", "c"), ("c", "d"),   # 3-hop chain a->d
        ("x", "y"),                            # 1 hop
        ("p", "q"), ("q", "p"),                # 2-cycle loop
    ]
    df = spark.createDataFrame(rows, "url string, location string")
    got = {r["url"]: r for r in resolve_redirects(df, max_hops=4).collect()}
    assert got["a"]["final_url"] == "d" and got["a"]["n_hops"] == 3
    assert got["a"]["terminal"]
    assert got["b"]["final_url"] == "d" and got["b"]["n_hops"] == 2
    assert got["x"]["final_url"] == "y" and got["x"]["n_hops"] == 1
    # loop: capped at max_hops, not terminal
    assert not got["p"]["terminal"] and got["p"]["n_hops"] == 4
    assert got["p"]["final_url"] in ("p", "q")


def test_resolve_redirects_chain_longer_than_cap(spark):
    from invoice_ocr_reconciler_spark.operators.graph import resolve_redirects

    rows = [(str(i), str(i + 1)) for i in range(10)]
    df = spark.createDataFrame(rows, "url string, location string")
    got = {r["url"]: r for r in resolve_redirects(df, max_hops=3).collect()}
    assert got["0"]["n_hops"] == 3 and got["0"]["final_url"] == "3"
    assert not got["0"]["terminal"]  # '3' still redirects
    assert got["8"]["final_url"] == "10" and got["8"]["terminal"]


# ----------------------------------------------------- merge_seed_channels


def test_merge_seed_channels_provenance(spark):
    from invoice_ocr_reconciler_spark.operators.graph import merge_seed_channels

    a = spark.createDataFrame([("u1",), ("u2",)], "url string")
    b = spark.createDataFrame([("u2",), ("u3",), ("u3",)], "url string")
    got = {r["url"]: r for r in merge_seed_channels({"feed": b, "sitemap": a}).collect()}
    assert got["u1"]["sources"] == ["sitemap"] and got["u1"]["n_channels"] == 1
    assert got["u2"]["sources"] == ["feed", "sitemap"] and got["u2"]["n_channels"] == 2
    # duplicate rows within one channel collapse
    assert got["u3"]["sources"] == ["feed"]
    import pytest as _pt

    with _pt.raises(ValueError):
        merge_seed_channels({})
