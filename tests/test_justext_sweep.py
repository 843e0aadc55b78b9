"""Threshold-sweep frontier (extraction/justext.py:justext_sweep):
per-config counts match a parameterized pure-Python replay of the rule,
and the shipped-config row anchors precision/recall/f1 at exactly 1.0."""

from invoice_ocr_reconciler_spark.extraction.justext import (
    _STOP_RE,
    _URL_RE,
    _resolve_ctx,
    justext_sweep,
)

CONFIGS = [
    {"config_id": 0, "stop_lo": 2, "stop_hi": 4, "len_low": 40, "len_high": 70, "link_pct": 20},
    {"config_id": 1, "stop_lo": 1, "stop_hi": 2, "len_low": 20, "len_high": 50, "link_pct": 20},
    {"config_id": 2, "stop_lo": 8, "stop_hi": 16, "len_low": 60, "len_high": 90, "link_pct": 10},
]


def _segments():
    # ordered blocks per doc exercising every branch: link-stuffed bad,
    # short bridging, stopword-dense good, stop-free bad
    good = "the quick brown fox and the lazy dog walk to the market with a cart of apples every day "
    return [
        (1, 0, "see http://spam.example/aaa http://spam.example/bbb now"),
        (1, 1, good * 2),
        (1, 2, "short header"),
        (1, 3, good * 3),
        (1, 4, "zzz qqq vvv www kkk jjj mmm nnn ppp rrr sss ttt uuu xxx yyy " * 2),
        (2, 0, good),
        (2, 1, "tiny"),
        (2, 2, good + "of course that is true with more of the same words to keep it long"),
        (3, 0, "no stopmarkers here just nounlists colors numbers widgets gadgets " * 2),
        (3, 1, "mid part http://x.example/a"),
    ]


def _features(text):
    low = text.lower()
    n_tokens = len([t for t in low.strip().split() if t])
    n_stop = len(_STOP_RE.findall(low))
    link_chars = len(text) - len(_URL_RE.sub("", text))
    return len(text), n_tokens, n_stop, link_chars


def _classify(cfg, feats):
    n_chars, n_tokens, n_stop, link_chars = feats
    if 100 * link_chars > cfg["link_pct"] * max(n_chars, 1):
        return "bad"
    if n_chars < cfg["len_low"]:
        return "bad" if link_chars > 0 else "short"
    if 100 * n_stop >= cfg["stop_hi"] * n_tokens and n_tokens > 0:
        return "good" if n_chars > cfg["len_high"] else "near_good"
    if 100 * n_stop >= cfg["stop_lo"] * n_tokens and n_tokens > 0:
        return "near_good"
    return "bad"


def _ref_goods(cfg, rows):
    by_doc = {}
    for doc, idx, text in rows:
        by_doc.setdefault(doc, []).append((idx, text))
    goods = set()
    for doc, segs in by_doc.items():
        segs.sort()
        cf = [_classify(cfg, _features(t)) for _i, t in segs]
        for (idx, _t), fin in zip(segs, _resolve_ctx(cf)):
            if fin == "good":
                goods.add((doc, idx))
    return goods


def test_sweep_matches_python_reference(spark):
    rows = _segments()
    df = spark.createDataFrame(rows, "doc_id long, seg_idx int, seg_text string")
    got = {
        r["config_id"]: r
        for r in justext_sweep(df, configs=CONFIGS).collect()
    }
    assert set(got) == {0, 1, 2}
    default = _ref_goods(CONFIGS[0], rows)
    assert default, "shipped config must keep something in this fixture"
    feats = {(d, i): _features(t) for d, i, t in rows}
    for cfg in CONFIGS:
        goods = _ref_goods(cfg, rows)
        r = got[cfg["config_id"]]
        assert r["n_segments"] == len(rows)
        assert r["n_good"] == len(goods), cfg
        assert r["inter_default"] == len(goods & default), cfg
        assert r["n_good_default"] == len(default)
        assert r["kept_chars"] == sum(feats[g][0] for g in goods), cfg
    # the grid must actually move the policy, else the sweep tests nothing
    assert got[1]["n_good"] != got[0]["n_good"] or got[2]["n_good"] != got[0]["n_good"]


def test_shipped_config_anchors_at_one(spark):
    df = spark.createDataFrame(
        _segments(), "doc_id long, seg_idx int, seg_text string"
    )
    r = [
        x
        for x in justext_sweep(df, configs=CONFIGS).collect()
        if x["config_id"] == 0
    ][0]
    assert r["precision_vs_default"] == 1.0
    assert r["recall_vs_default"] == 1.0
    assert r["f1_vs_default"] == 1.0


def test_zero_keep_config_scores_zero_not_null(spark):
    df = spark.createDataFrame(
        [(1, 0, "aa"), (1, 1, "bb")], "doc_id long, seg_idx int, seg_text string"
    )
    rows = justext_sweep(
        df,
        configs=[
            {"config_id": 0, "stop_lo": 2, "stop_hi": 4, "len_low": 40,
             "len_high": 70, "link_pct": 20}
        ],
    ).collect()
    assert rows[0]["n_good"] == 0
    assert rows[0]["precision_vs_default"] == 0.0
    assert rows[0]["f1_vs_default"] == 0.0
