"""Units for the LM-objective data-prep band: span_corruption,
fim_transform, render_chat_template."""

from invoice_ocr_reconciler_spark.operators.objectives import (
    IM_END,
    IM_START,
    fim_transform,
    render_chat_template,
    span_corruption,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_span_corruption_roundtrip(spark):
    docs = _docs(spark, [(1, " ".join(f"t{i}" for i in range(45)))])
    r = span_corruption(docs).collect()[0]
    assert r.n_tokens == 45 and r.n_masked > 0
    # reconstruction: splicing each sentinel's target span back into the
    # input at its sentinel reproduces the original token stream
    inp, tgt = r.input_text.split(), r.target_text.split()
    spans = {}
    cur = None
    for tok in tgt:
        if tok.startswith("<extra_id_"):
            cur = tok
            spans[cur] = []
        else:
            spans[cur].append(tok)
    rebuilt = []
    for tok in inp:
        rebuilt.extend(spans[tok] if tok in spans else [tok])
    assert rebuilt == [f"t{i}" for i in range(45)]
    # mask budget: every masked window takes 2-4 tokens
    assert r.n_masked == sum(len(v) for v in spans.values())
    assert all(2 <= len(v) <= 4 for v in spans.values())


def test_span_corruption_short_and_null(spark):
    docs = _docs(spark, [(1, "a b"), (2, None), (3, "")])
    for r in span_corruption(docs).collect():
        assert r.n_masked == 0 and r.target_text == ""
    out = {r.doc_id: r for r in span_corruption(docs).collect()}
    assert out[1].input_text == "a b" and out[2].input_text == ""


def test_fim_roundtrip_and_guards(spark):
    docs = _docs(spark, [
        (1, " ".join(f"w{i}" for i in range(20))),
        (2, "a b"),
        (3, None),
    ])
    out = {r.doc_id: r for r in fim_transform(docs).collect()}
    r = out[1]
    assert r.fim_applied and 1 <= r.cut1 < r.cut2 <= 19
    body = r.fim_text
    pre = body.split(" <SUF> ")[0].removeprefix("<PRE> ").split()
    suf = body.split(" <SUF> ")[1].split(" <MID> ")[0].split()
    mid = body.split(" <MID> ")[1].split()
    assert pre + mid + suf == [f"w{i}" for i in range(20)]
    assert len(pre) == r.cut1 and len(pre) + len(mid) == r.cut2
    assert not out[2].fim_applied and out[2].fim_text == "a b"
    assert out[3].fim_text == "" and out[3].cut1 is None


def test_fim_deterministic(spark):
    docs = _docs(spark, [(i, " ".join(f"x{j}" for j in range(30))) for i in range(20)])
    a = sorted(map(tuple, fim_transform(docs).collect()))
    b = sorted(map(tuple, fim_transform(docs.repartition(5)).collect()))
    assert a == b
    # cuts vary across docs (md5-driven, not constant)
    cuts = {r[2] for r in a}
    assert len(cuts) > 3


def test_render_chat_offsets_and_mask(spark):
    convs = spark.createDataFrame(
        [
            (1, [("user", "hi there"), ("assistant", "hello friend"),
                 ("user", "more"), ("assistant", "ok")]),
            (2, [("user", "no reply")]),
            (3, []),
        ],
        "conv_id long, turns array<struct<role:string,content:string>>",
    )
    out = {r.conv_id: r for r in render_chat_template(convs).collect()}
    r = out[1]
    assert r.n_assistant == 2 and r.mask_chars == len("hello friend") + len("ok")
    assert r.rendered.startswith(IM_START + "user\nhi there" + IM_END)
    # offsets point at the assistant content exactly
    assert r.rendered[r.first_mask_start:r.first_mask_start + 12] == "hello friend"
    assert r.rendered[r.last_mask_end - 2:r.last_mask_end] == "ok"
    assert r.total_chars == len(r.rendered)
    assert out[2].first_mask_start is None and out[2].mask_chars == 0
    assert out[3].n_turns == 0 and out[3].rendered == ""


def test_render_chat_null_fields(spark):
    convs = spark.createDataFrame(
        [(1, [(None, None), ("assistant", None)])],
        "conv_id long, turns array<struct<role:string,content:string>>",
    )
    r = render_chat_template(convs).collect()[0]
    assert r.n_turns == 2 and r.n_assistant == 1
    assert r.mask_chars == 0  # NULL content folds to ''
    assert r.rendered.count(IM_START) == 2
