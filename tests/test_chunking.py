"""Context-window chunking (operators/chunking.py): window geometry
must match a pure-Python re-derivation for disjoint AND overlapping
strides, and the plan must stay per-row (zero Exchange)."""

import pytest

from wordscape_spark.operators import chunking

DOCS = [
    (0, "a b c d e f g h i j"),  # 10 words
    (1, "one two three"),
    (2, "single"),
    (3, ""),  # empty → no chunks
    (4, "  padded   with\t\tweird\nwhitespace  "),
    (5, " ".join(f"w{i}" for i in range(17))),  # stride boundary cases
]


def _py_chunks(text, window, stride):
    ws = text.split()
    out = []
    i = 0
    start = 0
    while start < len(ws):
        seg = ws[start : start + window]
        out.append((i, len(seg), " ".join(seg)))
        i += 1
        start += stride
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


@pytest.mark.parametrize("window,stride", [(4, 4), (4, 2), (8, 3), (1, 1)])
def test_chunks_match_python(docs, window, stride):
    got = {}
    rows = chunking.chunk_documents(
        docs, window=window, stride=stride
    ).collect()
    for r in rows:
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["n_tokens"], r["chunk"])
        )
    for doc_id, text in DOCS:
        want = _py_chunks(text, window, stride)
        have = sorted(got.get(doc_id, []))
        assert have == want, (doc_id, window, stride)


def test_every_token_covered_disjoint(docs):
    """stride == window → chunks partition the token stream exactly."""
    rows = chunking.chunk_documents(docs, window=4, stride=4).collect()
    for doc_id, text in DOCS:
        toks = [
            t
            for r in sorted(
                (r for r in rows if r["doc_id"] == doc_id),
                key=lambda r: r["chunk_idx"],
            )
            for t in r["chunk"].split()
        ]
        assert toks == text.split(), doc_id


def test_keep_cols_pass_through(spark):
    df = spark.createDataFrame(
        [(1, "a b c", "en")], "doc_id long, text string, lang string"
    )
    rows = chunking.chunk_documents(
        df, window=2, stride=2, keep_cols=("lang",)
    ).collect()
    assert [(r["lang"], r["chunk"]) for r in rows] == [
        ("en", "a b"),
        ("en", "c"),
    ]


def test_invalid_sizes_raise():
    with pytest.raises(ValueError):
        chunking.chunks_expr("text", 0, 1)
    with pytest.raises(ValueError):
        chunking.chunks_expr("text", 4, 0)


def test_plan_is_exchange_free(docs):
    plan = (
        chunking.chunk_documents(docs, window=4, stride=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


# ------------------------------------------------------------------ FIM


def _fim(spark, rows, **kw):
    from wordscape_spark.operators import chunking

    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r["doc_id"]: r.asDict()
        for r in chunking.fim_transform(df, **kw).collect()
    }


def test_fim_reconstruction(spark):
    rows = [(i, f"doc {i} " + "abcdefghij klmnop qrstuv wxyz " * 3)
            for i in range(40)]
    out = _fim(spark, rows, rate_pct=100)
    for i, text in rows:
        r = out[i]
        assert r["fim_applied"]
        s = r["text_out"]
        assert s.startswith("<PRE>")
        pre, rest = s[5:].split("<SUF>", 1)
        suf, mid = rest.split("<MID>", 1)
        assert pre + mid + suf == text  # PSM reorders, loses nothing


def test_fim_passthrough_cases(spark):
    rows = [(1, "short"), (2, None), (3, "x" * 100)]
    out = _fim(spark, rows, rate_pct=0)
    assert all(not r["fim_applied"] for r in out.values())
    assert out[3]["text_out"] == "x" * 100
    assert out[2]["text_out"] == ""  # null text -> empty passthrough
    # below min_chars: never transformed even at rate 100
    out = _fim(spark, rows, rate_pct=100)
    assert not out[1]["fim_applied"] and out[1]["text_out"] == "short"


def test_fim_deterministic_and_rate(spark):
    rows = [(i, "word " * 30) for i in range(200)]
    from wordscape_spark.operators import chunking

    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = {r["doc_id"]: r["text_out"]
         for r in chunking.fim_transform(df).collect()}
    b = {r["doc_id"]: r["text_out"]
         for r in chunking.fim_transform(df.repartition(11)).collect()}
    assert a == b
    applied = sum(1 for v in a.values() if v.startswith("<PRE>"))
    assert 70 <= applied <= 130  # ~50% of 200


def test_fim_plan_no_exchange(spark):
    from wordscape_spark.operators import chunking

    df = spark.createDataFrame([(1, "y" * 50)], "doc_id long, text string")
    plan = (
        chunking.fim_transform(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
